package graft.multimodal

import graft.{Catalog, GQuery}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in distributed
  * per-partition batches. No media codecs exist in this environment, so
  * the DECODE STEP IS A DETERMINISTIC STUB (clearly marked below); the
  * Spark-side plumbing — schema, Dataset encoders, mapPartitions batch
  * iteration, partition-parallel execution, frame explosion — is real and
  * is what carries to 100 TB (each partition streams its blobs through
  * the decoder without driver involvement; swap `stubDecode` for a real
  * codec and nothing else changes).
  */
object MediaOps {

  /** One media blob + typed metadata (the schema a real ingest would carry). */
  case class MediaRow(doc_id: Long, media: Array[Byte], format: String,
      width: Int, height: Int)

  /** Extracted features: fixed-width histogram + scalar stats. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, brightness: Double,
      hist16: Array[Long])

  /** One sampled frame of a media blob. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ===== STUB DECODER =====
    * Stands in for an image/audio decode (no codec libs in this
    * container). Deterministic: "pixels" are the raw bytes. A real
    * implementation would decode `format` and return pixel data; the
    * call shape (bytes => bytes) and everything downstream is unchanged. */
  private def stubDecode(media: Array[Byte], format: String): Array[Byte] = media

  /** Attach deterministic fake media to the documents table: blob = UTF-8
    * text bytes, metadata derived from doc fields. Plumbing stand-in for
    * reading a real parquet binary column. */
  def attachMedia(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Catalog.table(spark, sfDir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
        lit("raw").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"))
      .as[MediaRow]
  }

  /** Per-partition decode + feature extraction. mapPartitions (not a
    * per-row UDF) so a real decoder could amortize codec init per
    * partition — the same batch shape mapInPandas gives Python. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val px = stubDecode(r.media, r.format)
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < px.length) {
          val b = px(i) & 0xff
          hist(b / 16) += 1
          sum += b
          i += 1
        }
        MediaFeatures(r.doc_id, px.length.toLong,
          if (px.length == 0) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Resize: downsample each blob to `targetBytes` by striding (the
    * stub analog of an image resize — a real codec would decode, scale,
    * re-encode; the metadata update and per-partition batch shape are
    * the part that carries). */
  def resize(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val len = r.media.length
        if (len <= targetBytes) r
        else {
          val out = new Array[Byte](targetBytes)
          var i = 0
          while (i < targetBytes) {
            out(i) = r.media((i.toLong * len / targetBytes).toInt)
            i += 1
          }
          // metadata tracks the logical downscale factor
          val f = math.max(len / targetBytes, 1)
          r.copy(media = out,
            width = math.max(r.width / f, 1), height = math.max(r.height / f, 1))
        }
      }
    }
  }

  /** Frame sampling: split each blob into `n` evenly-spaced fixed-size
    * frames (the video path). flatMap keeps it scan-parallel; output rows
    * carry (doc_id, frame_idx) for downstream per-frame feature joins. */
  def sampleFrames(media: Dataset[MediaRow], n: Int, frameBytes: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.media.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { k =>
        val start = math.min((len.toLong * k / n).toInt, math.max(len - 1, 0))
        val end = math.min(start + frameBytes, len)
        Frame(r.doc_id, k, java.util.Arrays.copyOfRange(r.media, start, end))
      }
    }
  }

  /** Registry entry: feature-extract all media, aggregate per histogram
    * bucket of brightness. No SQL oracle (mapPartitions pipeline is not
    * SQL-expressible); correctness is pinned by MediaSpec's hand-computed
    * fixtures and the deterministic stub. */
  def queries: Seq[GQuery] = Seq(
    GQuery(
      "m_media_features",
      "binary-column decode + feature extraction via mapPartitions",
      (spark, dir) => {
        import spark.implicits._
        val feats = extractFeatures(attachMedia(spark, dir))
        feats.select(col("doc_id"), col("n_bytes"),
            floor(col("brightness") / 10).cast("int").as("bright_bucket"),
            col("hist16")(0).as("h0"))
          .groupBy(col("bright_bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("tot_bytes"),
            sum(col("h0")).as("tot_h0"))
          .orderBy(col("bright_bucket"))
      },
      None),
    GQuery(
      "m_frame_stats",
      "resize + frame-sample pipeline: per-frame-index byte stats",
      (spark, dir) => {
        import spark.implicits._
        val frames = sampleFrames(resize(attachMedia(spark, dir), 256), 4, 32)
        frames.select(col("frame_idx"), length(col("frame")).as("fb"))
          .groupBy(col("frame_idx"))
          .agg(count(lit(1)).as("n_frames"), sum(col("fb")).as("tot_bytes"))
          .orderBy(col("frame_idx"))
      },
      None))
}

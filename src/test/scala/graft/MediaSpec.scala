package graft

import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.MediaRow

/** Multimodal pipeline specs: the PNG codec is lossless, so features
  * over decoded pixels are hand-computable from the input bytes; "raw"
  * rows bypass the codec (the opaque-format path). */
class MediaSpec extends SparkSpec {

  import spark.implicits._

  test("extractFeatures computes byte histogram + brightness per blob") {
    // "AB" = bytes 65,66 -> bin 4 twice; brightness 65.5
    val in = Seq(MediaRow(7L, "AB".getBytes("UTF-8"), "raw", 0, 0)).toDS()
    val f = MediaOps.extractFeatures(in).collect().head
    assert(f.doc_id === 7L)
    assert(f.n_bytes === 2L)
    assert(f.brightness === 65.5)
    assert(f.hist16(4) === 2L && f.hist16.sum === 2L)
  }

  test("sampleFrames yields n frames with correct offsets") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val in = Seq(MediaRow(1L, bytes, "raw", 0, 0)).toDS()
    val frames = MediaOps.sampleFrames(in, n = 4, frameBytes = 10)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    assert(frames.forall(_.frame.length === 10))
    assert(frames.map(_.frame.head.toInt).toSeq === Seq(0, 25, 50, 75))
  }

  test("resize decodes, downsamples and RE-ENCODES a real PNG") {
    val bytes = (0 until 1000).map(_.toByte).toArray
    val in = Seq(MediaRow(1L, bytes, "raw", 640, 480)).toDS()
    val r = MediaOps.resize(in, targetPx = 100).collect().head
    // output is a genuine PNG container, not raw pixels
    assert(r.format === "png")
    assert((r.media(0) & 0xff) === 0x89 && r.media(1) === 'P'.toByte &&
      r.media(2) === 'N'.toByte && r.media(3) === 'G'.toByte)
    assert(r.width === 100 && r.height === 1)
    // decoding it back gives the nearest-neighbor downsample
    val px = MediaOps.sampleFrames(
      MediaOps.resize(in, targetPx = 100), n = 1, frameBytes = 100)
      .collect().head.frame
    assert(px.length === 100)
    assert(px(0) === 0.toByte && px(50) === 500.toByte)
    // already-small blobs pass through untouched
    val small = MediaOps.resize(in, targetPx = 5000).collect().head
    assert(small.media.length === 1000 && small.format === "raw")
  }

  test("attachMedia emits real PNGs; decode roundtrips the text bytes") {
    import org.apache.spark.sql.functions.col
    val media = MediaOps.attachMedia(spark, sf0001)
      .filter(_.doc_id < 5).collect()
    assert(media.nonEmpty)
    media.filter(_.format == "png").foreach { r =>
      assert((r.media(0) & 0xff) == 0x89 && r.media(1) == 'P'.toByte &&
        r.media(2) == 'N'.toByte && r.media(3) == 'G'.toByte,
        s"doc ${r.doc_id}: not a PNG container")
    }
    val texts = Catalog.table(spark, sf0001, "documents")
      .filter(col("doc_id") < 5).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val feats = MediaOps.extractFeatures(
      MediaOps.attachMedia(spark, sf0001).filter(_.doc_id < 5)).collect()
    assert(feats.length === texts.size)
    feats.foreach { f =>
      val bytes = texts(f.doc_id).getBytes("UTF-8")
      assert(f.n_bytes === bytes.length.toLong,
        s"doc ${f.doc_id}: decoded length != text length")
      if (bytes.nonEmpty)
        assert(f.brightness === bytes.map(_ & 0xff).sum.toDouble / bytes.length,
          s"doc ${f.doc_id}: decoded pixel sum != byte sum")
    }
  }

  test("empty blob produces zero features and no frames") {
    val in = Seq(MediaRow(1L, Array.empty[Byte], "raw", 0, 0)).toDS()
    assert(MediaOps.extractFeatures(in).collect().head.brightness === 0.0)
    assert(MediaOps.sampleFrames(in, 3, 8).count() === 0L)
  }

  test("m_media_features aggregates over the documents corpus") {
    val out = Registry.byName("m_media_features").run(spark, sf0001).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).sum === 500L) // all docs bucketed
  }

  test("m_phash_buckets: pair counts are n(n-1)/2 and ordering is by size") {
    val out = Registry.byName("m_phash_buckets").run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { case (sig, n, pairs) =>
      assert(sig >= 0L && sig < (1L << 16), s"signature $sig out of 16-bit range")
      assert(pairs == n * (n - 1) / 2, s"sig $sig: pairs $pairs != C($n,2)")
    }
    // top-10 ordering: bucket sizes non-increasing
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2, "buckets not sorted by size")
      case _ => ()
    }
  }
}

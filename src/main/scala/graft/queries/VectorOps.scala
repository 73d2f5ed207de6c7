package graft.queries

import graft.{Catalog, GQuery}
import graft.util.Num._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim)
  * — the ANN layer of the training-data pipeline (north star; no reference
  * counterpart: the reference is a distribution layer, README.md:3-6).
  *
  * Determinism across engines: all dot products are sequential left-folds
  * over doubles (`aggregate` in Spark ≡ `list_reduce` in DuckDB after a
  * `+0.0` identity, bit-identical), and outputs are rounded to 6 decimals.
  *
  * Scale design: brute-force top-k is the correctness baseline (broadcast
  * the small query set, scan-parallel over the corpus — at 100 TB this is
  * one pass, no shuffle until the tiny top-k). The LSH variant buckets by
  * deterministic hyperplane signs so the candidate scan touches one bucket
  * per query — the standard recall/cost trade.
  */
object VectorOps {

  def queries: Seq[GQuery] =
    Seq(knnBrute, knnNative, centroids, lshBuckets, lshAnn, ivfAnn, cosNearDup,
      quantize, mrlAnn, dimStats, pqAnn, ivfPqAnn)

  /** Composable-form cosine similarity between columns `embedding` and
    * `q_emb`: three sequential double left-folds (dot + both norms) —
    * the order the determinism contract depends on; shared by the brute
    * and LSH-pruned searches so the oracle text stays in lockstep. */
  private def cosineSim: Column =
    expr("aggregate(zip_with(embedding, q_emb," +
      " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE)," +
      " (acc, v) -> acc + v)") /
      (sqrt(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")) *
        sqrt(expr("aggregate(transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")))

  /** Sequential double dot product of two float lists (DuckDB oracle side;
    * the Spark side is the same left-fold via `aggregate(zip_with(...))`). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b)," +
      s" x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"

  // ------------------------------------------------------------ brute knn
  /** Brute-force cosine top-5 for query vectors vec_id < 3: broadcast the
    * queries against the full corpus, rank per query. */
  val knnBrute: GQuery = GQuery(
    "v_knn_brute",
    "broadcast brute-force cosine top-5 per query vector",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"), cosineSim.as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
                 WHERE vec_id < 3),
      scored AS (
        SELECT q_id, e.vec_id AS n_id,
               ${dotSql("e.embedding", "q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q_id),
      ranked AS (
        SELECT q_id, n_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
                    AS INTEGER) AS rk
        FROM scored)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 5
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ native knn
  /** Same top-5 search through the codegen'd native `cosine_sim`
    * expression ([[graft.functions.CosineSim]]): one fused loop instead of
    * three lambda folds — bit-identical results (same sequential double
    * accumulation), so it shares the brute-force oracle. */
  val knnNative: GQuery = GQuery(
    "v_knn_native",
    "broadcast cosine top-5 via the native codegen cosine_sim expression",
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          expr("cosine_sim(embedding, q_emb)").as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    knnBrute.oracle)

  // ------------------------------------------------------------ centroids
  /** Per-label centroids, exact: posexplode to (label, dim) and fixed-point
    * mean — one hash shuffle keyed by (label, dim), uniform by construction. */
  val centroids: GQuery = GQuery(
    "v_centroids",
    "per-label per-dimension exact centroid (posexplode + fixed-point mean)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(round(davg(col("v").cast("double")), 6).as("centroid"),
          count(lit(1)).as("n"))
        .select(col("label"), (col("pos") + 1).as("pos"), col("centroid"), col("n"))
        .orderBy(col("label"), col("pos"))
    },
    Some(s"""
      SELECT label, pos, ROUND(${davgSql("v")}, 6) AS centroid, COUNT(*) AS n
      FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings) t
      GROUP BY label, pos
      ORDER BY label, pos"""))

  // ------------------------------------------------------------ LSH buckets
  /** Random-hyperplane LSH bucketing: 8 deterministic planes whose weights
    * derive from md5(plane:dim) — portable across engines; bucket id is the
    * 8-bit sign pattern. Output: bucket histogram (the index structure). */
  private val nPlanes = 8

  /** weight(p, d) in [-0.5, 0.5): md5-derived, identical in both engines. */
  private def planesN(spark: SparkSession, dim: Int, total: Int): DataFrame =
    spark.range(total).select(col("id").cast("int").as("p"))
      .crossJoin(spark.range(dim).select((col("id") + 1).cast("int").as("pos")))
      .select(col("p"), col("pos"),
        (conv(substring(md5(concat_ws(":", col("p"), col("pos")).cast("binary")), 1, 15), 16, 10)
          .cast(LongType) % 1000000L / 1000000.0 - 0.5).as("w"))

  private def planes(spark: SparkSession, dim: Int): DataFrame =
    planesN(spark, dim, nPlanes)

  private val planesSql =
    s"""SELECT p, pos,
          (('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT % 1000000)
            / 1000000.0 - 0.5 AS w
        FROM (SELECT CAST(unnest(range($nPlanes)) AS INTEGER) AS p)
        CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS pos)"""

  private def bucketed(spark: SparkSession, e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"), col("label"), (col("pos0") + 1).as("pos"), col("v"))
      .join(broadcast(planes(spark, 64)), "pos")
      .groupBy(col("vec_id"), col("label"), col("p"))
      .agg(sum(fix6(col("w") * col("v").cast("double"))).as("proj"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("proj") > 0, expr("shiftleft(1L, p)")).otherwise(0L)).as("bucket"))

  private val bucketedSql =
    s"""SELECT vec_id, label,
          CAST(SUM(CASE WHEN proj > 0 THEN 1::BIGINT << p ELSE 0 END) AS BIGINT) AS bucket
        FROM (SELECT vec_id, label, p,
                     SUM(CAST(FLOOR(w * v * 1000000 + 0.5) AS BIGINT)) AS proj
              FROM (SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings) t
              JOIN ($planesSql) pl USING (pos)
              GROUP BY vec_id, label, p) s
        GROUP BY vec_id, label"""

  val lshBuckets: GQuery = GQuery(
    "v_lsh_buckets",
    "hyperplane-LSH bucket histogram (md5-derived deterministic planes)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      bucketed(spark, e)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH b AS ($bucketedSql)
      SELECT bucket, COUNT(*) AS n_vecs, COUNT(DISTINCT label) AS n_labels
      FROM b GROUP BY bucket ORDER BY bucket"""))

  // ------------------------------------------------------------ LSH ANN
  /** Multi-table (banded) hyperplane LSH: `annTables` independent hash
    * tables of `annPlanesPerTable` planes each; a corpus vector is a
    * candidate if it shares a bucket with the query in ANY table. A single
    * k-plane table has recall (1-θ/π)^k — measurably ~0 for cos≈0.4
    * neighbors at k=8 — while L tables lift it to 1-(1-(1-θ/π)^k)^L
    * (≈0.75 here) at candidate cost ∝ L·n/2^k. k tunes per corpus size
    * (k ≈ log2(n/candidate_target)): at 100 TB raise k and L together —
    * recall holds while each bucket stays reducer-sized. Recall vs the
    * brute-force ground truth is pinned in DifferentialSpec. */
  private val annTables = 16
  private val annPlanesPerTable = 4

  /** Per-(vector, table) bucket id: sign pattern of that table's planes. */
  private def bandedBuckets(spark: SparkSession, e: DataFrame): DataFrame =
    e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("v"))
      .join(broadcast(planesN(spark, 64, annTables * annPlanesPerTable)), "pos")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(fix6(col("w") * col("v").cast("double"))).as("proj"))
      .groupBy(col("vec_id"), expr(s"p div $annPlanesPerTable").as("tbl"))
      .agg(sum(when(col("proj") > 0,
        expr(s"shiftleft(1L, p % $annPlanesPerTable)")).otherwise(0L)).as("bucket"))

  private val bandedSql =
    s"""SELECT vec_id, p // $annPlanesPerTable AS tbl,
          CAST(SUM(CASE WHEN proj > 0
                        THEN 1::BIGINT << (p % $annPlanesPerTable) ELSE 0 END)
               AS BIGINT) AS bucket
        FROM (SELECT vec_id, p,
                     SUM(CAST(FLOOR(w * v * 1000000 + 0.5) AS BIGINT)) AS proj
              FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings) t
              JOIN (SELECT p, pos,
                           (('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT
                             % 1000000) / 1000000.0 - 0.5 AS w
                    FROM (SELECT CAST(unnest(range(${annTables * annPlanesPerTable}))
                                      AS INTEGER) AS p)
                    CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS pos)) pl
                USING (pos)
              GROUP BY vec_id, p) s
        GROUP BY vec_id, p // $annPlanesPerTable"""

  val lshAnn: GQuery = GQuery(
    "v_lsh_ann",
    "multi-table LSH cosine top-3 (candidates = any shared band bucket)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val bb = bandedBuckets(spark, e)
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val qBuckets = bb.join(qSet.select(col("q_id")),
        bb("vec_id") === col("q_id")).select(col("q_id"), col("tbl"), col("bucket"))
      // candidate = shares a (table, bucket) with the query in >=1 table;
      // DISTINCT collapses multi-table hits before the (exact) scoring join
      val cand = bb.join(broadcast(qBuckets), Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id")).distinct()
      val scored = cand
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("n_id"), cosineSim.as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH bb AS ($bandedSql),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      qb AS (SELECT q_id, tbl, bucket FROM bb JOIN q ON bb.vec_id = q.q_id),
      cand AS (SELECT DISTINCT q_id, bb.vec_id AS n_id
               FROM bb JOIN qb USING (tbl, bucket)
               WHERE bb.vec_id <> qb.q_id),
      scored AS (
        SELECT cand.q_id, cand.n_id,
               ${dotSql("n.embedding", "q_emb")} /
               (sqrt(${dotSql("n.embedding", "n.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM cand
        JOIN embeddings n ON n.vec_id = cand.n_id
        JOIN q ON q.q_id = cand.q_id),
      ranked AS (
        SELECT q_id, n_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
                    AS INTEGER) AS rk
        FROM scored)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ IVF ANN
  /** IVF-style ANN: the label partition is the inverted-file cell, its
    * exact fixed-point centroid the coarse quantizer. A query ranks the
    * (tiny, broadcast) centroid table, probes the `ivfNprobe` nearest
    * cells, and scores only vectors in those cells — candidate cost
    * nprobe/ncells of the corpus, the complementary scale path to LSH
    * (data-adaptive cells vs data-oblivious hyperplanes). At 100 TB the
    * cells would come from a k-means fit; the probe/score dataflow —
    * broadcast quantizer, cell-restricted scan, exact re-rank — is
    * identical and is what this query pins. On THIS fixture the labels
    * are synthetic and uncorrelated with geometry, so measured recall
    * sits at the random-cell baseline nprobe/ncells (≈0.33, pinned in
    * DifferentialSpec); with learned cells recall concentrates far
    * above that baseline at the same probe cost. */
  private val ivfNprobe = 3

  val ivfAnn: GQuery = GQuery(
    "v_ivf_ann",
    s"IVF ANN: probe $ivfNprobe nearest label-cells, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      // exact per-cell centroid as an ordered double array
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(davg(col("v").cast("double")).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
          .as("centroid"))
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // rank cells per query against the broadcast quantizer
      val cellRank = Window.partitionBy(col("q_id"))
        .orderBy(col("csim").desc, col("label"))
      val probed = qSet.crossJoin(broadcast(cent))
        .select(col("q_id"), col("label"),
          cosineSimCols("centroid", "q_emb").as("csim"))
        .withColumn("cell_rk", row_number().over(cellRank))
        .filter(col("cell_rk") <= ivfNprobe)
        .select(col("q_id"), col("label"))
      // score only vectors inside the probed cells
      val scored = e.join(broadcast(probed), Seq("label"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("vec_id").as("n_id"), cosineSim.as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, pos, ${davgSql("v")} AS c
              FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings) t
              GROUP BY label, pos)
        GROUP BY label),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      probed AS (
        SELECT q_id, label FROM (
          SELECT q_id, label,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                   ${dotSql("centroid", "q_emb")} /
                   (sqrt(${dotSql("centroid", "centroid")}) *
                    sqrt(${dotSql("q_emb", "q_emb")})) DESC, label) AS cell_rk
          FROM q CROSS JOIN cent)
        WHERE cell_rk <= $ivfNprobe),
      scored AS (
        SELECT q_id, e.vec_id AS n_id,
               ${dotSql("e.embedding", "q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM embeddings e
        JOIN probed ON e.label = probed.label
        JOIN q USING (q_id)
        WHERE e.vec_id <> q_id),
      ranked AS (
        SELECT q_id, n_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
                    AS INTEGER) AS rk
        FROM scored)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ quantization
  /** Int8 embedding quantization audit: per-dimension global [min,max]
    * (the calibration a real int8 index ships with), affine-quantize every
    * element to 0..255, dequantize, and report per-dimension reconstruction
    * error. Two scan passes (one for calibration stats, one for the error
    * audit) with a 64-row broadcast between them — at 100 TB both passes
    * are scan-parallel and the quantizer table stays driver-tiny.
    * Determinism: quantization uses floor(x+0.5) (not round() — engines
    * disagree on half-even vs half-up at exact ties); error sums go
    * through fixed-point dsum. */
  val quantize: GQuery = GQuery(
    "v_quantize",
    "per-dim int8 quantization calibration + reconstruction-error audit",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val flat = e.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("vec_id"), (col("pos0") + 1).as("pos"),
          col("v").cast("double").as("v"))
      val calib = flat.groupBy(col("pos"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val err = flat.join(broadcast(calib), "pos")
        .withColumn("q", when(col("hi") > col("lo"),
          floor((col("v") - col("lo")) / (col("hi") - col("lo")) * 255.0d + 0.5d))
          .otherwise(lit(0.0d)))
        .withColumn("deq",
          col("lo") + col("q") * (col("hi") - col("lo")) / 255.0d)
        .withColumn("abs_err", abs(col("v") - col("deq")))
      err.groupBy(col("pos"))
        .agg(round(min(col("lo")), 6).as("lo"), round(min(col("hi")), 6).as("hi"),
          round(davg(col("abs_err")), 6).as("avg_err"),
          round(max(col("abs_err")), 6).as("max_err"),
          count(lit(1)).as("n"))
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings),
      calib AS (SELECT pos, MIN(v) AS lo, MAX(v) AS hi FROM flat GROUP BY pos),
      err AS (
        SELECT pos, lo, hi, v,
               abs(v - (lo + (CASE WHEN hi > lo
                      THEN FLOOR((v - lo) / (hi - lo) * 255.0 + 0.5)
                      ELSE 0 END) * (hi - lo) / 255.0)) AS abs_err
        FROM flat JOIN calib USING (pos))
      SELECT pos, ROUND(MIN(lo), 6) AS lo, ROUND(MIN(hi), 6) AS hi,
             ROUND(${davgSql("abs_err")}, 6) AS avg_err,
             ROUND(MAX(abs_err), 6) AS max_err,
             COUNT(*) AS n
      FROM err
      GROUP BY pos
      ORDER BY pos"""))

  /** cosineSim over arbitrary column names (centroid is double[], query is
    * float[] — the CASTs make both folds double on both engines). */
  private def cosineSimCols(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b," +
      " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE)," +
      " (acc, v) -> acc + v)") /
      (sqrt(expr(s"aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")) *
        sqrt(expr(s"aggregate(transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")))

  // ------------------------------------------------------------ cosine near-dup
  /** Embedding-cosine near-dup: LSH buckets prefilter candidate pairs
    * (work ∝ Σ bucket²/2, concentrated on similar vectors), exact cosine
    * verifies. Recall is LSH-bounded by construction — the documented
    * trade of every banded dedup at scale; raise nPlanes bands for higher
    * recall. Threshold fits the synthetic corpus (max pairwise cos ≈ 0.48). */
  val cosNearDup: GQuery = GQuery(
    "v_cos_neardup",
    "LSH-bucketed embedding pairs verified by exact cosine >= 0.35",
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val e = Catalog.table(spark, dir, "embeddings")
      val b = bucketed(spark, e).select(col("vec_id"), col("bucket"))
      val withB = e.join(b, "vec_id")
        .select(col("vec_id"), col("embedding"), col("bucket"))
      withB.as("x")
        .join(withB.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
          expr("cosine_sim(x.embedding, y.embedding)").as("sim"))
        .filter(col("sim") >= 0.35)
        .select(col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""
      WITH b AS ($bucketedSql),
      wb AS (SELECT e.vec_id, e.embedding, b.bucket
             FROM embeddings e JOIN b ON e.vec_id = b.vec_id)
      SELECT x.vec_id AS a_id, y.vec_id AS b_id,
             ROUND(${dotSql("x.embedding", "y.embedding")} /
               (sqrt(${dotSql("x.embedding", "x.embedding")}) *
                sqrt(${dotSql("y.embedding", "y.embedding")})), 6) AS sim
      FROM wb x JOIN wb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
      WHERE ${dotSql("x.embedding", "y.embedding")} /
            (sqrt(${dotSql("x.embedding", "x.embedding")}) *
             sqrt(${dotSql("y.embedding", "y.embedding")})) >= 0.35
      ORDER BY a_id, b_id"""))

  // ------------------------------------------------------------ MRL rerank
  /** Matryoshka-style truncated-dimension ANN: shortlist by cosine on the
    * FIRST 16 of 64 dimensions (4x less arithmetic and — in a column-sliced
    * layout — 4x less I/O per candidate), then exact-rerank the top-20
    * shortlist on all 64 dims. The standard two-stage retrieval shape for
    * MRL-trained embedders; on a 100 TB corpus stage 1 is the only full
    * scan and stage 2 touches 20 rows per query. Deterministic: both
    * stages are the same sequential double folds as v_knn_brute. */
  val mrlAnn: GQuery = GQuery(
    "v_mrl_ann",
    "truncated-dim (16 of 64) cosine shortlist + exact 64-dim rerank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          slice(col("embedding"), 1, 16).as("q_emb16"))
      val short = e.select(col("vec_id"), col("embedding"),
          slice(col("embedding"), 1, 16).as("emb16"))
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim16", cosineSimCols("emb16", "q_emb16"))
      val w16 = Window.partitionBy(col("q_id"))
        .orderBy(col("sim16").desc, col("vec_id"))
      val rerank = short.withColumn("rk16", row_number().over(w16))
        .filter(col("rk16") <= 20)
        .withColumn("sim", cosineSimCols("embedding", "q_emb"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      rerank.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("vec_id").as("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                        embedding[1:16] AS q_emb16
                 FROM embeddings WHERE vec_id < 3),
      short AS (
        SELECT q_id, e.vec_id, e.embedding, q_emb,
               ${dotSql("e.embedding[1:16]", "q_emb16")} /
               (sqrt(${dotSql("e.embedding[1:16]", "e.embedding[1:16]")}) *
                sqrt(${dotSql("q_emb16", "q_emb16")})) AS sim16
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q_id),
      shortlisted AS (
        SELECT q_id, vec_id, embedding, q_emb,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim16 DESC, vec_id)
                 AS rk16
        FROM short),
      rerank AS (
        SELECT q_id, vec_id,
               ${dotSql("embedding", "q_emb")} /
               (sqrt(${dotSql("embedding", "embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM shortlisted WHERE rk16 <= 20),
      ranked AS (
        SELECT q_id, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
                    AS INTEGER) AS rk
        FROM rerank)
      SELECT q_id, rk, vec_id AS n_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ dim stats
  /** Per-dimension corpus statistics — the embedding-QA pass (dead dims,
    * scale drift, outliers) run before building any index: mean / min /
    * max / fixed-point mean of squares per dimension. One posexplode
    * + one 64-group two-phase aggregate; map-side partials make the
    * shuffle 64 rows per partition regardless of corpus size. */
  val dimStats: GQuery = GQuery(
    "v_dim_stats",
    "per-dimension embedding mean/min/max/ms audit",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      e.select(posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select((col("pos0") + 1).as("pos"), col("v").cast("double").as("v"))
        .groupBy(col("pos"))
        .agg(
          round(davg(col("v")), 6).as("mean"),
          round(min(col("v")), 6).as("vmin"),
          round(max(col("v")), 6).as("vmax"),
          round(davg(col("v") * col("v")), 6).as("mean_sq"),
          count(lit(1)).as("n"))
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH flat AS (SELECT generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings)
      SELECT pos, ROUND(${davgSql("v")}, 6) AS mean,
             ROUND(MIN(v), 6) AS vmin,
             ROUND(MAX(v), 6) AS vmax,
             ROUND(${davgSql("v * v")}, 6) AS mean_sq,
             COUNT(*) AS n
      FROM flat
      GROUP BY pos
      ORDER BY pos"""))

  // ------------------------------------------------------------ PQ ANN
  private val pqM = 8     // subspaces (64 dims / 8)
  private val pqDsub = 8  // dims per subspace
  private val pqK = 16    // centroids per subspace

  /** fix6-scaled squared-L2 between two float lists: the per-row fold is
    * sequential IEEE doubles (engine-identical), then one quantization to
    * a BIGINT — so argmin ties and ADC SUMS are pure integer ops with no
    * accumulation-order sensitivity. */
  private def l2fix6(a: String, b: String): Column =
    floor(expr(s"aggregate(zip_with($a, $b," +
      " (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *" +
      " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))," +
      " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)") * 1000000.0d + 0.5d)
      .cast(LongType)
  private def l2fix6Sql(a: String, b: String): String =
    s"CAST(FLOOR(list_reduce(list_transform(list_zip($a, $b)," +
      s" x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) *" +
      s" (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), (p, q) -> p + q)" +
      s" * 1000000 + 0.5) AS BIGINT)"

  /** Product-quantization ANN — the fits-in-RAM path at 100 TB: each
    * 64-float (256 B) vector compresses to M=8 centroid codes (8 B, 32×),
    * so the candidate scan touches only the code table; full vectors are
    * read ONLY for the exact re-rank of a 10-deep shortlist.
    *
    * Deterministic codebook (no k-means RNG): the 16 anchor vectors
    * vec_id ∈ [3,18] donate their subvectors as centroids — the
    * quantization quality of a trained codebook is not the point here;
    * the plan shape and the exactness discipline are. Encoding = argmin
    * over (fix6 L2², j) pairs — integer lexicographic min, tie-stable on
    * any engine. ADC = one broadcast of M×K query-to-centroid integer
    * distances, joined to the code table and integer-summed (exact,
    * order-free). Distribution: encode is corpus-scan × broadcast(128
    * centroids); search shuffles only (q, vec, est) partials; the
    * re-rank reads ≤ 10 full vectors per query via a semi-join. */
  val pqAnn: GQuery = GQuery(
    "v_pq_ann",
    "product-quantization ANN: 8x16 codebook, integer ADC, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val subIdx = explode(sequence(lit(0), lit(pqM - 1))).as("m")
      // codebook (m, j, cent): subvectors of the 16 anchor vectors
      val codebook = e.filter(col("vec_id").between(3, 3 + pqK - 1))
        .select((col("vec_id") - 3).as("j"), col("embedding"))
        .select(col("j"), subIdx, col("embedding"))
        .select(col("m"), col("j"),
          expr(s"slice(embedding, m * $pqDsub + 1, $pqDsub)").as("cent"))
      // corpus subvectors -> nearest centroid per subspace (integer argmin)
      val sub = e.select(col("vec_id"), subIdx, col("embedding"))
        .select(col("vec_id"), col("m"),
          expr(s"slice(embedding, m * $pqDsub + 1, $pqDsub)").as("sv"))
      val codes = sub.join(broadcast(codebook), Seq("m"))
        .select(col("vec_id"), col("m"), col("j"), l2fix6("sv", "cent").as("d"))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("d"), col("j"))).as("best"))
        .select(col("vec_id"), col("m"), col("best.j").as("j"))
      // ADC table: query-subvector to EVERY centroid (M*K rows per query)
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val qDist = qSet
        .select(col("q_id"), subIdx, col("q_emb"))
        .select(col("q_id"), col("m"),
          expr(s"slice(q_emb, m * $pqDsub + 1, $pqDsub)").as("qsv"))
        .join(broadcast(codebook), Seq("m"))
        .select(col("q_id"), col("m"), col("j"), l2fix6("qsv", "cent").as("qd"))
      // estimate = exact integer sum of the M looked-up distances
      val est = codes.join(broadcast(qDist), Seq("m", "j"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd")).as("est"))
      val wS = Window.partitionBy(col("q_id")).orderBy(col("est"), col("vec_id"))
      val shortlist = est.withColumn("srk", row_number().over(wS))
        .filter(col("srk") <= 10)
        .select(col("q_id"), col("vec_id").as("n_id"))
      // exact cosine re-rank of the shortlist
      val scored = shortlist
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("n_id"), cosineSim.as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk").cast("int").as("rk"), col("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH ms AS (SELECT unnest(range(0, $pqM)) AS m),
      codebook AS (
        SELECT m, vec_id - 3 AS j,
               embedding[m * $pqDsub + 1 : m * $pqDsub + $pqDsub] AS cent
        FROM embeddings CROSS JOIN ms
        WHERE vec_id BETWEEN 3 AND ${3 + pqK - 1}),
      sub AS (
        SELECT vec_id, m,
               embedding[m * $pqDsub + 1 : m * $pqDsub + $pqDsub] AS sv
        FROM embeddings CROSS JOIN ms),
      coded AS (
        SELECT s.vec_id, s.m, c.j, ${l2fix6Sql("s.sv", "c.cent")} AS d
        FROM sub s JOIN codebook c ON c.m = s.m),
      codes AS (
        SELECT vec_id, m, j
        FROM (SELECT vec_id, m, j,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                       ORDER BY d, j) AS rn
              FROM coded) t
        WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      qdist AS (
        SELECT q_id, c.m, c.j,
               ${l2fix6Sql(s"q_emb[c.m * $pqDsub + 1 : c.m * $pqDsub + $pqDsub]", "c.cent")} AS qd
        FROM q CROSS JOIN codebook c),
      est AS (
        SELECT qd.q_id, co.vec_id, CAST(SUM(qd.qd) AS BIGINT) AS est
        FROM codes co JOIN qdist qd ON qd.m = co.m AND qd.j = co.j
        WHERE co.vec_id <> qd.q_id
        GROUP BY qd.q_id, co.vec_id),
      shortlist AS (
        SELECT q_id, vec_id AS n_id
        FROM (SELECT q_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY est, vec_id) AS srk
              FROM est) t
        WHERE srk <= 10),
      scored AS (
        SELECT s.q_id, s.n_id,
               ${dotSql("e.embedding", "q.q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q.q_emb", "q.q_emb")})) AS sim
        FROM shortlist s
        JOIN embeddings e ON e.vec_id = s.n_id
        JOIN q ON q.q_id = s.q_id)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM (SELECT q_id, n_id, sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY sim DESC, n_id) AS INTEGER) AS rk
            FROM scored) t
      WHERE rk <= 3
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ IVF-PQ ANN
  /** The production composition (FAISS's IVF-PQ shape): the coarse
    * quantizer (label cells + exact centroids, as in [[ivfAnn]]) routes a
    * query to nprobe cells; within probed cells, distance estimation runs
    * over PQ codes of the RESIDUAL (vector − its cell centroid) — residual
    * magnitudes are smaller than raw vectors, so the same codebook budget
    * quantizes finer. At 100 TB: the centroid table and the per-cell
    * query-to-codebook distance tables broadcast; the corpus-side scan
    * touches only (label, 8-byte code) rows of probed cells — memory is
    * codes + one centroid per cell, never raw vectors; full vectors are
    * read ONLY for the 10-deep exact re-rank. Same exactness discipline
    * as [[pqAnn]]: fix6 integer distances, lexicographic integer argmin,
    * exact integer ADC sums — engine-identical end to end (centroids are
    * [[graft.util.Num.davg]] fixed-point, residual subtraction is
    * per-element IEEE on identical inputs). */
  val ivfPqAnn: GQuery = GQuery(
    "v_ivfpq_ann",
    s"IVF-PQ ANN: $ivfNprobe probed cells, residual PQ codes, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val subIdx = explode(sequence(lit(0), lit(pqM - 1))).as("m")
      // coarse quantizer: exact per-cell centroid (ordered double array)
      val cent = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(davg(col("v").cast("double")).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
          .as("centroid"))
      // residuals: vector minus its own cell's centroid
      val resid = e.join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"),
          expr("zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) - y)")
            .as("r"))
      // residual codebook: subvectors of the anchor residuals
      val codebook = resid.filter(col("vec_id").between(3, 3 + pqK - 1))
        .select((col("vec_id") - 3).as("j"), col("r"))
        .select(col("j"), subIdx, col("r"))
        .select(col("m"), col("j"),
          expr(s"slice(r, m * $pqDsub + 1, $pqDsub)").as("cent"))
      // encode every corpus residual: integer argmin per subspace
      val codes = resid
        .select(col("vec_id"), col("label"), subIdx, col("r"))
        .select(col("vec_id"), col("label"), col("m"),
          expr(s"slice(r, m * $pqDsub + 1, $pqDsub)").as("sv"))
        .join(broadcast(codebook), Seq("m"))
        .select(col("vec_id"), col("label"), col("m"), col("j"),
          l2fix6("sv", "cent").as("d"))
        .groupBy(col("vec_id"), col("label"), col("m"))
        .agg(min(struct(col("d"), col("j"))).as("best"))
        .select(col("vec_id"), col("label"), col("m"), col("best.j").as("j"))
      // probe nprobe nearest cells per query (coarse stage, as in IVF)
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cellRank = Window.partitionBy(col("q_id"))
        .orderBy(col("csim").desc, col("label"))
      val probed = qSet.crossJoin(broadcast(cent))
        .select(col("q_id"), col("label"), col("centroid"),
          cosineSimCols("centroid", "q_emb").as("csim"))
        .withColumn("cell_rk", row_number().over(cellRank))
        .filter(col("cell_rk") <= ivfNprobe)
        .select(col("q_id"), col("label"), col("centroid"))
      // per probed (query, cell): query residual, then its codebook table
      val qDist = probed.join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("label"),
          expr("zip_with(q_emb, centroid, (x, y) -> CAST(x AS DOUBLE) - y)")
            .as("rq"))
        .select(col("q_id"), col("label"), subIdx, col("rq"))
        .select(col("q_id"), col("label"), col("m"),
          expr(s"slice(rq, m * $pqDsub + 1, $pqDsub)").as("qsv"))
        .join(broadcast(codebook), Seq("m"))
        .select(col("q_id"), col("label"), col("m"), col("j"),
          l2fix6("qsv", "cent").as("qd"))
      // ADC within probed cells only: exact integer sum of looked-up dists
      val est = codes.join(broadcast(qDist), Seq("label", "m", "j"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd")).as("est"))
      val wS = Window.partitionBy(col("q_id")).orderBy(col("est"), col("vec_id"))
      val shortlist = est.withColumn("srk", row_number().over(wS))
        .filter(col("srk") <= 20)
        .select(col("q_id"), col("vec_id").as("n_id"))
      val scored = shortlist
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("n_id"), cosineSim.as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk").cast("int").as("rk"), col("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH ms AS (SELECT unnest(range(0, $pqM)) AS m),
      cent AS (
        SELECT label, list(c ORDER BY pos) AS centroid
        FROM (SELECT label, pos, ${davgSql("v")} AS c
              FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings) t
              GROUP BY label, pos)
        GROUP BY label),
      resid AS (
        SELECT e.vec_id, e.label,
               list_transform(list_zip(e.embedding, c.centroid),
                 x -> CAST(x[1] AS DOUBLE) - x[2]) AS r
        FROM embeddings e JOIN cent c ON c.label = e.label),
      codebook AS (
        SELECT m, vec_id - 3 AS j,
               r[m * $pqDsub + 1 : m * $pqDsub + $pqDsub] AS cent
        FROM resid CROSS JOIN ms
        WHERE vec_id BETWEEN 3 AND ${3 + pqK - 1}),
      coded AS (
        SELECT s.vec_id, s.label, s.m, c.j,
               ${l2fix6Sql(s"s.r[s.m * $pqDsub + 1 : s.m * $pqDsub + $pqDsub]", "c.cent")} AS d
        FROM (SELECT vec_id, label, m, r FROM resid CROSS JOIN ms) s
        JOIN codebook c ON c.m = s.m),
      codes AS (
        SELECT vec_id, label, m, j
        FROM (SELECT vec_id, label, m, j,
                     ROW_NUMBER() OVER (PARTITION BY vec_id, m
                       ORDER BY d, j) AS rn
              FROM coded) t
        WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      probed AS (
        SELECT q_id, label, centroid FROM (
          SELECT q_id, c.label, c.centroid,
                 ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
                   ${dotSql("c.centroid", "q_emb")} /
                   (sqrt(${dotSql("c.centroid", "c.centroid")}) *
                    sqrt(${dotSql("q_emb", "q_emb")})) DESC, c.label) AS cell_rk
          FROM q CROSS JOIN cent c)
        WHERE cell_rk <= $ivfNprobe),
      qres AS (
        SELECT p.q_id, p.label,
               list_transform(list_zip(q.q_emb, p.centroid),
                 x -> CAST(x[1] AS DOUBLE) - x[2]) AS rq
        FROM probed p JOIN q USING (q_id)),
      qdist AS (
        SELECT s.q_id, s.label, s.m, c.j,
               ${l2fix6Sql(s"s.rq[s.m * $pqDsub + 1 : s.m * $pqDsub + $pqDsub]", "c.cent")} AS qd
        FROM (SELECT q_id, label, m, rq FROM qres CROSS JOIN ms) s
        JOIN codebook c ON c.m = s.m),
      est AS (
        SELECT qd.q_id, co.vec_id, CAST(SUM(qd.qd) AS BIGINT) AS est
        FROM codes co
        JOIN qdist qd ON qd.label = co.label AND qd.m = co.m AND qd.j = co.j
        WHERE co.vec_id <> qd.q_id
        GROUP BY qd.q_id, co.vec_id),
      shortlist AS (
        SELECT q_id, vec_id AS n_id
        FROM (SELECT q_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY est, vec_id) AS srk
              FROM est) t
        WHERE srk <= 20),
      scored AS (
        SELECT s.q_id, s.n_id,
               ${dotSql("e.embedding", "q.q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q.q_emb", "q.q_emb")})) AS sim
        FROM shortlist s
        JOIN embeddings e ON e.vec_id = s.n_id
        JOIN q ON q.q_id = s.q_id)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM (SELECT q_id, n_id, sim,
                   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                     ORDER BY sim DESC, n_id) AS INTEGER) AS rk
            FROM scored) t
      WHERE rk <= 3
      ORDER BY q_id, rk"""))
}

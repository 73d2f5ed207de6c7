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
      quantize, mrlAnn, bqAnn, dimStats, pqAnn, ivfPqAnn, semDedup, driftMonitor,
      clusterSelect, pcaPower, outliers, knnGraph, radiusSearch)

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

  /** Native codegen'd cosine over two float-array columns
    * ([[graft.functions.CosineSim]]) — bit-equal to the composable fold
    * (same sequential left-folds; FunctionsSpec pins the equality), but
    * one fused whole-stage-codegen loop instead of an interpreted lambda
    * chain per pair. Used on every heavy pair-scoring path; [[knnBrute]]
    * deliberately keeps the composable form as the lambda-chain coverage
    * anchor ([[knnNative]] is its native twin). */
  private def cosineSimNative(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  /** Sequential double dot product of two float lists (DuckDB oracle side;
    * the Spark side is the same left-fold via `aggregate(zip_with(...))`). */
  private[queries] def dotSql(a: String, b: String): String =
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
        .agg(rnd6(davg(col("v").cast("double"))).as("centroid"),
          count(lit(1)).as("n"))
        .select(col("label"), (col("pos") + 1).as("pos"), col("centroid"), col("n"))
        .orderBy(col("label"), col("pos"))
    },
    Some(s"""
      SELECT label, pos, ${rnd6Sql(davgSql("v"))} AS centroid, COUNT(*) AS n
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
  /** Corpus-scaled band width: smallest b ≥ [[annPlanesPerTable]] with
    * expected bucket occupancy N/2^b ≤ [[annTargetBucket]]. Fixed-width
    * bands make per-bucket candidate pairs grow quadratically with the
    * corpus (the round-4 `v_knn_graph` weakness); scaling the bit width
    * with N keeps Σ|bucket|² ∝ N·target — the self-join stays linear at
    * 100 TB (b=29 at 10^10 vectors, well inside the BIGINT bucket).
    * Pure integer arithmetic so the Spark and DuckDB computations agree
    * exactly (a float log2 differs in the last ulp near powers of two). */
  private val annTargetBucket = 32
  private[graft] def bandBits(n: Long): Int =
    (annPlanesPerTable to 40)
      .find(k => n <= annTargetBucket.toLong * (1L << k)).getOrElse(40)

  /** Driver-side twin of [[planesN]]'s md5-derived weight for plane `p`,
    * dimension `pos` — tiny (16·b × 64 doubles), so the whole plane
    * matrix embeds as a literal and banding becomes a zero-shuffle
    * scalar projection per vector (no explode, no join, no aggregate —
    * the same encode-is-a-projection shape as the PQ/IVF assigners). */
  private def planeWeight(p: Int, pos: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$pos".getBytes("UTF-8"))
    val hex = h.map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0 - 0.5
  }

  /** Per-corpus banded buckets: [[bandUdf]] with the corpus-scaled
    * [[bandBits]] width — a primitive-array UDF (not a higher-order-
    * function expression, which Spark evaluates interpreted — measured
    * 2× slower; the UDF loop is one JIT'd zero-shuffle scan computing
    * the EXACT fix6 arithmetic of the SQL path). */
  private def bandedBuckets(spark: SparkSession, e: DataFrame): DataFrame = {
    val band = bandUdf(annTables, bandBits(e.count()))
    // materialize once: every consumer references the bucket frame twice
    // (self-join / query-probe), and without the cut each reference would
    // re-run the banding scan (N·16 rows — linear, safe to checkpoint)
    e.select(col("vec_id"), explode(band(col("embedding"))).as("tb"))
      .select(col("vec_id"), col("tb._1").as("tbl"), col("tb._2").as("bucket"))
      .localCheckpoint()
  }

  /** Oracle twin of [[bandedBuckets]] incl. the corpus-scaled band width
    * (CTE `bw` mirrors [[bandBits]] with the same integer search). */
  private val bandedSql =
    s"""WITH bw AS (
          SELECT MIN(k) AS b
          FROM (SELECT CAST(unnest(range($annPlanesPerTable, 41)) AS INTEGER) AS k)
          WHERE (SELECT COUNT(*) FROM embeddings)
                  <= $annTargetBucket * (1::BIGINT << k))
        SELECT vec_id, p // (SELECT b FROM bw) AS tbl,
          CAST(SUM(CASE WHEN proj > 0
                        THEN 1::BIGINT << (p % (SELECT b FROM bw)) ELSE 0 END)
               AS BIGINT) AS bucket
        FROM (SELECT vec_id, p,
                     SUM(CAST(FLOOR(w * v * 1000000 + 0.5) AS BIGINT)) AS proj
              FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings) t
              JOIN (SELECT p, pos,
                           (('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT
                             % 1000000) / 1000000.0 - 0.5 AS w
                    FROM (SELECT CAST(unnest(range((SELECT $annTables * b FROM bw)))
                                      AS INTEGER) AS p)
                    CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS pos)) pl
                USING (pos)
              GROUP BY vec_id, p) s
        GROUP BY vec_id, p // (SELECT b FROM bw)"""

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
        .select(col("q_id"), col("n_id"), cosineSimNative("embedding", "q_emb").as("sim"))
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

  /** Radius (range) search — the OTHER similarity-search contract next
    * to top-k: return EVERYTHING within cosine ≥ τ of each query, with
    * the result size data-dependent (dedup sweeps and recall-contract
    * retrieval want "all matches", not "best 3"). Same multi-table LSH
    * prefilter as [[lshAnn]] ([[bandedBuckets]], corpus-scaled band
    * width), then exact cosine against candidates only; reported per
    * query as candidate/hit counts + the hit-similarity envelope, so the
    * output stays O(queries) however dense a neighborhood gets. At 100 TB
    * the candidate set is the only thing scored — the corpus is scanned
    * once to bucket, never per query. τ = 0.3 sits inside this corpus's
    * similarity range (max pairwise ≈ 0.51) so the gate exercises real
    * hits AND real prefilter rejections at every SF. */
  val radiusSearch: GQuery = GQuery(
    "v_radius_search",
    "LSH-prefiltered cosine radius search (τ=0.3): per-query hit stats",
    (spark, dir) => {
      val tau = 0.3d
      val e = Catalog.table(spark, dir, "embeddings")
      val bb = bandedBuckets(spark, e)
      val qSet = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val qBuckets = bb.join(qSet.select(col("q_id")),
        bb("vec_id") === col("q_id")).select(col("q_id"), col("tbl"), col("bucket"))
      val cand = bb.join(broadcast(qBuckets), Seq("tbl", "bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id")).distinct()
      cand
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), cosineSimNative("embedding", "q_emb").as("sim"))
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("sim") >= tau, 1L).otherwise(0L)).as("n_hits"),
          round(max(when(col("sim") >= tau, col("sim"))), 6).as("max_hit_sim"),
          round(min(when(col("sim") >= tau, col("sim"))), 6).as("min_hit_sim"))
        .orderBy(col("q_id"))
    },
    Some(s"""
      WITH bb AS ($bandedSql),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 5),
      qb AS (SELECT q_id, tbl, bucket FROM bb JOIN q ON bb.vec_id = q.q_id),
      cand AS (SELECT DISTINCT q_id, bb.vec_id AS n_id
               FROM bb JOIN qb USING (tbl, bucket)
               WHERE bb.vec_id <> qb.q_id),
      scored AS (
        SELECT cand.q_id,
               ${dotSql("n.embedding", "q_emb")} /
               (sqrt(${dotSql("n.embedding", "n.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM cand
        JOIN embeddings n ON n.vec_id = cand.n_id
        JOIN q ON q.q_id = cand.q_id)
      SELECT q_id, COUNT(*) AS n_cand,
             CAST(SUM(CASE WHEN sim >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
             ROUND(MAX(CASE WHEN sim >= 0.3 THEN sim END), 6) AS max_hit_sim,
             ROUND(MIN(CASE WHEN sim >= 0.3 THEN sim END), 6) AS min_hit_sim
      FROM scored GROUP BY q_id ORDER BY q_id"""))

  // ------------------------------------------------------------ k-means
  /** Deterministic distributed Lloyd's k-means — the trained quantizer
    * behind [[ivfAnn]], [[pqAnn]] and [[ivfPqAnn]] (no reference
    * counterpart; FAISS-style index training re-expressed as Spark
    * dataflow). Frames: vecs = (m, id, vec: array<double>), centroids =
    * (m, j, cent) — `m` is the subspace key (a single literal 0 trains one
    * global codebook; 0..M-1 trains M independent per-subspace codebooks
    * in ONE dataflow). Every step is engine-exact: distances are fix6
    * integer L2² ([[l2fix6]]), assignment is the lexicographic integer
    * argmin (d, then j — tie-stable on any engine), means are
    * [[graft.util.Num.davg]] fixed-point (order-free), and an emptied
    * cluster keeps its previous centroid (COALESCE), so the fit is
    * bit-identical on Spark and DuckDB at any partitioning.
    *
    * Scale shape: per iteration ONE broadcast of the (k×d, driver-tiny)
    * centroid table against a corpus scan, ONE (m,id)-keyed argmin
    * aggregate and ONE (m,j,pos)-keyed mean aggregate — both two-phase
    * with map-side partials. Each iteration's centroids are eagerly
    * `localCheckpoint`ed: k×d rows, recomputable-from-source cost is
    * trivial, and the truncation keeps the unrolled plan linear in
    * iterations instead of exponential (the frame is referenced twice per
    * round). At 100 TB one trains on a uniform sample (the fixed-point
    * discipline is sample-stable) and runs one full assignment pass —
    * exactly the [[kmeansAssign]] E-step.
    *
    * The DuckDB oracle mirror ([[kmeansSqlCtes]]) marks every iteration
    * CTE `AS MATERIALIZED`: DuckDB inlines CTEs per reference, and the
    * unrolled recurrence references each round twice — inlining would
    * re-evaluate the whole chain exponentially. */
  /** Per-subspace codebook as ONE broadcastable row: (m, cbs) with cbs
    * sorted ascending by j — the fold order [[bestJ]] depends on. */
  private def centsArr(cents: DataFrame): DataFrame =
    cents.groupBy(col("m"))
      .agg(array_sort(collect_list(struct(col("j"), col("cent")))).as("cbs"))

  /** Scalar nearest-centroid index over the broadcast codebook array
    * `cbs` for the double-array column `vec`: per-entry fix6 L2² then an
    * `array_min` over (d, j) structs — the lexicographic integer argmin
    * (smallest d, ties to smallest j), exactly what the oracle's
    * ROW_NUMBER(ORDER BY d, j) computes. This makes ASSIGNMENT a per-row
    * codegen'd projection: zero shuffle, so corpus encoding is
    * scan-parallel at any scale (an aggregate-argmin form would shuffle
    * the whole corpus once per E-step). */
  private val bestJ: Column = {
    val d2 = "CAST(FLOOR(aggregate(zip_with(vec, c.cent," +
      " (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *" +
      " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))," +
      " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)" +
      " * 1000000.0D + 0.5D) AS BIGINT)"
    expr(s"array_min(transform(cbs, c -> named_struct('d', $d2, 'j', c.j))).j")
  }

  /** Deterministic fits are trained ONCE per (session, corpus, index
    * family) and reused — the production index lifecycle (build once,
    * serve many). Reuse cannot change results: the fit is bit-identical
    * on every rebuild (fix6/davg discipline), which the oracle gate
    * re-proves on every run by recomputing the full fit in DuckDB.
    * Cache keys carry the session UUID, so frames never outlive their
    * SparkContext (entries from stopped sessions are simply unreachable). */
  private val idxCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private def cachedIdx[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    idxCache.computeIfAbsent(
      spark.sparkContext.applicationId + "|" + key, _ => build).asInstanceOf[T]

  /** Final E-step: (m, id, j) nearest-centroid assignment — one
    * broadcast-join projection, no shuffle. */
  private def kmeansAssign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.join(broadcast(centsArr(cents)), Seq("m"))
      .select(col("m"), col("id"), bestJ.as("j"))

  private def kmeansFit(vecs: DataFrame, seed: DataFrame, iters: Int): DataFrame =
    (1 to iters).foldLeft(seed) { (cents, i) =>
      // assignment is a scalar projection (no join-back, no shuffle);
      // the round's only real shuffle is the (m, j, pos) mean aggregate
      val asgv = vecs.join(broadcast(centsArr(cents)), Seq("m"))
        .select(col("m"), bestJ.as("j"), col("vec"))
      val upd = asgv
        .select(col("m"), col("j"), posexplode(col("vec")).as(Seq("pos", "v")))
        .groupBy(col("m"), col("j"), col("pos"))
        .agg(davg(col("v")).as("c"))
        .groupBy(col("m"), col("j"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
          .as("cent"))
      val merged = cents.select(col("m"), col("j"), col("cent").as("cent0"))
        .join(broadcast(upd), Seq("m", "j"), "left")
        .select(col("m"), col("j"),
          coalesce(col("cent"), col("cent0")).as("cent"))
      // cut every SECOND round (and the last): each uncut round grows the
      // plan 2x (cents is referenced twice), so the between-cut growth is
      // bounded at 4x of a tiny checkpoint scan while the eager-job count
      // - the dominant fixed cost of training at bench scale - halves
      if (i % 2 == 0 || i == iters) merged.localCheckpoint() else merged
    }

  /** Oracle-side mirror of [[kmeansAssign]]: (m, id, j) E-step. */
  private def kmeansAssignSql(vecsCte: String, centsCte: String): String =
    s"""SELECT m, id, j FROM (
          SELECT v.m, v.id, c.j,
                 ROW_NUMBER() OVER (PARTITION BY v.m, v.id
                   ORDER BY ${l2fix6Sql("v.vec", "c.cent")}, c.j) AS rn
          FROM $vecsCte v JOIN $centsCte c ON c.m = v.m) t
        WHERE rn = 1"""

  /** Oracle-side mirror of [[kmeansFit]]: `iters` unrolled Lloyd's rounds
    * as CTEs `{p}_a1,{p}_u1,{p}_c1,…`; the final centroid table is
    * `{p}_c{iters}`. MATERIALIZED is load-bearing — see [[kmeansFit]]. */
  private def kmeansSqlCtes(vecsCte: String, seedCte: String, iters: Int,
      p: String): String =
    (1 to iters).map { i =>
      val prev = if (i == 1) seedCte else s"${p}_c${i - 1}"
      s"""${p}_a$i AS MATERIALIZED (
        SELECT m, id, j FROM (
          SELECT v.m, v.id, c.j,
                 ROW_NUMBER() OVER (PARTITION BY v.m, v.id
                   ORDER BY ${l2fix6Sql("v.vec", "c.cent")}, c.j) AS rn
          FROM $vecsCte v JOIN $prev c ON c.m = v.m) t
        WHERE rn = 1),
      ${p}_u$i AS MATERIALIZED (
        SELECT m, j, list(c ORDER BY pos) AS cent
        FROM (SELECT m, j, pos, ${davgSql("vv")} AS c
              FROM (SELECT a.m, a.j, generate_subscripts(v.vec, 1) AS pos,
                           CAST(unnest(v.vec) AS DOUBLE) AS vv
                    FROM ${p}_a$i a
                    JOIN $vecsCte v ON v.m = a.m AND v.id = a.id) x
              GROUP BY m, j, pos) y
        GROUP BY m, j),
      ${p}_c$i AS MATERIALIZED (
        SELECT c0.m, c0.j, COALESCE(u.cent, c0.cent) AS cent
        FROM $prev c0 LEFT JOIN ${p}_u$i u ON u.m = c0.m AND u.j = c0.j)"""
    }.mkString(",\n")

  // ------------------------------------------------------------ IVF ANN
  /** IVF ANN with a TRAINED coarse quantizer: `ivfK` k-means cells
    * ([[kmeansFit]], `ivfIters` Lloyd's rounds), every corpus vector
    * assigned to its nearest cell, queries probe the `ivfNprobe` nearest
    * cells (integer-L2 cell ranking — the corpus is unit-norm, so L2
    * order ≡ cosine order) and exact-re-rank only vectors in probed
    * cells — candidate cost ≈ nprobe/ncells of the corpus. Measured
    * recall@3 vs the brute-force ground truth: 0.889 (DifferentialSpec;
    * up from the 0.333 random-cell floor the untrained label-cell
    * variant measured — this fixture's labels are uncorrelated with
    * geometry, so cells MUST be learned). At 100 TB: training on a
    * sample + one assignment pass; the probe/score dataflow — broadcast
    * quantizer, cell-restricted scan, exact re-rank — is one corpus
    * pass with all small sides broadcast. */
  private val ivfNprobe = 4
  private val ivfK = 10
  private val ivfIters = 8

  /** The trained IVF index — (vecs, cents), cached per session+corpus and
    * SHARED by every consumer ([[ivfAnn]], [[semDedup]]): one index, many
    * uses, exactly the production lifecycle. */
  private def ivfIndex(spark: SparkSession, e: DataFrame, dir: String)
      : (DataFrame, DataFrame) =
    cachedIdx(spark, s"ivf|$dir") {
      // cut once: the training loop and final assignment read this
      // frame repeatedly - a checkpoint scan beats re-projection
      val v = e.select(lit(0).as("m"), col("vec_id").as("id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
        .localCheckpoint()
      val seed = v.filter(col("id").between(3, 3 + ivfK - 1))
        .select(col("m"), (col("id") - 3).cast("int").as("j"),
          col("vec").as("cent"))
      (v, kmeansFit(v, seed, ivfIters))
    }

  /** Oracle twin of [[ivfIndex]]+[[kmeansAssign]]: CTEs `vecs`, `seed`,
    * the unrolled fit, and `cells` (id, j) — shared verbatim by every
    * consumer's oracle so the trained cells are provably the same fit. */
  private lazy val ivfTrainSql: String = s"""vecs AS MATERIALIZED (
        SELECT 0 AS m, vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      seed AS (SELECT m, CAST(id - 3 AS INTEGER) AS j, vec AS cent FROM vecs
               WHERE id BETWEEN 3 AND ${3 + ivfK - 1}),
      ${kmeansSqlCtes("vecs", "seed", ivfIters, "km")},
      cells AS MATERIALIZED (${kmeansAssignSql("vecs", s"km_c$ivfIters")})"""

  /** Corpus-scaled sub-bucket bits for [[semDedup]]: smallest r ≥ 0 with
    * expected cell size N/[[ivfK]] ≤ [[semTargetCell]]·2^r. SemDeDup's
    * quadratic term is Σ|cell|²; with fixed k it grows as N²/k (the
    * round-4 weakness). Scaling k ∝ N fixes the pairing but makes
    * TRAINING quadratic (assignment is N·k distance evals — measured
    * 28 s at the 10× replica). Instead the trained cells stay fixed-k
    * (shared, cached [[ivfIndex]] — training linear) and each cell is
    * subdivided by r sign-hash bits from [[semTables]] independent LSH
    * band tables ([[planeWeight]] planes — the [[bandedBuckets]]
    * machinery applied within cells): candidates are pairs sharing
    * (cell, bucket) in ANY table, so pair work is bounded by sub-bucket
    * size ∝ [[semTargetCell]] at any corpus. r = 0 at gate scale (the
    * sub-split engages only beyond N = ivfK·target), where candidates
    * degenerate to exactly the per-cell pairs. The LSH split is the
    * documented recall trade: a near-dup pair at threshold sim 0.35
    * survives ≥1-of-$semTables band match with p ≈ 0.85 at r = 2. */
  private val semTargetCell = 50
  private val semTables = 4
  private[graft] def semSubBits(n: Long): Int =
    (0 to 40).find(r =>
      n <= ivfK.toLong * semTargetCell * (1L << r)).getOrElse(40)

  /** Per-id banding of `(id, emb)` rows: [[planeWeight]] sign-hash over
    * `tables`×`bits` planes as a primitive-loop UDF (see
    * [[bandedBuckets]] for why a UDF). bits = 0 → bucket 0 every table
    * (the degenerate no-split band). */
  private def bandUdf(tables: Int, bits: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val planes: Array[Array[Double]] = (0 until tables * bits).map { p =>
      (1 to 64).map(pos => planeWeight(p, pos)).toArray
    }.toArray
    udf { (emb: Seq[Float]) =>
      val v = emb.toArray
      Array.tabulate(tables) { t =>
        var bucket = 0L
        var i = 0
        while (i < bits) {
          val w = planes(t * bits + i)
          var proj = 0L
          var d = 0
          while (d < v.length) {
            proj += math.floor(w(d) * v(d).toDouble * 1000000.0 + 0.5).toLong
            d += 1
          }
          if (proj > 0L) bucket |= 1L << i
          i += 1
        }
        (t, bucket)
      }
    }
  }

  /** Oracle twin of [[bandUdf]] applied to the `embeddings` table:
    * (vec_id, tbl, bucket) rows, with the bit count from `bitsSql`
    * (a scalar subquery). Handles bits = 0 via the tables×vec grid +
    * left join (no proj rows → COALESCE 0 buckets). */
  private def bandedSqlFor(tables: Int, bitsSql: String): String =
    s"""SELECT g.vec_id, g.t AS tbl,
          COALESCE(SUM(CASE WHEN s.proj > 0
                            THEN 1::BIGINT << (s.p % NULLIF(($bitsSql), 0))
                            ELSE 0 END), 0) AS bucket
        FROM (SELECT vec_id, CAST(unnest(range($tables)) AS INTEGER) AS t
              FROM embeddings) g
        LEFT JOIN (
          SELECT vec_id, p,
                 SUM(CAST(FLOOR(w * v * 1000000 + 0.5) AS BIGINT)) AS proj
          FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS v
                FROM embeddings) t
          JOIN (SELECT p, pos,
                       (('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT
                         % 1000000) / 1000000.0 - 0.5 AS w
                FROM (SELECT CAST(unnest(range((SELECT $tables * ($bitsSql))))
                                  AS INTEGER) AS p)
                CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS pos)) pl
            USING (pos)
          GROUP BY vec_id, p) s
          ON s.vec_id = g.vec_id AND s.p // NULLIF(($bitsSql), 0) = g.t
        GROUP BY g.vec_id, g.t"""

  /** Scalar-subquery twin of [[semSubBits]]. */
  private val semBitsSql: String =
    s"""SELECT MIN(k) FROM (SELECT CAST(unnest(range(0, 41)) AS INTEGER) AS k)
        WHERE (SELECT COUNT(*) FROM embeddings)
                <= $ivfK * $semTargetCell * (1::BIGINT << k)"""

  val ivfAnn: GQuery = GQuery(
    "v_ivf_ann",
    s"IVF ANN: $ivfK trained k-means cells, probe $ivfNprobe, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val (vecs, cents) = ivfIndex(spark, e, dir)
      val cells = kmeansAssign(vecs, cents)
        .select(col("id").as("vec_id"), col("j"))
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cellRank = Window.partitionBy(col("q_id")).orderBy(col("cd"), col("j"))
      val probed = qSet.crossJoin(broadcast(cents))
        .select(col("q_id"), col("j"), l2fix6("q_emb", "cent").as("cd"))
        .withColumn("cell_rk", row_number().over(cellRank))
        .filter(col("cell_rk") <= ivfNprobe)
        .select(col("q_id"), col("j"))
      // score only vectors assigned to the probed cells
      val scored = e.join(cells, "vec_id")
        .join(broadcast(probed), Seq("j"))
        .filter(col("vec_id") =!= col("q_id"))
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("vec_id").as("n_id"), cosineSimNative("embedding", "q_emb").as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH $ivfTrainSql,
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      probed AS (
        SELECT q_id, j FROM (
          SELECT q.q_id, c.j,
                 ROW_NUMBER() OVER (PARTITION BY q.q_id
                   ORDER BY ${l2fix6Sql("q.q_emb", "c.cent")}, c.j) AS cell_rk
          FROM q CROSS JOIN km_c$ivfIters c) t
        WHERE cell_rk <= $ivfNprobe),
      scored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               ${dotSql("e.embedding", "q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM embeddings e
        JOIN cells ce ON ce.id = e.vec_id
        JOIN probed p ON p.j = ce.j
        JOIN q ON q.q_id = p.q_id
        WHERE e.vec_id <> q.q_id),
      ranked AS (
        SELECT q_id, n_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
                    AS INTEGER) AS rk
        FROM scored)
      SELECT q_id, rk, n_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ SemDeDup
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster embeddings with k-means, compare pairs ONLY
    * within a cluster, and drop all but one member of each near-dup pair.
    * Reuses the SAME trained IVF index as [[ivfAnn]] ([[ivfIndex]],
    * session-cached) — fixed k, so training stays linear — and splits
    * oversized cells with corpus-scaled LSH sub-buckets ([[semSubBits]]):
    * candidate cost is bounded by sub-bucket size instead of cell size,
    * so pair generation stays linear in the corpus at 100 TB while the
    * per-(cell,bucket) self-join keeps the paper's embarrassingly
    * parallel shape. The verdict for a dropped vector is deterministic: its
    * keeper is the smallest-id partner among its ≥-threshold pairs
    * (min-struct, integer argmin), similarity exact (sequential fold),
    * so the output hash-gates like everything else.
    *
    * The plan collapses EXACT-duplicate embeddings before pairing
    * (dedup-before-near-dup, the [[graft.queries.TextOps]] cleaning-
    * pipeline ordering applied to vectors): pair similarities are
    * computed once per DISTINCT-embedding pair per cell, then verdicts
    * expand back to members. This is output-equal to the naive member-
    * pair formulation — the keeper argmin orders by a_id first and
    * every group's minimum id dominates any other member of its group,
    * and identical byte-equal vectors give identical fold results — but
    * on a replica-heavy corpus (the web case SemDeDup exists for) the
    * quadratic work shrinks by the replication factor squared: measured
    * 250 s → 4.1 s at the 10×-replica bench (a ~1.2× constant overhead
    * on a replica-free corpus) while the output stays byte-identical. */
  val semDedup: GQuery = GQuery(
    "v_semdedup",
    "SemDeDup: trained-cell-bounded embedding near-dup pruning verdicts",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val (vecs, cents) = ivfIndex(spark, e, dir)
      val cells = kmeansAssign(vecs, cents)
        .select(col("id").as("vec_id"), col("j").as("cell"))
      val withC = e.join(cells, "vec_id")
        .select(col("vec_id"), col("cell"), col("embedding"))
      // one group per distinct embedding per cell; gid = min member id.
      // r14: checkpointed — grp feeds 4 consumers (band table, both
      // pair-sim sides, the self-sim branch, and the member re-join);
      // without the cut each re-ran the scan + assign + group exchange.
      val grp = withC.groupBy(col("cell"), col("embedding"))
        .agg(min(col("vec_id")).as("gid"), count(lit(1)).as("gn"))
        .localCheckpoint()
      // corpus-scaled LSH sub-split of oversized cells ([[semSubBits]]):
      // candidate group pairs must share (cell, band bucket) in ≥1 of the
      // semTables tables; r = 0 (gate scale) gives bucket 0 everywhere =
      // plain per-cell pairing
      val band = bandUdf(semTables, semSubBits(e.count()))
      val gb = grp
        .select(col("cell"), col("gid"), explode(band(col("embedding"))).as("tb"))
        .select(col("cell"), col("gid"), col("tb._1").as("tbl"),
          col("tb._2").as("bucket"))
        .localCheckpoint()
      val candPairs = gb.as("bx").join(gb.as("by"),
          col("bx.cell") === col("by.cell") && col("bx.tbl") === col("by.tbl") &&
            col("bx.bucket") === col("by.bucket") &&
            col("bx.gid") < col("by.gid"))
        .select(col("bx.cell").as("cell"), col("bx.gid").as("ga"),
          col("by.gid").as("gb")).distinct()
      // inter-group sims: one fold per distinct pair, both verdict
      // directions derived from it (the min member of the partner group
      // is always the argmin candidate for any member it qualifies for)
      val gemb = grp.select(col("cell"), col("gid"), col("embedding"))
      val gp = candPairs
        .join(gemb.select(col("cell"), col("gid").as("ga"),
          col("embedding").as("ea")), Seq("cell", "ga"))
        .join(gemb.select(col("cell"), col("gid").as("gb"),
          col("embedding").as("eb")), Seq("cell", "gb"))
        .select(col("ga"), col("gb"), cosineSimNative("ea", "eb").as("sim"))
        .filter(col("sim") >= 0.35)
      // intra-group sim: identical bytes, same fold the member pair ran
      val gSelf = grp.filter(col("gn") >= 2)
        .select(col("gid").as("g"), col("gid").as("cand"),
          cosineSimNative("embedding", "embedding").as("sim"))
        .filter(col("sim") >= 0.35)
      val cands = gp.select(col("gb").as("g"), col("ga").as("cand"), col("sim"))
        .union(gp.select(col("ga").as("g"), col("gb").as("cand"), col("sim")))
        .union(gSelf)
      val mem = withC.join(grp.select(col("cell"), col("embedding"), col("gid")),
        Seq("cell", "embedding"))
      mem.join(cands, mem("gid") === cands("g"))
        .filter(col("cand") < col("vec_id"))
        .groupBy(col("vec_id").as("dropped_id"))
        .agg(min(struct(col("cand").as("a_id"), col("sim"))).as("k"))
        .select(col("dropped_id"), col("k.a_id").as("kept_id"),
          round(col("k.sim"), 6).as("sim"))
        .orderBy(col("dropped_id"))
    },
    Some(s"""
      WITH $ivfTrainSql,
      wc AS MATERIALIZED (
        SELECT e.vec_id, ce.j AS cell, e.embedding
        FROM embeddings e JOIN cells ce ON ce.id = e.vec_id),
      bnd AS MATERIALIZED (${bandedSqlFor(semTables, semBitsSql)}),
      bndc AS MATERIALIZED (
        SELECT b.vec_id, w.cell, b.tbl, b.bucket
        FROM bnd b JOIN wc w USING (vec_id)),
      cp AS MATERIALIZED (
        SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id
        FROM bndc x JOIN bndc y
          ON x.cell = y.cell AND x.tbl = y.tbl AND x.bucket = y.bucket
         AND x.vec_id < y.vec_id),
      pairs AS (
        SELECT cp.a_id, cp.b_id,
               ${dotSql("x.embedding", "y.embedding")} /
               (sqrt(${dotSql("x.embedding", "x.embedding")}) *
                sqrt(${dotSql("y.embedding", "y.embedding")})) AS sim
        FROM cp
        JOIN embeddings x ON x.vec_id = cp.a_id
        JOIN embeddings y ON y.vec_id = cp.b_id),
      kept AS (
        SELECT b_id AS dropped_id, a_id AS kept_id, sim,
               ROW_NUMBER() OVER (PARTITION BY b_id ORDER BY a_id) AS rn
        FROM pairs WHERE sim >= 0.35)
      SELECT dropped_id, kept_id, ROUND(sim, 6) AS sim
      FROM kept WHERE rn = 1
      ORDER BY dropped_id"""))

  // ------------------------------------------------------------ PCA (power iteration)
  /** Top principal component by distributed power iteration — the
    * whitening/dim-reduction/drift-analysis fit of an embedding pipeline.
    * One corpus pass builds the exact 64×64 covariance matrix: per-vector
    * cross products for i ≤ j only (symmetry halves the 4096-per-row
    * expansion; the mirrored half is expanded back after aggregation —
    * integer sums are multiset-equal either way, so the oracle's
    * straightforward full-grid build is provably byte-identical),
    * accumulated as fix6 BIGINTs (partition-order-free), with the final
    * covariance a FIXED scalar double formula over those exact integers —
    * bit-identical on any engine. The 8 power-iteration rounds run on the
    * DRIVER over the collected 64×64 matrix (32 KB — the same shape as
    * MLlib's RowMatrix.computePrincipalComponents, which collects the
    * Gramian and does local linear algebra): each matvec row is a
    * sequential left-fold in ascending position order — the exact double
    * operation sequence of the previous frame form's
    * aggregate(zip_with(...)) — the per-round rescale divides by MAX|w|
    * (order-independent), and the final L2 normalization is one
    * ascending-position fold. r14: moving the fixed-size iterations off
    * the scheduler removed ~35 serialized one-task broadcast jobs per
    * execution (~20-40 ms each); outputs are bit-identical because every
    * float op sequence is preserved and the final round/sqrt still runs
    * through the same Spark expressions.
    * At 100 TB: covariance is the only corpus scan (constant 2080
    * products per row, map-side partials shrink the shuffle to 2080
    * groups); iterations are corpus-free. Production would iterate to
    * tolerance; the operator contract pins 8 rounds from the all-ones
    * start so the fit is a deterministic function of the data. */
  private val pcaIters = 8

  /** Driver-side power iteration over the collected covariance rows
    * (ascending-i order). Preserves the previous frame form's float-op
    * sequence exactly: matvec = left fold ascending j, rescale = /max|w|,
    * final ss = left fold of squares ascending position. Returns the
    * unnormalized direction v and its squared L2 norm ss. */
  private[graft] def powerIterate(
      mrows: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    var v = Array.fill(64)(1.0d)
    for (_ <- 1 to iters) {
      val w = mrows.map { row =>
        var a = 0.0d; var j = 0
        while (j < row.length) { a += row(j) * v(j); j += 1 }
        a
      }
      var m = 0.0d
      w.foreach(x => if (math.abs(x) > m) m = math.abs(x))
      v = w.map(_ / m)
    }
    var ss = 0.0d
    v.foreach(x => ss += x * x)
    (v, ss)
  }

  val pcaPower: GQuery = GQuery(
    "v_pca_power",
    s"top principal component: exact covariance + $pcaIters power iterations",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val flat = e.select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("p0", "x0")))
        .select(col("vec_id"), (col("p0") + 1).as("i"),
          col("x0").cast("double").as("x"))
      val sUpper = flat.as("a").join(flat.as("b"), "vec_id")
        .filter(col("a.i") <= col("b.i"))
        .select(col("a.i").as("i"), col("b.i").as("j"),
          fix6(col("a.x") * col("b.x")).as("f"))
        .groupBy(col("i"), col("j")).agg(sum(col("f")).as("sxy"))
      val s2 = sUpper.union(sUpper.filter(col("i") < col("j"))
        .select(col("j"), col("i"), col("sxy")))
      val s1 = flat.groupBy(col("i")).agg(sum(fix6(col("x"))).as("sx"))
      val nr = e.agg(count(lit(1)).as("n"))
      val c0 = s2.join(broadcast(s1.select(col("i"), col("sx").as("sxi"))), "i")
        .join(broadcast(s1.select(col("i").as("j"), col("sx").as("sxj"))), "j")
        .crossJoin(broadcast(nr))
        .select(col("i"), col("j"),
          ((col("sxy").cast("double") / 1000000.0d) / col("n") -
            (col("sxi").cast("double") / 1000000.0d / col("n")) *
            (col("sxj").cast("double") / 1000000.0d / col("n"))).as("c"))
      val cmat = c0.groupBy(col("i"))
        .agg(expr("transform(sort_array(collect_list(struct(j, c)))," +
          " s -> s.c)").as("row_arr"))
      // fixed-size (64×64, 32 KB) matrix: iterate on the driver.
      // Float-op order is preserved exactly vs the previous frame form:
      // matvec = left fold ascending j (aggregate over zip_with array
      // order), rescale = /max|w| (order-independent max), v kept in
      // ascending-i order (sort_array(collect_list(struct(i, wn)))).
      val mrows = cmat.select(col("i").cast("int"), col("row_arr"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1).map(_._2)
      val (v, ss) = powerIterate(mrows, pcaIters)
      // final rounding through the same Spark expressions as before
      import spark.implicits._
      v.toSeq.zipWithIndex.map { case (lv, p) => (p + 1, lv) }
        .toDF("pos", "lv")
        .select(col("pos").cast("int").as("pos"),
          round(col("lv") / sqrt(lit(ss)), 6).as("loading"))
        .orderBy(col("pos"))
    },
    Some {
      val iters = (1 to pcaIters).map { t =>
        val prev = if (t == 1) "v_0" else s"v_${t - 1}"
        s"""
        w_$t AS (SELECT i, list_reduce(list_transform(
                   list_zip(row_arr, v_arr), x -> x[1] * x[2]),
                   (a, b) -> a + b) AS w
                 FROM cmat CROSS JOIN $prev),
        m_$t AS (SELECT MAX(ABS(w)) AS m FROM w_$t),
        v_$t AS MATERIALIZED (SELECT list(w / m ORDER BY i) AS v_arr
                 FROM w_$t CROSS JOIN m_$t)"""
      }.mkString(",")
      s"""
      WITH flat AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      s2 AS (SELECT a.i AS i, b.i AS j,
                    SUM(CAST(FLOOR(a.x * b.x * 1000000 + 0.5) AS BIGINT)) AS sxy
             FROM flat a JOIN flat b ON a.vec_id = b.vec_id
             GROUP BY 1, 2),
      s1 AS (SELECT i, SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT)) AS sx
             FROM flat GROUP BY i),
      nr AS (SELECT COUNT(*) AS n FROM embeddings),
      c0 AS (SELECT s2.i, s2.j,
                    (CAST(sxy AS DOUBLE) / 1000000.0) / n -
                    (CAST(a.sx AS DOUBLE) / 1000000.0 / n) *
                    (CAST(b.sx AS DOUBLE) / 1000000.0 / n) AS c
             FROM s2 JOIN s1 a ON a.i = s2.i JOIN s1 b ON b.i = s2.j
             CROSS JOIN nr),
      cmat AS MATERIALIZED (
        SELECT i, list(c ORDER BY j) AS row_arr FROM c0 GROUP BY i),
      v_0 AS (SELECT list_transform(range(1, 65),
                p -> CAST(1.0 AS DOUBLE)) AS v_arr),$iters,
      fin AS (SELECT v_arr, list_reduce(list_transform(v_arr, x -> x * x),
                (a, b) -> a + b) AS ss
              FROM v_$pcaIters)
      SELECT CAST(gs AS INTEGER) AS pos,
             ROUND(v_arr[gs] / sqrt(ss), 6) AS loading
      FROM (SELECT ss, v_arr, generate_subscripts(v_arr, 1) AS gs FROM fin) t
      ORDER BY pos"""
    })

  // ------------------------------------------------------------ cluster-balanced selection
  /** Cluster-balanced coreset selection: equalize the training mix across
    * SEMANTIC clusters (trained IVF cells) the way [[graft.queries.TextOps]]
    * t_mixture_balance equalizes across metadata strata — the
    * DiverseEvol/DEITA-style diversity-selection step of a curation
    * pipeline. Every vector is assigned to its trained cell (zero-shuffle
    * scalar projection over the broadcast codebook, same cached index as
    * [[ivfAnn]]/[[semDedup]]), the per-cell quota is the SMALLEST cell's
    * size (a 1-row aggregate broadcast back), and each cell keeps its
    * `quota` members with the smallest content-independent md5 hash — an
    * exact rank, not a probabilistic rate, so the selected set is
    * reproducible across engines, runs, and partitionings. Scale shape:
    * oversample-then-trim — a derived integer hash pre-gate (threshold
    * 2·quota/cn permillion, the t_mixture_balance in-plan-rate pattern)
    * keeps ~2×quota members per cell inside the SCAN, so the exact-rank
    * window sorts only the ~2·quota·k survivor rows, never the corpus;
    * the 2× threshold margin sits far above the quota-th hash, so the
    * trimmed result equals the pure-rank selection. */
  val clusterSelect: GQuery = GQuery(
    "v_cluster_select",
    "cluster-balanced selection: per trained cell, keep quota members by hash rank",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val (vecs, cents) = ivfIndex(spark, e, dir)
      val cells = kmeansAssign(vecs, cents)
        .select(col("id").as("vec_id"), col("j").as("cell"))
      val cnts = cells.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
      val quota = cnts.agg(min(col("cn")).as("quota"))
      val gated = cells.join(broadcast(cnts), "cell")
        .crossJoin(broadcast(quota))
        .withColumn("h",
          pmod(TextOps.h60(col("vec_id").cast("string")), lit(1000000L)))
        .filter(col("h") <
          least(lit(1000000L), expr("(2000000 * quota) div cn")))
      val wC = Window.partitionBy(col("cell")).orderBy(col("h"), col("vec_id"))
      gated.withColumn("pick_rk", row_number().over(wC))
        .filter(col("pick_rk") <= col("quota"))
        .select(col("cell"), col("pick_rk"), col("vec_id"))
        .orderBy(col("cell"), col("pick_rk"))
    },
    Some(s"""
      WITH $ivfTrainSql,
      cellOf AS (SELECT id AS vec_id, j AS cell FROM cells),
      cnts AS (SELECT cell, COUNT(*) AS cn FROM cellOf GROUP BY cell),
      quota AS (SELECT MIN(cn) AS quota FROM cnts),
      gated AS (
        SELECT cell, vec_id, h FROM (
          SELECT c.cell, c.vec_id,
                 ${TextOps.h60Sql("CAST(c.vec_id AS VARCHAR)")} % 1000000 AS h,
                 n.cn, q.quota
          FROM cellOf c JOIN cnts n USING (cell) CROSS JOIN quota q) t
        WHERE h < LEAST(1000000, (2000000 * quota) // cn)),
      ranked AS (
        SELECT cell, vec_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY h, vec_id)
                 AS INTEGER) AS pick_rk
        FROM gated)
      SELECT cell, pick_rk, vec_id
      FROM ranked CROSS JOIN quota
      WHERE pick_rk <= quota
      ORDER BY cell, pick_rk"""))

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
          rnd6(davg(col("abs_err"))).as("avg_err"),
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
             ${rnd6Sql(davgSql("abs_err"))} AS avg_err,
             ROUND(MAX(abs_err), 6) AS max_err,
             COUNT(*) AS n
      FROM err
      GROUP BY pos
      ORDER BY pos"""))

  /** cosineSim over arbitrary column names (centroid is double[], query is
    * float[] — the CASTs make both folds double on both engines). */
  private[queries] def cosineSimCols(a: String, b: String): Column =
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
        .withColumn("sim16", cosineSimNative("emb16", "q_emb16"))
      val w16 = Window.partitionBy(col("q_id"))
        .orderBy(col("sim16").desc, col("vec_id"))
      val rerank = short.withColumn("rk16", row_number().over(w16))
        .filter(col("rk16") <= 20)
        .withColumn("sim", cosineSimNative("embedding", "q_emb"))
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

  // ------------------------------------------------------------ binary quantization
  /** Binary (1-bit) quantization ANN: each 64-dim vector compresses to its
    * 64 SIGN BITS, packed into two 32-bit words — 8 bytes per vector, a
    * 32× reduction over float32, and the candidate stage is pure integer
    * `bit_count(xor)` Hamming distance over the code table (the
    * binary-quantization index shape modern vector stores ship alongside
    * PQ). Top-40 Hamming shortlist per query, exact cosine re-rank of the
    * shortlist, top-3 out. Unlike [[pqAnn]]/[[ivfPqAnn]] this index needs
    * NO training, so it cannot go stale under the distribution drift
    * [[driftMonitor]] watches for — the zero-maintenance fallback index.
    *
    * Scale shape: at 100 TB the Hamming scan reads 8 bytes/vector and two
    * popcounts — bandwidth-bound, no shuffle until the 40-row-per-query
    * top-k; raw embeddings are touched only by the re-rank join (≤40 rows
    * per query). Determinism: sign test `v > 0` and the packed-word fold
    * are exact integer ops in both engines; Hamming ties break on vec_id. */
  private def signWord(arr: String, off: Int): Column =
    expr(s"aggregate(zip_with(slice($arr, ${off + 1}, 32), sequence(0, 31)," +
      s" (v, i) -> IF(CAST(v AS DOUBLE) > 0.0, shiftleft(1L, i), 0L))," +
      " 0L, (a, b) -> a + b)")

  private def signWordSql(arr: String, off: Int): String =
    s"list_reduce(list_transform(list_zip($arr[${off + 1}:${off + 32}]," +
      s" range(0, 32)), x -> CASE WHEN CAST(x[1] AS DOUBLE) > 0.0" +
      s" THEN 1::BIGINT << x[2] ELSE 0::BIGINT END), (a, b) -> a + b)"

  val bqAnn: GQuery = GQuery(
    "v_bq_ann",
    "binary sign-bit quantization ANN: Hamming shortlist-40 + exact rerank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val codes = e.select(col("vec_id"),
        signWord("embedding", 0).as("w0"), signWord("embedding", 32).as("w1"))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          signWord("embedding", 0).as("q0"), signWord("embedding", 32).as("q1"))
      val ham = codes.crossJoin(broadcast(q.select(col("q_id"), col("q0"), col("q1"))))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          expr("CAST(bit_count(w0 ^ q0) + bit_count(w1 ^ q1) AS INTEGER)").as("hamming"))
      val wH = Window.partitionBy(col("q_id"))
        .orderBy(col("hamming").asc, col("vec_id"))
      val short = ham.withColumn("rkh", row_number().over(wH))
        .filter(col("rkh") <= 40)
      val rerank = short
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
        .withColumn("sim", cosineSimNative("embedding", "q_emb"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      rerank.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk"), col("vec_id").as("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH codes AS (
        SELECT vec_id, ${signWordSql("embedding", 0)} AS w0,
               ${signWordSql("embedding", 32)} AS w1
        FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb,
                   ${signWordSql("embedding", 0)} AS q0,
                   ${signWordSql("embedding", 32)} AS q1
            FROM embeddings WHERE vec_id < 3),
      ham AS (
        SELECT q_id, c.vec_id,
               CAST(bit_count(xor(w0, q0)) + bit_count(xor(w1, q1)) AS INTEGER)
                 AS hamming
        FROM codes c CROSS JOIN q
        WHERE c.vec_id <> q_id),
      short AS (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id)
                 AS rkh
        FROM ham),
      rerank AS (
        SELECT s.q_id, s.vec_id,
               ${dotSql("e.embedding", "q_emb")} /
               (sqrt(${dotSql("e.embedding", "e.embedding")}) *
                sqrt(${dotSql("q_emb", "q_emb")})) AS sim
        FROM short s
        JOIN embeddings e ON e.vec_id = s.vec_id
        JOIN q ON q.q_id = s.q_id
        WHERE s.rkh <= 40),
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
          rnd6(davg(col("v"))).as("mean"),
          round(min(col("v")), 6).as("vmin"),
          round(max(col("v")), 6).as("vmax"),
          rnd6(davg(col("v") * col("v"))).as("mean_sq"),
          count(lit(1)).as("n"))
        .orderBy(col("pos"))
    },
    Some(s"""
      WITH flat AS (SELECT generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings)
      SELECT pos, ${rnd6Sql(davgSql("v"))} AS mean,
             ROUND(MIN(v), 6) AS vmin,
             ROUND(MAX(v), 6) AS vmax,
             ${rnd6Sql(davgSql("v * v"))} AS mean_sq,
             COUNT(*) AS n
      FROM flat
      GROUP BY pos
      ORDER BY pos"""))

  // ------------------------------------------------------------ drift monitor
  /** Embedding-distribution drift monitor — the production gate before
    * appending a new ingest batch to a training corpus: per-dimension
    * mean shift between the existing corpus (vec_id < 250, "ref") and
    * the incoming batch (vec_id ≥ 250, "new"), ranked by absolute
    * drift. A drifted embedding distribution invalidates trained ANN
    * codebooks and mixture weights downstream, so this check runs first.
    *
    * Scale shape: one scan, posexplode → per-(dim, half) partial
    * aggregates (2·64 groups — constant-size shuffle at ANY corpus
    * size), then a 64-row pivot. Means go through davg ([[graft.util
    * .Num]] fixed-point), so both halves' means — and therefore the
    * drift ordering — are bit-identical across engines and partition
    * layouts. */
  /** The drift core, factored for structural tests: rows of
    * (vec_id, embedding) split at `cut` → every dim scored
    * (dim, mean_ref, mean_new, drift). */
  private[graft] def driftScores(e: DataFrame, cut: Long): DataFrame =
    e.select(when(col("vec_id") < cut, "ref").otherwise("new").as("half"),
        posexplode(col("embedding")).as(Seq("pos0", "v")))
      .select(col("half"), (col("pos0") + 1).as("dim"),
        col("v").cast("double").as("v"))
      .groupBy(col("dim"), col("half"))
      .agg(davg(col("v")).as("m"))
      .groupBy(col("dim"))
      .agg(max(when(col("half") === "ref", col("m"))).as("mr"),
        max(when(col("half") === "new", col("m"))).as("mn"))
      .select(col("dim"), round(col("mr"), 6).as("mean_ref"),
        round(col("mn"), 6).as("mean_new"),
        round(abs(col("mn") - col("mr")), 6).as("drift"))

  val driftMonitor: GQuery = GQuery(
    "v_drift_monitor",
    "per-dim embedding mean drift between corpus and new batch, top-10",
    (spark, dir) => {
      driftScores(Catalog.table(spark, dir, "embeddings"), 250L)
        .orderBy(col("drift").desc, col("dim"))
        .limit(10)
    },
    Some(s"""
      WITH flat AS (SELECT CASE WHEN vec_id < 250 THEN 'ref' ELSE 'new' END AS half,
                           generate_subscripts(embedding, 1) AS dim,
                           CAST(unnest(embedding) AS DOUBLE) AS v
                    FROM embeddings),
      m AS (SELECT dim, half, ${davgSql("v")} AS m FROM flat GROUP BY dim, half),
      w AS (SELECT dim,
                   MAX(CASE WHEN half = 'ref' THEN m END) AS mr,
                   MAX(CASE WHEN half = 'new' THEN m END) AS mn
            FROM m GROUP BY dim)
      SELECT dim, ROUND(mr, 6) AS mean_ref, ROUND(mn, 6) AS mean_new,
             ROUND(ABS(mn - mr), 6) AS drift
      FROM w
      ORDER BY drift DESC, dim
      LIMIT 10"""))

  // ------------------------------------------------------------ PQ ANN
  private val pqM = 16    // subspaces (64 dims / 4)
  private val pqDsub = 4  // dims per subspace
  private val pqK = 16    // centroids per subspace
  private val pqIters = 4 // Lloyd's rounds for the per-subspace codebooks
  private val pqShort = 40 // ADC shortlist depth fed to the exact re-rank

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

  /** Product-quantization ANN with TRAINED codebooks — the fits-in-RAM
    * path at 100 TB: each 64-float (256 B) vector compresses to M=16
    * 4-bit-addressable centroid codes (16 B, 16×), so the candidate scan
    * touches only the code table; full vectors are read ONLY for the
    * exact re-rank of a `pqShort`-deep shortlist.
    *
    * The M per-subspace codebooks are fit by [[kmeansFit]] in ONE
    * dataflow (subspace index `m` is the group key), seeded from the
    * anchor vectors vec_id ∈ [3,19) and refined for `pqIters` Lloyd's
    * rounds — deterministic end to end (fix6 distances, lexicographic
    * argmin, davg means), so the codebook is bit-identical on both
    * engines. Measured recall@3 vs brute force: 0.889 (DifferentialSpec;
    * the untrained anchor codebook measured 0.222 — chance). ADC = one
    * broadcast of M×K query-to-centroid integer distances, joined to the
    * code table and integer-summed (exact, order-free). Distribution:
    * training is iters×(broadcast + two-phase agg) on a sample at real
    * scale; encode is corpus-scan × broadcast(M×K centroids); search
    * shuffles only (q, vec, est) partials; the re-rank reads ≤ pqShort
    * full vectors per query via a semi-join. */
  val pqAnn: GQuery = GQuery(
    "v_pq_ann",
    s"product-quantization ANN: trained ${pqM}x$pqK codebook, integer ADC, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val subIdx = explode(sequence(lit(0), lit(pqM - 1))).as("m")
      val (vecs, codebook) = cachedIdx(spark, s"pq|$dir") {
        // per-subspace training set: (m, id, 4-dim double subvector) —
        // cut once, read per training round + encode + ADC
        val v = e.select(col("vec_id").as("id"), subIdx, col("embedding"))
          .select(col("m"), col("id"),
            expr(s"transform(slice(embedding, m * $pqDsub + 1, $pqDsub)," +
              " x -> CAST(x AS DOUBLE))").as("vec"))
          .localCheckpoint()
        val seed = v.filter(col("id").between(3, 3 + pqK - 1))
          .select(col("m"), (col("id") - 3).cast("int").as("j"),
            col("vec").as("cent"))
        (v, kmeansFit(v, seed, pqIters))
      }
      // corpus codes: nearest trained centroid per (vector, subspace)
      val codes = kmeansAssign(vecs, codebook)
        .select(col("id").as("vec_id"), col("m"), col("j"))
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // ADC table: query-subvector to EVERY centroid (M*K rows per query)
      val qDist = vecs.filter(col("id") < 3)
        .join(broadcast(codebook), Seq("m"))
        .select(col("id").as("q_id"), col("m"), col("j"),
          l2fix6("vec", "cent").as("qd"))
      // estimate = exact integer sum of the M looked-up distances
      val est = codes.join(broadcast(qDist), Seq("m", "j"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd")).as("est"))
      val wS = Window.partitionBy(col("q_id")).orderBy(col("est"), col("vec_id"))
      val shortlist = est.withColumn("srk", row_number().over(wS))
        .filter(col("srk") <= pqShort)
        .select(col("q_id"), col("vec_id").as("n_id"))
      // exact cosine re-rank of the shortlist
      val scored = shortlist
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("n_id"), cosineSimNative("embedding", "q_emb").as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk").cast("int").as("rk"), col("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH ms AS (SELECT CAST(unnest(range(0, $pqM)) AS INTEGER) AS m),
      vecs AS MATERIALIZED (
        SELECT ms.m, e.vec_id AS id,
               list_transform(
                 e.embedding[ms.m * $pqDsub + 1 : ms.m * $pqDsub + $pqDsub],
                 x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings e CROSS JOIN ms),
      seed AS (SELECT m, CAST(id - 3 AS INTEGER) AS j, vec AS cent FROM vecs
               WHERE id BETWEEN 3 AND ${3 + pqK - 1}),
      ${kmeansSqlCtes("vecs", "seed", pqIters, "km")},
      codes AS MATERIALIZED (${kmeansAssignSql("vecs", s"km_c$pqIters")}),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      qdist AS (
        SELECT v.id AS q_id, v.m, c.j, ${l2fix6Sql("v.vec", "c.cent")} AS qd
        FROM vecs v JOIN km_c$pqIters c ON c.m = v.m
        WHERE v.id < 3),
      est AS (
        SELECT qd.q_id, co.id AS vec_id, CAST(SUM(qd.qd) AS BIGINT) AS est
        FROM codes co JOIN qdist qd ON qd.m = co.m AND qd.j = co.j
        WHERE co.id <> qd.q_id
        GROUP BY qd.q_id, co.id),
      shortlist AS (
        SELECT q_id, vec_id AS n_id
        FROM (SELECT q_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY est, vec_id) AS srk
              FROM est) t
        WHERE srk <= $pqShort),
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
  /** The production composition (FAISS's IVF-PQ shape), now FULLY
    * TRAINED: a k-means coarse quantizer ([[kmeansFit]], `ivfK` cells,
    * `ivfIters` rounds) routes a query to `ivfNprobe` cells; within
    * probed cells, distance estimation runs over trained PQ codes of the
    * RESIDUAL (vector − its assigned cell centroid) — residual magnitudes
    * are smaller than raw vectors, so the same codebook budget quantizes
    * finer. The residual codebooks are themselves k-means fits
    * (`ivfIters` rounds, shared across cells as in FAISS). Measured
    * recall@3 vs brute force: 0.889 (DifferentialSpec; the untrained
    * variant measured 0.222 — chance). At 100 TB: both quantizer tables
    * broadcast; the corpus-side scan touches only (cell, 16-byte code)
    * rows of probed cells — memory is codes + one centroid per cell,
    * never raw vectors; full vectors are read ONLY for the
    * `pqShort`-deep exact re-rank. Same exactness discipline as
    * [[pqAnn]]: fix6 integer distances, lexicographic integer argmin,
    * exact integer ADC sums, davg fixed-point means — engine-identical
    * end to end (residual subtraction is per-element IEEE on identical
    * inputs). */
  val ivfPqAnn: GQuery = GQuery(
    "v_ivfpq_ann",
    s"IVF-PQ ANN: $ivfK trained cells, $ivfNprobe probed, trained residual PQ, exact re-rank top-3",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val subIdx = explode(sequence(lit(0), lit(pqM - 1))).as("m")
      val (cells, coarseCells, rvecs, codebook) =
        cachedIdx(spark, s"ivfpq|$dir") {
          // coarse quantizer: trained k-means cells over the full vectors
          val fvecs = e.select(lit(0).as("m"), col("vec_id").as("id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"))
            .localCheckpoint()
          val fseed = fvecs.filter(col("id").between(3, 3 + ivfK - 1))
            .select(col("m"), (col("id") - 3).cast("int").as("j"),
              col("vec").as("cent"))
          val coarse = kmeansFit(fvecs, fseed, ivfIters)
          val cc = coarse.select(col("j").as("cell"), col("cent"))
          val cl = kmeansAssign(fvecs, coarse)
            .select(col("id"), col("j").as("cell"))
            .localCheckpoint() // read by resid AND the final code tagging
          // residuals: vector minus its ASSIGNED cell's centroid
          val resid = fvecs.join(cl, "id")
            .join(broadcast(cc), "cell")
            .select(col("id"), col("cell"),
              expr("zip_with(vec, cent, (x, y) -> x - y)").as("r"))
          // residual codebooks: k-means per subspace over all residuals.
          // rvecs embeds the whole residual pipeline and the second
          // training loop reads it every round — without this cut the
          // residual derivation re-executes dozens of times
          val rv = resid.select(col("id"), subIdx, col("r"))
            .select(col("m"), col("id"),
              expr(s"slice(r, m * $pqDsub + 1, $pqDsub)").as("vec"))
            .localCheckpoint()
          val rseed = rv.filter(col("id").between(3, 3 + pqK - 1))
            .select(col("m"), (col("id") - 3).cast("int").as("j"),
              col("vec").as("cent"))
          (cl, cc, rv, kmeansFit(rv, rseed, ivfIters))
        }
      // encode every corpus residual, tagged with its cell
      val codes = kmeansAssign(rvecs, codebook)
        .join(cells, "id")
        .select(col("id").as("vec_id"), col("cell"), col("m"), col("j"))
      // probe nprobe nearest trained cells per query (integer-L2 ranking)
      val qSet = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cellRank = Window.partitionBy(col("q_id"))
        .orderBy(col("cd"), col("cell"))
      val probed = qSet.crossJoin(broadcast(coarseCells))
        .select(col("q_id"), col("cell"), col("cent"),
          l2fix6("q_emb", "cent").as("cd"))
        .withColumn("cell_rk", row_number().over(cellRank))
        .filter(col("cell_rk") <= ivfNprobe)
        .select(col("q_id"), col("cell"), col("cent"))
      // per probed (query, cell): query residual, then its codebook table
      val qDist = probed.join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("cell"),
          expr("zip_with(q_emb, cent, (x, y) -> CAST(x AS DOUBLE) - y)")
            .as("rq"))
        .select(col("q_id"), col("cell"), subIdx, col("rq"))
        .select(col("q_id"), col("cell"), col("m"),
          expr(s"slice(rq, m * $pqDsub + 1, $pqDsub)").as("qsv"))
        .join(broadcast(codebook), Seq("m"))
        .select(col("q_id"), col("cell"), col("m"), col("j"),
          l2fix6("qsv", "cent").as("qd"))
      // ADC within probed cells only: exact integer sum of looked-up dists
      val est = codes.join(broadcast(qDist), Seq("cell", "m", "j"))
        .filter(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(sum(col("qd")).as("est"))
      val wS = Window.partitionBy(col("q_id")).orderBy(col("est"), col("vec_id"))
      val shortlist = est.withColumn("srk", row_number().over(wS))
        .filter(col("srk") <= pqShort)
        .select(col("q_id"), col("vec_id").as("n_id"))
      val scored = shortlist
        .join(e.select(col("vec_id").as("n_id"), col("embedding")), "n_id")
        .join(broadcast(qSet), "q_id")
        .select(col("q_id"), col("n_id"), cosineSimNative("embedding", "q_emb").as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("q_id"), col("rk").cast("int").as("rk"), col("n_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH ms AS (SELECT CAST(unnest(range(0, $pqM)) AS INTEGER) AS m),
      fvecs AS MATERIALIZED (
        SELECT 0 AS m, vec_id AS id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings),
      fseed AS (SELECT m, CAST(id - 3 AS INTEGER) AS j, vec AS cent FROM fvecs
                WHERE id BETWEEN 3 AND ${3 + ivfK - 1}),
      ${kmeansSqlCtes("fvecs", "fseed", ivfIters, "ck")},
      cells AS MATERIALIZED (
        SELECT id, j AS cell
        FROM (${kmeansAssignSql("fvecs", s"ck_c$ivfIters")}) a),
      resid AS MATERIALIZED (
        SELECT v.id, ce.cell,
               list_transform(list_zip(v.vec, c.cent), x -> x[1] - x[2]) AS r
        FROM fvecs v
        JOIN cells ce ON ce.id = v.id
        JOIN ck_c$ivfIters c ON c.j = ce.cell),
      rvecs AS MATERIALIZED (
        SELECT ms.m, r.id,
               r.r[ms.m * $pqDsub + 1 : ms.m * $pqDsub + $pqDsub] AS vec
        FROM resid r CROSS JOIN ms),
      rseed AS (SELECT m, CAST(id - 3 AS INTEGER) AS j, vec AS cent FROM rvecs
                WHERE id BETWEEN 3 AND ${3 + pqK - 1}),
      ${kmeansSqlCtes("rvecs", "rseed", ivfIters, "pk")},
      codes AS MATERIALIZED (
        SELECT a.id AS vec_id, ce.cell, a.m, a.j
        FROM (${kmeansAssignSql("rvecs", s"pk_c$ivfIters")}) a
        JOIN cells ce ON ce.id = a.id),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      probed AS (
        SELECT q_id, cell, cent FROM (
          SELECT q.q_id, c.j AS cell, c.cent,
                 ROW_NUMBER() OVER (PARTITION BY q.q_id
                   ORDER BY ${l2fix6Sql("q.q_emb", "c.cent")}, c.j) AS cell_rk
          FROM q CROSS JOIN ck_c$ivfIters c) t
        WHERE cell_rk <= $ivfNprobe),
      qres AS (
        SELECT p.q_id, p.cell,
               list_transform(list_zip(q.q_emb, p.cent),
                 x -> CAST(x[1] AS DOUBLE) - x[2]) AS rq
        FROM probed p JOIN q USING (q_id)),
      qdist AS (
        SELECT s.q_id, s.cell, s.m, c.j,
               ${l2fix6Sql("s.qsv", "c.cent")} AS qd
        FROM (SELECT q_id, cell, ms.m,
                     rq[ms.m * $pqDsub + 1 : ms.m * $pqDsub + $pqDsub] AS qsv
              FROM qres CROSS JOIN ms) s
        JOIN pk_c$ivfIters c ON c.m = s.m),
      est AS (
        SELECT qd.q_id, co.vec_id, CAST(SUM(qd.qd) AS BIGINT) AS est
        FROM codes co
        JOIN qdist qd ON qd.cell = co.cell AND qd.m = co.m AND qd.j = co.j
        WHERE co.vec_id <> qd.q_id
        GROUP BY qd.q_id, co.vec_id),
      shortlist AS (
        SELECT q_id, vec_id AS n_id
        FROM (SELECT q_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY est, vec_id) AS srk
              FROM est) t
        WHERE srk <= $pqShort),
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

  // ------------------------------------------------------------ outliers
  /** Per-label embedding outlier audit — the "mislabeled / corrupt vector"
    * filter a curation pipeline runs before trusting embeddings for
    * dedup or selection: distance to the OWN label's centroid, flagged
    * when it exceeds 2× the label's mean distance.
    *
    * Determinism: centroids land on the round-6 grid (same as
    * v_centroids); each squared-deviation term is fix6-quantized BEFORE
    * the per-vector sum, so distances are exact BIGINTs, and the outlier
    * test `dist·n > 2·Σdist` is an integer cross-multiplication — no
    * float boundary anywhere (same discipline as the Gopher ratio
    * rules).
    *
    * Scale shape: one posexplode (scan-parallel), centroid agg output is
    * labels×dims (tiny, broadcast back), per-vector distance is a
    * two-phase integer agg on vec_id, label stats again labels-sized and
    * broadcast. Nothing global, nothing quadratic. */
  val outliers: GQuery = GQuery(
    "v_outliers",
    "per-label centroid-distance outlier audit (2x-mean integer test)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val dims = e.select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("label"), col("pos"),
          col("v").cast("double").as("v"))
      val cent = dims.groupBy(col("label"), col("pos"))
        .agg(rnd6(davg(col("v"))).as("c"))
      val dist = dims.join(broadcast(cent), Seq("label", "pos"))
        .select(col("vec_id"), col("label"),
          fix6((col("v") - col("c")) * (col("v") - col("c"))).as("t6"))
        .groupBy(col("vec_id"), col("label")).agg(sum(col("t6")).as("dist6"))
      val stats = dist.groupBy(col("label"))
        .agg(sum(col("dist6")).as("sum6"), count(lit(1)).as("n"))
      dist.join(broadcast(stats), "label")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("dist6") * col("n") > lit(2L) * col("sum6"), 1L)
            .otherwise(0L)).as("n_outliers"),
          max(col("dist6")).as("m6"), sum(col("dist6")).as("s6"))
        .select(col("label"), col("n_vecs"), col("n_outliers"),
          (col("m6").cast("double") / 1000000.0d).as("max_dist"),
          (expr("s6 div n_vecs").cast("double") / 1000000.0d).as("mean_dist"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH dims AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      cent AS (
        SELECT label, pos, ${rnd6Sql(davgSql("v"))} AS c
        FROM dims GROUP BY label, pos),
      dist AS (
        SELECT vec_id, d.label,
               CAST(SUM(${fix6Sql("(v - c) * (v - c)")}) AS BIGINT) AS dist6
        FROM dims d JOIN cent ON cent.label = d.label AND cent.pos = d.pos
        GROUP BY vec_id, d.label),
      stats AS (
        SELECT label, CAST(SUM(dist6) AS BIGINT) AS sum6, COUNT(*) AS n
        FROM dist GROUP BY label)
      SELECT d.label, COUNT(*) AS n_vecs,
             CAST(SUM(CASE WHEN d.dist6 * s.n > 2 * s.sum6
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
             CAST(MAX(d.dist6) AS DOUBLE) / 1000000.0 AS max_dist,
             CAST(CAST(SUM(d.dist6) AS BIGINT) // COUNT(*) AS DOUBLE)
               / 1000000.0 AS mean_dist
      FROM dist d JOIN stats s ON s.label = d.label
      GROUP BY d.label
      ORDER BY d.label"""))

  // ------------------------------------------------------------ kNN graph
  /** Approximate kNN-GRAPH construction — every vector's top-3
    * neighbors, the input primitive for graph clustering, SemDeDup-style
    * community pruning, and diffusion-based selection. Unlike
    * v_lsh_ann's fixed query set, this is the all-vectors self-join
    * form: candidates are pairs sharing a bucket in ANY of the 16
    * banded LSH tables (cost Σ_tables Σ_buckets |bucket|² — bucket-
    * bounded, never n²; [[bandBits]] widens the band with the corpus so
    * expected |bucket| stays ≤ [[annTargetBucket]] and the self-join is
    * linear at 100 TB), exact cosine re-scores candidates only, and the
    * per-vector top-3 is a LITERAL-limit rank window (WindowGroupLimit
    * fires — no per-partition full sort survives; see the project
    * memory on rank-limit literals). Same scoring fold as v_knn_brute,
    * so sims are bit-identical cross-engine. */
  val knnGraph: GQuery = GQuery(
    "v_knn_graph",
    "approximate kNN graph: per-vector top-3 via banded-LSH self-join",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "embeddings")
      val b = bandedBuckets(spark, e)
      val cand = b.select(col("tbl"), col("bucket"), col("vec_id").as("a_id"))
        .join(b.select(col("tbl"), col("bucket"), col("vec_id").as("b_id")),
          Seq("tbl", "bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id")).distinct()
      val scored = cand
        .join(e.select(col("vec_id").as("a_id"), col("embedding")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("embedding").as("q_emb")),
          "b_id")
        .select(col("a_id"), col("b_id"), cosineSimNative("embedding", "q_emb").as("sim"))
      val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("a_id").as("vec_id"), col("rk"), col("b_id").as("nbr_id"),
          round(col("sim"), 6).as("sim"))
        .orderBy(col("vec_id"), col("rk"))
    },
    Some(s"""
      WITH b AS ($bandedSql),
      cand AS (
        SELECT DISTINCT a.vec_id AS a_id, bb.vec_id AS b_id
        FROM b a JOIN b bb
          ON a.tbl = bb.tbl AND a.bucket = bb.bucket
         AND a.vec_id <> bb.vec_id),
      scored AS (
        SELECT a_id, b_id,
               ${dotSql("ea.embedding", "eb.embedding")} /
               (sqrt(${dotSql("ea.embedding", "ea.embedding")}) *
                sqrt(${dotSql("eb.embedding", "eb.embedding")})) AS sim
        FROM cand
        JOIN embeddings ea ON ea.vec_id = a_id
        JOIN embeddings eb ON eb.vec_id = b_id),
      ranked AS (
        SELECT a_id, b_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY a_id
                 ORDER BY sim DESC, b_id) AS INTEGER) AS rk
        FROM scored)
      SELECT a_id AS vec_id, rk, b_id AS nbr_id, ROUND(sim, 6) AS sim
      FROM ranked WHERE rk <= 3
      ORDER BY vec_id, rk"""))
}

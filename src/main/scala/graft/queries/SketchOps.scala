package graft.queries

import graft.{Catalog, GQuery}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-pass sketch summaries — the cardinality/frequency estimators a
  * 100-TB pipeline runs INSTEAD of exact aggregation when the answer
  * feeds a planner or a monitor rather than a ledger. Both sketches here
  * are audits: they compute the sketch AND the exact answer on the gate
  * fixture so the oracle hash-checks the estimator's arithmetic
  * end-to-end (at production scale only the sketch side would run).
  *
  * Determinism discipline: every hash is the md5-based 60-bit integer
  * hash used across the engine (identical in DuckDB), and every sketch
  * accumulator is INTEGER (HLL's Σ2^(−ρ) is scaled by 2^51 into exact
  * BIGINT arithmetic; CMS cells are plain counts) — so both queries
  * hash-gate bit-exactly despite being "approximate" algorithms: the
  * approximation is in the estimate, never in the evaluation order.
  */
object SketchOps {

  def queries: Seq[GQuery] = Seq(hllDistinct, cmsTopk)

  /** 60-bit md5 hash of a string column — same contract as
    * [[TextOps.h60]] (kept local: that helper is package-private to its
    * file's companion style but duplicated signatures stay tiny). */
  private def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast(LongType)
  private def h60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  // ------------------------------------------------------------ HLL
  private val HllP = 10          // 2^10 = 1024 buckets
  private val HllM = 1 << HllP

  /** HyperLogLog distinct-count audit over order custkeys (Flajolet et
    * al. 2007): bucket = h mod m, ρ = leading-zero rank of the remaining
    * 50 bits, Σ2^(−maxρ) kept EXACT by scaling with 2^51 into BIGINT.
    * Small-range correction (linear counting) applies below 2.5·m.
    *
    * 100-TB shape: per-bucket max is a two-phase aggregate with map-side
    * combine down to ≤ m rows per partition — the sketch is mergeable
    * across any partitioning, which is the whole point; the exact
    * distinct it is audited against here is the expensive thing the
    * sketch replaces in production. */
  val hllDistinct: GQuery = GQuery(
    "x_hll_distinct",
    s"HyperLogLog (m=$HllM) distinct custkeys vs exact, integer-exact accumulators",
    (spark, dir) => {
      val o = Catalog.table(spark, dir, "orders")
      val hashed = o.select(h60(col("o_custkey").cast("string")).as("h"))
        .select((col("h") % HllM).as("bucket"), expr(s"h div $HllM").as("rem"))
      val buckets = hashed
        .select(col("bucket"),
          when(col("rem") === 0, lit(51))
            .otherwise(lit(51) - length(bin(col("rem")))).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("r"))
      val sketch = buckets.agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - r AS INT))")).as("sp"),
        count(lit(1)).as("np"))
      val exact = o.agg(countDistinct(col("o_custkey")).as("n_exact"))
      val alpha = lit(0.7213d) / (lit(1.0d) + lit(1.079d) / lit(HllM.toDouble))
      val s51 = col("sp") + (lit(HllM.toLong) - col("np")) * lit(1L << 51)
      val eRaw = alpha * lit(HllM.toDouble) * lit(HllM.toDouble) *
        lit((1L << 51).toDouble) / col("s51").cast("double")
      val zeros = lit(HllM.toLong) - col("np")
      sketch.select(col("sp"), col("np"), s51.as("s51"))
        .select(col("np"), zeros.as("zeros"), eRaw.as("e_raw"))
        .select(col("np"), col("zeros"),
          when(col("e_raw") <= lit(2.5d * HllM) && col("zeros") > 0,
            lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros").cast("double")))
            .otherwise(col("e_raw")).as("est"))
        .crossJoin(broadcast(exact))
        .select(col("n_exact"), round(col("est"), 6).as("hll_est"),
          round(abs(col("est") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6).as("rel_err"),
          col("np").as("n_buckets_hit"))
    },
    Some(s"""
      WITH h AS (SELECT ${h60Sql("CAST(o_custkey AS VARCHAR)")} AS h FROM orders),
      b AS (SELECT h % $HllM AS bucket, h // $HllM AS rem FROM h),
      r AS (SELECT bucket,
                   MAX(CASE WHEN rem = 0 THEN 51
                            ELSE 51 - length(bin(rem)) END) AS r
            FROM b GROUP BY bucket),
      sk AS (SELECT SUM(1::BIGINT << CAST(51 - r AS INT)) AS sp, COUNT(*) AS np
             FROM r),
      ex AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders),
      est AS (SELECT np, $HllM - np AS zeros,
                     (CAST(0.7213 AS DOUBLE) /
                      (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($HllM AS DOUBLE))) *
                     CAST($HllM AS DOUBLE) * CAST($HllM AS DOUBLE) *
                     CAST(${1L << 51} AS DOUBLE) /
                     CAST(sp + ($HllM - np) * (1::BIGINT << 51) AS DOUBLE) AS e_raw
              FROM sk),
      fin AS (SELECT np, zeros,
                     CASE WHEN e_raw <= CAST(${2.5 * HllM} AS DOUBLE) AND zeros > 0
                          THEN CAST($HllM AS DOUBLE) *
                               ln(CAST($HllM AS DOUBLE) / CAST(zeros AS DOUBLE))
                          ELSE e_raw END AS est
              FROM est)
      SELECT n_exact, ROUND(est, 6) AS hll_est,
             ROUND(ABS(est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6)
               AS rel_err,
             np AS n_buckets_hit
      FROM fin CROSS JOIN ex"""))

  // ------------------------------------------------------------ CMS
  private val CmsD = 4           // hash rows
  // deliberately undersized for the gate fixtures (load factor > 1), so
  // bucket collisions actually occur and the min-over-rows estimator and
  // its positive-bias contract are exercised, not just reproduced
  private val CmsW = 64          // buckets per row

  /** Count-min-sketch frequency audit over event user activity (Cormode
    * & Muthukrishnan 2005): d=$CmsD salted hash rows × w=$CmsW counters,
    * point estimate = min over rows — always ≥ exact. The audit reports
    * the exact top-20 users with their CMS estimate and overcount.
    *
    * 100-TB shape: the sketch table is ≤ d·w cells whatever the corpus
    * (two-phase count with map-side combine); the exact top-20 is the
    * expensive audit-side path. */
  val cmsTopk: GQuery = GQuery(
    "x_cms_topk",
    s"count-min sketch (d=$CmsD, w=$CmsW) estimates vs exact top-20 user counts",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val rows = e.select(col("user_id"),
          explode(expr(s"sequence(0, ${CmsD - 1})")).as("row"))
        .select(col("row"),
          (h60(concat_ws(":", col("row"), col("user_id"))) % CmsW).as("bucket"))
      val cells = rows.groupBy(col("row"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val top = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(20)
      top
        .select(col("user_id"), col("n_exact"),
          explode(expr(s"sequence(0, ${CmsD - 1})")).as("row"))
        .select(col("user_id"), col("n_exact"), col("row"),
          (h60(concat_ws(":", col("row"), col("user_id"))) % CmsW).as("bucket"))
        .join(broadcast(cells), Seq("row", "bucket"))
        .groupBy(col("user_id"), col("n_exact"))
        .agg(min(col("c")).as("cms_est"))
        .select(col("user_id"), col("n_exact"), col("cms_est"),
          (col("cms_est") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("user_id"))
    },
    Some(s"""
      WITH rows_h AS (
        SELECT r AS row,
               ${h60Sql(s"(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))")} % $CmsW AS bucket
        FROM events CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS r) g),
      cells AS (SELECT row, bucket, COUNT(*) AS c
                FROM rows_h GROUP BY row, bucket),
      top AS (SELECT user_id, COUNT(*) AS n_exact
              FROM events GROUP BY user_id
              ORDER BY n_exact DESC, user_id LIMIT 20),
      probes AS (
        SELECT user_id, n_exact, r AS row,
               ${h60Sql(s"(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))")} % $CmsW AS bucket
        FROM top CROSS JOIN (SELECT unnest(range(0, $CmsD)) AS r) g)
      SELECT p.user_id, p.n_exact, MIN(c.c) AS cms_est,
             MIN(c.c) - p.n_exact AS overcount
      FROM probes p JOIN cells c ON p.row = c.row AND p.bucket = c.bucket
      GROUP BY p.user_id, p.n_exact
      ORDER BY n_exact DESC, user_id"""))
}

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

  def queries: Seq[GQuery] = Seq(hllDistinct, cmsTopk, bloomJoin, histoQuantile)

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

  // ------------------------------------------------------------ bloom join
  private val BloomM = 4096      // bits
  private val BloomK = 3         // hash functions
  // deliberately loaded (~0.4 fill at gate scale) so false positives occur
  // and the pass/true/fp accounting is exercised, not just reproduced

  /** Bloom-filter semi-join reduction audit (Bloom 1970) — THE shuffle
    * killer for a selective dim⨝fact join at 100 TB: build a tiny bit-set
    * from the filtered dimension's join keys, broadcast it, and drop
    * non-matching fact rows AT THE SCAN, before they pay the shuffle.
    * Spark injects this automatically under AQE
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this query
    * builds the filter explicitly with engine-portable hashes so the
    * oracle audits the whole contract: every true match passes (no false
    * negatives — the semi-join can only shrink, never break), and the
    * false-positive rate is the predicted (1−e^(−kn/m))^k neighborhood.
    *
    * Shape: the filter is `n_keys·k` DISTINCT positions (≤ m = $BloomM
    * rows) — broadcast, never shuffled; the probe is a per-fact-row
    * k-expansion joined against that broadcast, so fact-side work is one
    * scan with map-side joins only. Audit side (exact semi-join) is the
    * expensive thing the filter replaces.
    *
    * Reference analog: runtime filter pushdown across the distributed
    * boundary (the reference ships plan fragments to workers;
    * a broadcast bit-set is the Spark-native equivalent). */
  val bloomJoin: GQuery = GQuery(
    "x_bloom_join",
    s"bloom-filter (m=$BloomM, k=$BloomK) semi-join prefilter audit: pass/true/fp counts",
    (spark, dir) => {
      val c = Catalog.table(spark, dir, "customer")
      val o = Catalog.table(spark, dir, "orders")
      val dimKeys = c.filter(col("c_mktsegment") === "BUILDING" &&
          col("c_nationkey") < 5)
        .select(col("c_custkey"))
      val positions = dimKeys
        .select(explode(expr(s"sequence(0, ${BloomK - 1})")).as("i"),
          col("c_custkey"))
        .select((h60(concat_ws(":", col("i"), col("c_custkey"))) % BloomM)
          .as("pos"))
        .distinct()
      val probe = o
        .select(col("o_orderkey"), col("o_custkey"),
          explode(expr(s"sequence(0, ${BloomK - 1})")).as("i"))
        .select(col("o_orderkey"),
          (h60(concat_ws(":", col("i"), col("o_custkey"))) % BloomM).as("pos"))
      val nPass = probe.join(broadcast(positions), Seq("pos"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("nhit"))
        .filter(col("nhit") === BloomK)
        .agg(count(lit(1)).as("n_pass"))
      val nTrue = o.join(broadcast(dimKeys),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_true"))
      val nFact = o.agg(count(lit(1)).as("n_fact"))
      nFact.crossJoin(broadcast(nPass)).crossJoin(broadcast(nTrue))
        .select(col("n_fact"), col("n_pass"), col("n_true"),
          (col("n_pass") - col("n_true")).as("n_fp"),
          round((col("n_pass") - col("n_true")).cast("double") /
            (col("n_fact") - col("n_true")).cast("double"), 6).as("fp_rate"))
    },
    Some(s"""
      WITH dim AS (SELECT c_custkey FROM customer
                   WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 5),
      pos AS (SELECT DISTINCT
                ${h60Sql("(CAST(i AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR))")} % $BloomM AS pos
              FROM dim CROSS JOIN (SELECT unnest(range(0, $BloomK)) AS i) g),
      probe AS (SELECT o_orderkey,
                  ${h60Sql("(CAST(i AS VARCHAR) || ':' || CAST(o_custkey AS VARCHAR))")} % $BloomM AS pos
                FROM orders CROSS JOIN (SELECT unnest(range(0, $BloomK)) AS i) g),
      pass AS (SELECT COUNT(*) AS n_pass FROM (
                 SELECT o_orderkey FROM probe JOIN pos USING (pos)
                 GROUP BY o_orderkey HAVING COUNT(*) = $BloomK)),
      tru AS (SELECT COUNT(*) AS n_true FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM dim)),
      fact AS (SELECT COUNT(*) AS n_fact FROM orders)
      SELECT n_fact, n_pass, n_true, n_pass - n_true AS n_fp,
             ROUND(CAST(n_pass - n_true AS DOUBLE) /
                   CAST(n_fact - n_true AS DOUBLE), 6) AS fp_rate
      FROM fact CROSS JOIN pass CROSS JOIN tru"""))

  // ------------------------------------------------------------ histogram quantile
  private val HistB = 256        // equi-width buckets

  /** Mergeable-histogram quantile audit: a fixed $HistB-bucket equi-width
    * histogram over `o_totalprice` (two passes: min/max, then bucket
    * counts — both map-side-combinable to ≤ $HistB rows per partition,
    * mergeable across any partitioning), quantiles read off the
    * cumulative counts by linear interpolation inside the landing
    * bucket. Audited against the EXACT interpolated quantile computed
    * the distributed way — global sort + row_number, interpolating
    * between the two straddling rows with the same (1−f)·lo + f·hi
    * formula on both engines (engine quantile aggregates are avoided:
    * their interpolation arithmetic differs in the last ulp).
    *
    * 100-TB shape: the sketch is what production runs — two scans, ≤
    * $HistB-row state, no sort; the exact side (a full global sort) is
    * the audit-only path. Every arithmetic step is single-rounded
    * IEEE-754 (sub, mul, div, add in a fixed order), so the hash gate
    * passes bit-exactly on both engines. */
  val histoQuantile: GQuery = GQuery(
    "x_histo_quantile",
    s"equi-width histogram (B=$HistB) p50/p90/p99 vs exact interpolated quantiles",
    (spark, dir) => {
      val o = Catalog.table(spark, dir, "orders")
      val v = o.select(col("o_totalprice").as("v"))
      // r14: mm (1 row) and cum (≤ HistB rows) are each read by several
      // consumers below; un-materialized, every broadcast reference
      // re-ran the corpus scan (mm ×4, cum ×2 — ~6 scans per execution).
      val mm = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(lit(1)).as("n"))
        .localCheckpoint()
      val bucketed = v.crossJoin(broadcast(mm))
        .select(least(floor((col("v") - col("mn")) * HistB / (col("mx") - col("mn"))),
          lit(HistB - 1)).cast("int").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy(col("b"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = bucketed.select(col("b"), col("cnt"),
        sum(col("cnt")).over(wCum).as("cum"))
        .localCheckpoint()
      val qs = spark.range(1).select(
        explode(array(lit(0.5d), lit(0.9d), lit(0.99d))).as("q"))
      // histogram estimate: first bucket with cum >= q*n; linear interp inside
      val est = qs.crossJoin(broadcast(mm)).crossJoin(broadcast(cum))
        .filter(col("cum") >= col("q") * col("n"))
        .groupBy(col("q"), col("mn"), col("mx"), col("n"))
        .agg(min(col("b")).as("b0"))
        .join(cum.withColumnRenamed("b", "b0"), Seq("b0"))
        .select(col("q"), col("mn"), col("mx"), col("n"), col("b0"),
          col("cnt"), col("cum"))
        .select(col("q"), col("n"),
          round(col("mn") + (col("b0").cast("double") +
            (col("q") * col("n") - (col("cum") - col("cnt")).cast("double")) /
              col("cnt").cast("double")) *
            ((col("mx") - col("mn")) / HistB), 4).as("histo_est"))
      // exact: global sort + row_number, interpolate at idx = q*(n-1).
      // r14: the sort runs ONCE — the ≤6 straddling ranks are joined out
      // of the ranked frame in one pass and checkpointed; previously the
      // lo_v and hi_v joins each re-ran the full global sort. The inner
      // equality joins see the identical (r, v) rows, so the output is
      // unchanged.
      val wRank = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      val ranked = v.select(col("v"),
        (row_number().over(wRank) - 1).cast("double").as("r"))
      val exactBase = qs.crossJoin(broadcast(mm))
        .select(col("q"), (col("q") * (col("n") - 1)).as("idx"))
        .select(col("q"), floor(col("idx")).as("lo_r"), col("idx"))
      val wanted = exactBase.select(col("lo_r").as("rw"))
        .union(exactBase.select((col("lo_r") +
          when(col("idx") > col("lo_r"), 1).otherwise(0)).as("rw")))
        .distinct()
      val rankedSmall = ranked.join(broadcast(wanted), col("r") === col("rw"))
        .select(col("v"), col("r"))
        .localCheckpoint()
      val exact = exactBase
        .join(rankedSmall.withColumnRenamed("v", "lo_v"),
          col("lo_r") === col("r")).drop("r")
        .join(rankedSmall.withColumnRenamed("v", "hi_v"),
          col("lo_r") +
            when(col("idx") > col("lo_r"), 1).otherwise(0) === col("r"))
        .select(col("q"),
          round(col("lo_v") * (lit(1.0d) - (col("idx") - col("lo_r"))) +
            col("hi_v") * (col("idx") - col("lo_r")), 4).as("exact_q"))
      est.join(exact, Seq("q"))
        .select(col("q"), col("histo_est"), col("exact_q"),
          round(col("histo_est") - col("exact_q"), 4).as("err"))
        .orderBy(col("q"))
    },
    Some(s"""
      WITH v AS (SELECT o_totalprice AS v FROM orders),
      mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx, COUNT(*) AS n FROM v),
      bucketed AS (SELECT CAST(LEAST(FLOOR((v - mn) * $HistB / (mx - mn)),
                                     $HistB - 1) AS INT) AS b, COUNT(*) AS cnt
                   FROM v CROSS JOIN mm GROUP BY 1),
      cum AS (SELECT b, cnt, SUM(cnt) OVER (ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM bucketed),
      qs AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
      b0 AS (SELECT q, mn, mx, n, MIN(b) AS b0
             FROM qs CROSS JOIN mm JOIN cum ON cum >= q * n
             GROUP BY q, mn, mx, n),
      est AS (SELECT q, n,
                ROUND(mn + (CAST(b0 AS DOUBLE) +
                  (q * n - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)) *
                  ((mx - mn) / $HistB), 4) AS histo_est
              FROM b0 JOIN cum ON cum.b = b0.b0),
      ranked AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS DOUBLE) AS r
                 FROM v),
      idxs AS (SELECT q, q * (n - 1) AS idx, FLOOR(q * (n - 1)) AS lo_r
               FROM qs CROSS JOIN mm),
      exact AS (SELECT i.q,
                  ROUND(lo.v * (1.0 - (i.idx - i.lo_r)) +
                        hi.v * (i.idx - i.lo_r), 4) AS exact_q
                FROM idxs i
                JOIN ranked lo ON lo.r = i.lo_r
                JOIN ranked hi ON hi.r = i.lo_r +
                  (CASE WHEN i.idx > i.lo_r THEN 1 ELSE 0 END))
      SELECT e.q, e.histo_est, x.exact_q,
             ROUND(e.histo_est - x.exact_q, 4) AS err
      FROM est e JOIN exact x ON e.q = x.q
      ORDER BY e.q"""))
}

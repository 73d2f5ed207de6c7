package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Cross-engine deterministic numeric aggregation.
  *
  * The differential oracle (DuckDB, per the driver's t2 gate; SURVEY.md §5.1)
  * hash-compares result values. Per-row double arithmetic is IEEE-754 and
  * bit-identical across engines, but a plain `SUM(double)` is
  * order-dependent, and shuffle/partition order differs between Spark and any
  * oracle — a one-ulp drift fails a hash compare. The fix is to make the
  * *aggregation* exact: round each per-row double to a fixed decimal scale
  * (deterministic), sum in fixed-point (exact, associative, order-free), and
  * cast the final value back to double (deterministic). Identical per-row
  * values + exact summation ⇒ identical results on any engine, any partition
  * count, any row order — which is also precisely the property that makes
  * results stable between a 32-thread local run and a 1000-executor cluster.
  *
  * SQL mirror used in oracle text (keep in lockstep with dsumSql below):
  *   dsum(x) = CAST(CAST(SUM(CAST(FLOOR(x*1e6 + 0.5) AS BIGINT)) AS BIGINT)
  *             AS DOUBLE) / 1e6
  *   davg(x) = dsum(x) / COUNT(x)
  */
object Num {

  /** Per-row quantization: 6 fractional decimal digits, as a scaled BIGINT.
    * `floor(x*1e6 + 0.5)` is pure double arithmetic + floor — bit-identical
    * in any IEEE-754 engine (no decimal rescale, whose tie/truncation rules
    * differ: Spark HALF_UPs, DuckDB truncates). */
  def fix6(e: Column): Column = floor(e * 1000000.0d + 0.5d).cast(LongType)
  def fix6Sql(expr: String): String =
    s"CAST(FLOOR(($expr) * 1000000 + 0.5) AS BIGINT)"

  /** Order-independent double sum: exact scaled-integer accumulation, then
    * int->double (correctly rounded in both engines) and one exact-operand
    * division. Identical on any engine, any partition count, any row order
    * — which is also what keeps results stable between local[32] and a
    * 1000-executor cluster. */
  def dsum(e: Column): Column =
    (sum(fix6(e)).cast(DoubleType) / 1000000.0d)

  /** Order-independent double mean: deterministic sum / count. */
  def davg(e: Column): Column = dsum(e) / count(e)

  /** Deterministic double → DECIMAL(15,2) ingest: quantize in pure IEEE-754
    * first (`floor(x*100+0.5)/100.0` — bit-identical in any engine), so the
    * double handed to the decimal cast is within half an ulp of an exact
    * 2-decimal value and never near a rounding tie. Spark's HALF_UP and
    * DuckDB's tie rule then agree on every row. */
  def dec2(e: Column): Column =
    (floor(e * 100.0d + 0.5d) / 100.0d).cast(org.apache.spark.sql.types.DecimalType(15, 2))
  def dec2Sql(expr: String): String =
    s"CAST(FLOOR(($expr) * 100 + 0.5) / 100.0 AS DECIMAL(15,2))"

  /** Deterministic 6-decimal display rounding of an already-deterministic
    * double: floor(x*1e6+0.5)/1e6 — pure IEEE-754 ops, bit-identical in
    * any engine. NOT round(x, 6): Spark's round (BigDecimal HALF_UP over
    * the double's shortest decimal repr) and DuckDB's ROUND disagree on
    * exact .5 ties, and a fixed-point mean (davg = integer sum / count)
    * lands on exact ties STRUCTURALLY whenever the count divides the
    * scaled sum midway — found at sf0.1 (round 10): v_centroids label 9
    * pos 7 is 616992/192 = 3213.5 µunits, Spark 0.003213 vs DuckDB
    * 0.003214. Every rounded davg/derived-mean output uses this pair;
    * round() stays only over values that cannot structurally tie
    * (dsum alone is already an exact µ-grid point, cosine sims are
    * quotients of irrational-scale dot products). */
  def rnd6(e: Column): Column = floor(e * 1000000.0d + 0.5d) / 1000000.0d
  def rnd6Sql(expr: String): String =
    s"(FLOOR(($expr) * 1000000 + 0.5) / 1000000.0)"

  /** SQL fragments for oracle text — keep in lockstep with the above.
    * DuckDB SUM(BIGINT) yields HUGEINT; the BIGINT cast keeps the
    * int->double step identical to Spark's long sum. */
  def dsumSql(expr: String): String =
    s"(CAST(CAST(SUM(${fix6Sql(expr)}) AS BIGINT) AS DOUBLE) / 1000000.0)"
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"
}

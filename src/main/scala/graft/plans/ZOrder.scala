package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * min-max pruning, the lakehouse answer to "my scans filter on TWO
  * columns but a sort key can only serve one". Interleaving the bits of
  * both dimensions makes any contiguous z-range a bounded box in
  * (x, y) space, so files/row groups written in z order carry tight
  * min-max footer statistics on BOTH columns and the ordinary parquet
  * predicate pushdown skips them — no index structure, no custom
  * reader, just row order (ZOrderSpec measures the skip on real files
  * via `inputMetrics.recordsRead`).
  *
  * The interleave is plain integer arithmetic (shift/and/add), so it is
  * codegen-friendly in Spark, expressible verbatim in any SQL engine
  * (the x_zorder oracle mirrors it in DuckDB), and exact — no UDF, no
  * float. Dimensions should be bucketed to COMPARABLE bit widths
  * before interleaving: if one dimension dwarfs the other, the top z
  * bits are all wide-dimension and a z-range constrains only it (the
  * same reason a plain sort fails).
  *
  * At 100 TB the write becomes `repartitionByRange` on z (one range
  * shuffle, the same cost as any sorted write) and the benefit scales
  * WITH file count: more files → tighter per-file boxes → more skips.
  */
object ZOrder {

  /** Bit-interleaved z-value of two column EXPRESSIONS (SQL strings),
    * `bits` bits each, as one codegen'd integer expression. Values are
    * masked to `bits` (callers bucket/mod first so the mask loses
    * nothing). Bit b of x lands at z bit 2b, bit b of y at 2b+1. */
  def zExpr(x: String, y: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { b =>
      Seq(s"shiftleft(shiftright(($x) & $mask, $b) & 1, ${2 * b})",
        s"shiftleft(shiftright(($y) & $mask, $b) & 1, ${2 * b + 1})")
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  /** DuckDB mirror of [[zExpr]] — keep in lockstep. */
  def zExprSql(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    (0 until bits).flatMap { b =>
      Seq(s"(((($x) & $mask) >> $b) & 1) * ${1L << (2 * b)}",
        s"(((($y) & $mask) >> $b) & 1) * ${1L << (2 * b + 1)}")
    }.mkString("(", " + ", ")")
  }

  /** Write `df` to parquet clustered by the z-value of (x, y): one
    * range shuffle on z into `nFiles` range-contiguous files, rows
    * z-sorted within each. The `_z` clustering column is dropped before
    * the write — the LAYOUT is the index; footer min-max stats on the
    * ORIGINAL columns do the pruning at read time. */
  def writeZOrdered(df: DataFrame, x: String, y: String, bits: Int,
      nFiles: Int, path: String): Unit =
    df.withColumn("_z", zExpr(x, y, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}

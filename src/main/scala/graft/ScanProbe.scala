package graft

import org.apache.spark.sql.functions._

/** Raw parquet-reader microbench (r12 verdict item 4): isolate the scan
  * constant-factor behind the "scan-bound" verdicts on q03/q05/q09 by
  * timing DECODE-ONLY work — a min/max aggregate over every column (full)
  * and over a q03-shaped projection (proj) — on the big TPC-H tables,
  * for comparison against DuckDB running the IDENTICAL SQL on the same
  * files (tools/scan_anchor.py). min/max over each column forces full
  * column decode in both engines while keeping the output a single row,
  * so neither result materialization nor shuffle enters the timing; the
  * remaining gap is reader + aggregate-loop constant factor.
  *
  * usage: ScanProbe <sfDir> [iters]
  * prints one line per (table, variant): name, min ms, rows.
  */
object ScanProbe {
  // q03-shaped projections: the columns its scans actually read
  private val proj: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
    "customer" -> Seq("c_custkey", "c_mktsegment"))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScanProbe <sfDir> [iters]")
    val dir = args(0)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    for (t <- Seq("lineitem", "orders", "customer")) {
      val df = Catalog.table(spark, dir, t)
      val rows = df.count()
      for ((variant, cols) <- Seq("full" -> df.columns.toSeq, "proj" -> proj(t))) {
        val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
        val probe = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        probe.collect() // warm: codegen + JIT + page cache
        val ms = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          probe.collect()
          (System.nanoTime() - t0) / 1e6
        }.min
        val line = f"[scanprobe] $t%-9s $variant%-4s cols=${cols.size}%2d rows=$rows%9d min_ms=$ms%8.1f"
        println(line)
        results += line
      }
    }
    println("[scanprobe] ==== summary ====")
    results.foreach(println)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.types._

/** Data-format converter CLI — parity with the reference's tbl→parquet/csv
  * tool (reference: benchmarks/src/tpch/convert.rs:49-160 — '|'-delimited
  * .tbl input with declared schema, output format + compression + explicit
  * output-partition count).
  *
  * usage: Convert <inPath> <outPath> <table> <format:parquet|csv>
  *                [compression] [nPartitions]
  */
object Convert {

  /** Declared TPC-H-ish schemas for headerless delimited input (≡
    * benchmarks/src/tpch/mod.rs:41-141). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType), StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType), StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))))

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Convert <inPath> <outPath> <table> <parquet|csv> [compression] [nParts]")
    val Array(inPath, outPath, table, format) = args.take(4)
    val compression = if (args.length > 4) args(4) else "zstd"
    val nParts = if (args.length > 5) args(5).toInt else 0
    val spark = GraftSession.get()
    val schema = schemas.getOrElse(table,
      throw new IllegalArgumentException(s"unknown table $table"))
    val df0 = spark.read
      .option("delimiter", "|").option("header", "false")
      .schema(schema).csv(inPath)
    val df = if (nParts > 0) df0.repartition(nParts) else df0
    format match {
      case "parquet" =>
        df.write.mode("overwrite").option("compression", compression).parquet(outPath)
      case "csv" =>
        df.write.mode("overwrite").option("delimiter", "|").csv(outPath)
      case "json" =>
        // JSON-lines sink: splittable text, one object per line — the
        // interchange format for downstream training-data tooling
        df.write.mode("overwrite").option("compression", compression).json(outPath)
      case "orc" =>
        df.write.mode("overwrite").option("compression",
          // orc names zstd/zlib differently from parquet's zstd/gzip
          if (compression == "gzip") "zlib" else compression).orc(outPath)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }
    spark.stop()
  }
}

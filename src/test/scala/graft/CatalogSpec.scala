package graft

import graft.plans.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink + skew-mitigation specs (SURVEY §2b scans/sources/sinks). */
class CatalogSpec extends SparkSpec {

  test("declared-schema '|'-CSV registration round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.tbl"),
      "0|ALPHA|10.5\n1|BETA|20.25\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val df = Catalog.registerCsv(spark, "csv_t", s"$dir/data.tbl", schema)
    assert(spark.table("csv_t").count() === 2)
    assert(df.filter(col("name") === "BETA").head.getDouble(2) === 20.25)
  }

  test("events.ts normalizes to epoch-ns BIGINT under every fixture flavor") {
    // Fixture regenerations have silently flipped events.ts between parquet
    // TIMESTAMP(NANOS) and naive timestamp[us]; this pins Catalog.table's
    // contract — ts is ALWAYS a BIGINT of epoch-nanos with the wall clock
    // read as UTC — under all three physical flavors, so the next silent
    // regeneration reds this one test, not fifteen queries.
    val wallMicros = 1704067798778549L // 2024-01-01 00:09:58.778549 UTC
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString

    def writeEvents(sub: String, tsType: DataType, tsVal: Any): String = {
      val d = s"$dir/$sub"
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", tsType)))
      val row = org.apache.spark.sql.Row(1L, tsVal)
      spark.createDataFrame(
        java.util.Arrays.asList(row), schema)
        .write.parquet(s"$d/events.parquet")
      d
    }

    // flavor 1: INT64 epoch-ns (what the nanos fixture reads as behind the
    // legacy flag, and what ScaleUp replicas physically carry)
    val dLong = writeEvents("long", LongType, wallMicros * 1000L)
    // flavor 2: naive micros (TIMESTAMP_NTZ) — the current driver fixture
    val dNtz = writeEvents("ntz", TimestampNTZType,
      java.time.LocalDateTime.ofEpochSecond(
        wallMicros / 1000000L, (wallMicros % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))
    // flavor 3: instant micros (TIMESTAMP) — isAdjustedToUTC=true
    val dTz = writeEvents("tz", TimestampType,
      java.time.Instant.ofEpochSecond(
        wallMicros / 1000000L, (wallMicros % 1000000L) * 1000L))

    for (d <- Seq(dLong, dNtz, dTz)) {
      val e = Catalog.table(spark, d, "events")
      assert(e.schema("ts").dataType === LongType,
        s"flavor $d must normalize ts to BIGINT")
      assert(e.select(col("ts")).head.getLong(0) === wallMicros * 1000L,
        s"flavor $d must read the wall clock as the UTC instant")
    }
  }

  test("memtable preload caches and registers") {
    val df = Catalog.cacheTable(spark, sf0001, "region")
    assert(df.storageLevel.useMemory, "cacheTable should persist in memory")
    assert(spark.table("region").count() === 5)
    df.unpersist()
  }

  test("parquet sink honors compression codec and partition count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    Catalog.table(spark, sf0001, "nation")
      .repartition(3)
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$dir/out")
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length === 3)
    assert(files.forall(_.getName.contains("zstd")))
    assert(spark.read.parquet(s"$dir/out").count() === 25)
  }

  test("parquet sink round-trips every reference compression codec") {
    // the reference's convert tool accepts zstd/snappy/gzip/lz4/brotli
    // (reference: benchmarks/src/tpch/convert.rs:128-139); brotli needs a
    // native codec jar Spark doesn't ship, so the JVM-available four are
    // exercised and brotli's absence is pinned as the expected failure
    val dir = java.nio.file.Files.createTempDirectory("graft-codec").toString
    val src = Catalog.table(spark, sf0001, "nation")
    val expected = src.orderBy("n_nationkey").collect().toSeq
    Seq("zstd", "snappy", "gzip", "lz4").foreach { codec =>
      src.coalesce(1).write.mode("overwrite")
        .option("compression", codec).parquet(s"$dir/$codec")
      // file-name markers: gzip → .gz., lz4 → .lz4hadoop. (Spark 4 default)
      val ext = Map("gzip" -> "gz", "lz4" -> "lz4hadoop").getOrElse(codec, codec)
      val files = new java.io.File(s"$dir/$codec").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty && files.forall(_.getName.contains(s".$ext.")),
        s"$codec not reflected in file names: ${files.map(_.getName).toSeq}")
      val back = spark.read.parquet(s"$dir/$codec")
        .orderBy("n_nationkey").collect().toSeq
      assert(back === expected, s"$codec round-trip altered rows")
    }
  }

  test("JSON-lines source registers with declared schema and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val src = Catalog.table(spark, sf0001, "nation")
    src.write.mode("overwrite").json(s"$dir/out")
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val back = Catalog.registerJson(spark, "json_nation", s"$dir/out", schema)
    assert(back.schema.fieldNames.toSeq === schema.fieldNames.toSeq,
      "declared schema must drive the read — no inference pass")
    assert(spark.table("json_nation").orderBy("n_nationkey")
      .select("n_nationkey", "n_name").collect().toSeq ===
      src.orderBy("n_nationkey").select("n_nationkey", "n_name").collect().toSeq)
    // a column missing from the data reads as null, not an error
    val widened = schema.add(StructField("extra", StringType))
    val w = spark.read.schema(widened).json(s"$dir/out")
    assert(w.filter(col("extra").isNotNull).count() === 0)
  }

  test("parquet mergeSchema reads a multi-generation directory with null-fill") {
    // the on-disk twin of x_union_by_name: one directory, two file
    // generations with drifted schemas (column added + reordered)
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val n = Catalog.table(spark, sf0001, "nation")
    n.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$dir/gen")
    n.select(col("n_regionkey"), col("n_name"),
        (col("n_nationkey") + 100).as("n_nationkey"))
      .write.mode("append").parquet(s"$dir/gen")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/gen")
    assert(merged.schema.fieldNames.toSet ===
      Set("n_nationkey", "n_name", "n_regionkey"),
      "merged footer schema must be the by-name union")
    assert(merged.count() === n.count() * 2)
    // generation-0 rows null-fill the column they never wrote
    assert(merged.filter(col("n_regionkey").isNull).count() === n.count())
    // and by-name binding: no value ever lands in the wrong column
    assert(merged.filter(col("n_nationkey") >= 100).count() === n.count())
  }

  test("ORC source/sink round-trips with compression") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Catalog.table(spark, sf0001, "nation")
    src.write.mode("overwrite").option("compression", "zstd").orc(s"$dir/out")
    val back = Catalog.registerOrc(spark, "orc_nation", s"$dir/out")
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
    // predicate pushdown reaches the ORC scan like parquet's
    val plan = spark.table("orc_nation").filter(col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_nationkey"),
      s"ORC scan should carry pushed filters:\n$plan")
  }

  test("salted join matches plain join exactly") {
    val l = Catalog.table(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Catalog.table(spark, sf0001, "orders").select("o_orderkey", "o_orderstatus")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey", nSalts = 8)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted === plain)
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val l = Catalog.table(spark, sf0001, "lineitem")
    // saltedSum accumulates doubles in Num.fix6 fixed-point, so it must
    // EXACTLY equal the order-independent dsum form regardless of salt
    // placement — that is the property the fixed-point path buys.
    val direct = l.groupBy(col("l_returnflag"))
      .agg(graft.util.Num.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val salted = Skew.saltedSum(l, "l_returnflag", "l_quantity", nSalts = 16)
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted === direct)
    // and it stays within quantization tolerance of the raw double sum
    val raw = l.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s")).orderBy(col("l_returnflag"))
      .collect().map(r => r.getDouble(1)).toSeq
    salted.map(_._2).zip(raw).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-5, s"fixed-point drifted: $a vs $b")
    }
  }
}

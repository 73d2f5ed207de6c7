package graft.tpch

import graft.{Catalog, GraftSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Migration adapter: presents the driver's synthetic star schema under
  * the REFERENCE's exact TPC-H schema (reference:
  * benchmarks/src/tpch/mod.rs:48-141 — all 8 tables incl. `partsupp`,
  * comment/address/phone columns, Decimal(15,2) money, Date32 dates), so
  * that the reference's own query files (`testdata/tpch/queries/q*.sql`)
  * run VERBATIM through this engine — the "switch engines without
  * rewriting your queries" proof.
  *
  * Missing columns are synthesized deterministically from keys, with
  * value domains chosen to match the constants the TPC-H corpus filters
  * on (Brand#NM, container sizes, ship modes, type triples, color
  * names). `partsupp` is derived from the distinct (partkey, suppkey)
  * pairs actually present in lineitem — preserving the TPC-H invariant
  * that every lineitem pair exists in partsupp — plus per-part fill
  * rows. Facts are registered as the union of the raw data and a
  * 3-years-shifted copy (offset keys) so the corpus' 1993-1995 date
  * windows select real rows against this 1996-1998 dataset.
  */
object TpchAdapter {

  private val money = DecimalType(15, 2)

  private def syn(mod: Int, pick: Seq[String], k: org.apache.spark.sql.Column) =
    array(pick.map(lit): _*)(pmod(k, lit(mod)).cast("int"))

  /** Register all 8 reference-schema tables as temp views. */
  def registerReferenceSchema(spark: SparkSession, sfDir: String): Unit = {
    val colors = Seq("almond", "antique", "aquamarine", "azure", "beige",
      "bisque", "black", "blanched", "blue", "blush", "brown", "burlywood",
      "burnished", "chartreuse", "chiffon", "chocolate", "coral", "forest",
      "frosted", "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
      "hot", "hotpink", "indian", "ivory", "khaki", "lace", "lavender")
    val types1 = Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    val types2 = Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    val types3 = Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
    val cont1 = Seq("SM", "MED", "LG", "JUMBO", "WRAP")
    val cont2 = Seq("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
    val modes = Seq("REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB")
    val instr = Seq("DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN")
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD")
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

    Catalog.table(spark, sfDir, "region")
      .select(col("r_regionkey").cast("long").as("r_regionkey"), col("r_name"),
        concat(lit("region comment "), col("r_regionkey")).as("r_comment"))
      .createOrReplaceTempView("region")

    Catalog.table(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"),
        col("n_regionkey").cast("long").as("n_regionkey"),
        concat(lit("nation comment "), col("n_nationkey")).as("n_comment"))
      .createOrReplaceTempView("nation")

    Catalog.table(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_name"),
        concat(lit("addr "), col("s_suppkey")).as("s_address"),
        col("s_nationkey").cast("long").as("s_nationkey"),
        format_string("%02d-555-%07d", pmod(col("s_suppkey"), lit(25)) + 10,
          col("s_suppkey")).as("s_phone"),
        col("s_acctbal").cast(money).as("s_acctbal"),
        // q16 filters suppliers with comments like '%Customer%Complaints%'
        when(pmod(col("s_suppkey"), lit(20)) === 0,
          lit("sly Customer bold Complaints")).otherwise(
          concat(lit("supplier comment "), col("s_suppkey"))).as("s_comment"))
      .createOrReplaceTempView("supplier")

    val part = Catalog.table(spark, sfDir, "part")
    part.select(col("p_partkey"),
        concat_ws(" ",
          syn(colors.size, colors, col("p_partkey")),
          syn(colors.size, colors, col("p_partkey") + 7),
          syn(colors.size, colors, col("p_partkey") + 13)).as("p_name"),
        concat(lit("Manufacturer#"), (pmod(col("p_partkey"), lit(5)) + 1)).as("p_mfgr"),
        concat(lit("Brand#"), (pmod(col("p_partkey"), lit(5)) + 1),
          (pmod(expr("p_partkey div 5"), lit(5)) + 1)).as("p_brand"),
        concat_ws(" ",
          syn(types1.size, types1, col("p_partkey")),
          syn(types2.size, types2, col("p_partkey") + 3),
          syn(types3.size, types3, col("p_partkey") + 1)).as("p_type"),
        col("p_size"),
        concat_ws(" ",
          syn(cont1.size, cont1, col("p_partkey") + 2),
          syn(cont2.size, cont2, col("p_partkey") + 5)).as("p_container"),
        col("p_retailprice").cast(money).as("p_retailprice"),
        concat(lit("part comment "), col("p_partkey")).as("p_comment"))
      .createOrReplaceTempView("part")

    Catalog.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"),
        concat(lit("addr "), col("c_custkey")).as("c_address"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        format_string("%02d-555-%07d", pmod(col("c_custkey"), lit(25)) + 10,
          col("c_custkey")).as("c_phone"),
        col("c_acctbal").cast(money).as("c_acctbal"),
        col("c_mktsegment"),
        concat(lit("customer comment "), col("c_custkey")).as("c_comment"))
      .createOrReplaceTempView("customer")

    // facts: raw 1996-1998 data UNION a 3-years-shifted copy with offset
    // keys, so 1993-1995 corpus windows also select rows
    val o0 = Catalog.table(spark, sfDir, "orders")
    val keyOff = 1000000000L
    def ordersView(shift: Boolean) = {
      val base = if (shift)
        o0.withColumn("o_orderkey", col("o_orderkey") + keyOff)
          .withColumn("o_orderdate", add_months(col("o_orderdate"), -36))
      else o0
      base.select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast(money).as("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"),
        concat(lit("Clerk#"), pmod(col("o_orderkey"), lit(1000))).as("o_clerk"),
        lit(0).as("o_shippriority"),
        concat(lit("order comment "), col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(19)) === 0, lit(" special requests"))
            .otherwise(lit(""))).as("o_comment"))
    }
    ordersView(false).union(ordersView(true)).createOrReplaceTempView("orders")

    val l0 = Catalog.table(spark, sfDir, "lineitem")
    def lineitemView(shift: Boolean) = {
      val base = if (shift)
        l0.withColumn("l_orderkey", col("l_orderkey") + keyOff)
          .withColumn("l_shipdate", add_months(col("l_shipdate"), -36))
      else l0
      base.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        col("l_quantity").cast(money).as("l_quantity"),
        col("l_extendedprice").cast(money).as("l_extendedprice"),
        col("l_discount").cast(money).as("l_discount"),
        col("l_tax").cast(money).as("l_tax"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").as("l_shipdate"),
        date_add(col("l_shipdate").cast("date"),
          (pmod(col("l_orderkey") + col("l_linenumber"), lit(30)) - 10).cast("int"))
          .as("l_commitdate"),
        date_add(col("l_shipdate").cast("date"),
          (pmod(col("l_orderkey") * 3 + col("l_linenumber"), lit(30)) + 1).cast("int"))
          .as("l_receiptdate"),
        syn(instr.size, instr, col("l_orderkey") + col("l_linenumber")).as("l_shipinstruct"),
        syn(modes.size, modes, col("l_orderkey") * 7 + col("l_linenumber")).as("l_shipmode"),
        concat(lit("line comment "), col("l_orderkey")).as("l_comment"))
    }
    lineitemView(false).union(lineitemView(true)).createOrReplaceTempView("lineitem")

    // partsupp: every (partkey, suppkey) pair present in lineitem (TPC-H
    // invariant) — availqty/supplycost derived deterministically
    l0.select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .select(col("ps_partkey"), col("ps_suppkey"),
        (pmod(col("ps_partkey") * 31 + col("ps_suppkey") * 7, lit(9999)) + 1)
          .cast("int").as("ps_availqty"),
        (pmod(col("ps_partkey") * 13 + col("ps_suppkey") * 5, lit(99900)) / 100 + 1)
          .cast(money).as("ps_supplycost"),
        concat(lit("ps comment "), col("ps_partkey")).as("ps_comment"))
      .createOrReplaceTempView("partsupp")
  }

  /** Read a reference query file (1-22) and run it verbatim (multi-
    * statement aware — q15 is create-view/select/drop-view). The single
    * adaptation: `CREATE VIEW` becomes `CREATE TEMPORARY VIEW`, because
    * the adapter's tables are temp views and Spark (correctly) refuses a
    * persistent view over temporary objects — scratch-session DDL in the
    * reference maps to temp DDL here. */
  def runReferenceQuery(spark: SparkSession, queriesDir: String, n: Int): DataFrame = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$queriesDir/q$n.sql")))
    GraftSql.runScript(spark,
      raw.replaceAll("(?i)create\\s+view", "CREATE TEMPORARY VIEW"))
  }
}

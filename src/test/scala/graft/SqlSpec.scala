package graft

import graft.plans.Partitioning
import org.apache.spark.sql.functions._

/** SQL script entry path + explicit partitioning control. */
class SqlSpec extends SparkSpec {

  test("splitStatements is quote-aware") {
    assert(GraftSql.splitStatements("SELECT 1; SELECT 2;") ===
      Seq("SELECT 1", "SELECT 2"))
    assert(GraftSql.splitStatements("SELECT 'a;b'; SELECT ';'") ===
      Seq("SELECT 'a;b'", "SELECT ';'"))
    assert(GraftSql.splitStatements("SELECT 'it''s; fine'; SELECT 3") ===
      Seq("SELECT 'it''s; fine'", "SELECT 3"))
  }

  test("splitStatements is comment-aware (';' in comments does not split)") {
    assert(GraftSql.splitStatements("SELECT 1 -- no; split here\n; SELECT 2") ===
      Seq("SELECT 1 -- no; split here", "SELECT 2"))
    assert(GraftSql.splitStatements("SELECT /* a; b */ 1; SELECT 2") ===
      Seq("SELECT /* a; b */ 1", "SELECT 2"))
    assert(GraftSql.splitStatements("SELECT /* x /* ner;ted */ y; */ 1; SELECT 2") ===
      Seq("SELECT /* x /* ner;ted */ y; */ 1", "SELECT 2"))
    // a quoted '--' is NOT a comment; a commented quote does not open a string
    assert(GraftSql.splitStatements("SELECT '--'; SELECT 2") ===
      Seq("SELECT '--'", "SELECT 2"))
    assert(GraftSql.splitStatements("SELECT 1 -- don't\n; SELECT 2") ===
      Seq("SELECT 1 -- don't", "SELECT 2"))
    // comment-only segments are dropped, not fed to the parser
    assert(GraftSql.splitStatements("SELECT 1;\n-- done") === Seq("SELECT 1"))
    assert(GraftSql.splitStatements("/* header */; SELECT 1; /* trailer */") ===
      Seq("SELECT 1"))
    // and a commented script still runs end-to-end through Spark
    val out = GraftSql.runScript(spark,
      "-- header comment; with semicolon\nSELECT 1 AS a; SELECT 2 AS b /* tail; */")
    assert(out.head.getInt(0) === 2)
    assert(GraftSql.runScript(spark, "SELECT 3 AS c;\n-- done").head.getInt(0) === 3)
  }

  test("q15-style 3-statement view flow runs end-to-end") {
    Catalog.registerAll(spark, sf0001)
    val script = """
      CREATE OR REPLACE TEMP VIEW rev_t AS
        SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey;
      SELECT s_suppkey, n FROM supplier JOIN rev_t ON s_suppkey = l_suppkey
        WHERE n = (SELECT MAX(n) FROM rev_t) ORDER BY s_suppkey;
      DROP VIEW rev_t"""
    val out = GraftSql.runScript(spark, script).collect()
    assert(out.nonEmpty)
    assert(intercept[Exception](spark.table("rev_t")).getMessage.contains("rev_t"))
  }

  test("CTAS + INSERT INTO flow through the script path (DDL/DML surface)") {
    // the warehouse write path: CREATE TABLE AS SELECT materializes a
    // parquet-backed managed table, INSERT INTO appends — both through
    // the same multi-statement script entry as the query path
    Catalog.registerAll(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS ctas_nation")
    val script = """
      CREATE TABLE ctas_nation USING parquet AS
        SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 10;
      INSERT INTO ctas_nation
        SELECT n_nationkey, n_name FROM nation WHERE n_nationkey >= 10;
      SELECT COUNT(*) AS n FROM ctas_nation"""
    val out = GraftSql.runScript(spark, script).head.getLong(0)
    assert(out === Catalog.table(spark, sf0001, "nation").count())
    // appended rows are readable with full fidelity, not just countable
    assert(spark.table("ctas_nation").orderBy("n_nationkey")
      .collect().map(_.getString(1)).toSeq ===
      Catalog.table(spark, sf0001, "nation").orderBy("n_nationkey")
        .collect().map(r => r.getString(r.fieldIndex("n_name"))).toSeq)
    spark.sql("DROP TABLE ctas_nation")
  }

  test("ANSI substring(x FROM i FOR n) syntax parses (SURVEY risk item)") {
    val r = spark.sql("SELECT substring('graft' FROM 1 FOR 2) AS s").head.getString(0)
    assert(r === "gr")
  }

  test("SQL over registered views matches the DataFrame path") {
    Catalog.registerAll(spark, sf0001)
    val sql = spark.sql(
      "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val df = Catalog.table(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sql === df)
  }

  test("x_recursive_cte executes as an iterative UnionLoop, not an unrolled union") {
    val df = Registry.byName("x_recursive_cte").run(spark, sf0001)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("UnionLoop"), s"expected UnionLoopExec in:\n$s")
    // gap-fill contract: every calendar day survives, zero-activity days as 0
    val rows = df.collect()
    assert(rows.length === 31)
    assert(rows.map(_.getDate(0).toString).toSeq === // contiguous spine
      (1 to 31).map(d => f"1995-03-$d%02d"))
  }

  test("x_sql_udf bodies are inlined at analysis time (no ScalaUDF, codegen intact)") {
    val df = Registry.byName("x_sql_udf").run(spark, sf0001)
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("ScalaUDF"), s"SQL UDF fell back to a black-box UDF:\n$s")
    // the function body appears as a plain CASE WHEN projected right above
    // the scan — Catalyst sees through it (codegen + pushdown apply as if
    // the user had written the expression by hand)
    assert(s.contains("CASE WHEN"), s"expected the inlined body in:\n$s")
    // and the result equals the hand-inlined expression path
    val expect = Catalog.table(spark, sf0001, "orders")
      .groupBy(when(col("o_totalprice") < 50000, "small")
        .when(col("o_totalprice") < 150000, "mid").otherwise("large").as("band"))
      .agg(count(lit(1)).as("n_orders"),
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("n_urgent"))
      .orderBy("band")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }

  test("explicit hash/round-robin/range repartitioning takes effect") {
    val l = Catalog.table(spark, sf0001, "lineitem")
    assert(Partitioning.numPartitions(Partitioning.roundRobin(l, 7)) === 7)
    val hashed = Partitioning.hash(l, 5, "l_orderkey")
    assert(Partitioning.numPartitions(hashed) === 5)
    assert(Partitioning.describe(hashed).toLowerCase.contains("hashpartitioning"))
    val ranged = Partitioning.byRange(l, 3, col("l_orderkey"))
    assert(Partitioning.numPartitions(ranged) === 3)
  }
}

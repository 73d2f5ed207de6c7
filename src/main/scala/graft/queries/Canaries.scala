package graft.queries

import graft.{Catalog, GQuery}
import org.apache.spark.sql.functions._

/** Type-representation CANARIES — one tiny query per risky output type,
  * so a cross-engine hash divergence in a type's physical or textual
  * canonicalization is caught by a named, single-purpose query instead of
  * silently reddening a real operator (the round-3 decimal128 lesson:
  * DECIMAL(p>18) values hashed differently per engine while being
  * byte-identical, and the divergence surfaced in two unrelated
  * aggregate queries).
  *
  * Each canary pins the SUPPORTED output contract (COVERAGE.md "type
  * representation contract"). The driver's comparator routes BOTH result
  * sets through pandas (Spark parquet via pyarrow.to_pandas, the DuckDB
  * oracle via fetchdf) and stringifies per column — which is what makes
  * the contract what it is (round-5 lesson; tools/check_oracles.py
  * reproduces it and --selftests the divergence classes):
  *  - timestamps: emit TIMESTAMP_NTZ (parquet isAdjustedToUTC=false ≡
  *    DuckDB's naive TIMESTAMP). Session-local TIMESTAMP writes
  *    tz-adjusted parquet that canonicalizes with a zone suffix — not
  *    gateable.
  *  - integer aggregates: DuckDB SUM(int) is HUGEINT, which pandas
  *    coerces to float64 ("6.0" vs Spark's "6") — every oracle integer
  *    SUM must be CAST(... AS BIGINT).
  *  - decimals: NOT gateable as a typed column at ANY precision (pandas
  *    coerces oracle DECIMAL to float64, dropping trailing scale zeros:
  *    "123.4" vs Spark's exact "123.40"). Keep decimal arithmetic
  *    internal; gate the result as a fixed-scale string
  *    (CAST .. AS STRING/VARCHAR) or a fix6 double.
  *  - arrays: NOT gateable as a column (pandas sort_values crashes on
  *    the numpy-array cells pyarrow produces — "unhashable type:
  *    numpy.ndarray"); emit array_join(...) strings or exploded rows.
  *  - binary: NOT gateable as a raw column either (pandas str-casting
  *    of a bytes column attempts a utf-8 decode and raises on arbitrary
  *    bytes); compute binary internally, gate a hex(...) render (both
  *    engines hex uppercase).
  *  - maps: NOT gateable as a column (engines canonicalize entries vs
  *    dict differently); emit exploded (key, value) rows — map_entries +
  *    explode — which this canary pins.
  *  - float specials: NaN, ±0.0, ±Infinity are gateable (NaN is
  *    canonicalized by name; signed zero and infinities round-trip
  *    identically).
  */
object Canaries {

  def queries: Seq[GQuery] = Seq(tsCanary, arrayCanary, mapCanary,
    floatEdgeCanary, decimal18Canary, reprCanary, gsEmptyCanary)

  /** TIMESTAMP_NTZ output: micros-precision timestamps derived from the
    * events table's epoch-nanos. The ntz cast is the contract — a
    * session-zone TIMESTAMP would parquet-write `isAdjustedToUTC=true`
    * and canonicalize with an explicit zone. */
  val tsCanary: GQuery = GQuery(
    "c_type_timestamp",
    "canary: TIMESTAMP_NTZ output representation",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.filter(col("event_id") < 10)
        .select(col("event_id"),
          expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz").as("ts_ntz"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts_ntz
      FROM events WHERE event_id < 10
      ORDER BY event_id"""))

  /** Array outputs across element types (bigint, string, double) plus a
    * BINARY column. Arrays are computed as real array columns (the
    * capability) but GATE as array_join(...) strings / element columns:
    * a raw list column crashes the driver's pandas sort ("unhashable
    * type: numpy.ndarray" — red r5); the binary md5 digest is computed
    * as real BINARY but gates as its hex render (raw bytes trip the
    * pandas utf-8 str cast). */
  val arrayCanary: GQuery = GQuery(
    "c_type_array",
    "canary: array<bigint/string/double> (joined render) and binary output",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 10)
        .select(col("p_partkey"),
          array(col("p_partkey") + 1, col("p_partkey") * 2).as("arr_i"),
          split(col("p_type"), " ").as("arr_s"),
          array(col("p_retailprice").cast("double"),
            (col("p_retailprice") * 2).cast("double")).as("arr_d"),
          unhex(md5(col("p_name").cast("binary"))).as("bin"))
        .select(col("p_partkey"),
          expr("array_join(transform(arr_i, x -> cast(x AS string)), ',')").as("arr_i"),
          array_join(col("arr_s"), ",").as("arr_s"),
          element_at(col("arr_d"), 1).as("arr_d_lo"),
          element_at(col("arr_d"), 2).as("arr_d_hi"),
          hex(col("bin")).as("bin_hex"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             array_to_string([p_partkey + 1, p_partkey * 2], ',') AS arr_i,
             array_to_string(string_split(p_type, ' '), ',') AS arr_s,
             CAST(p_retailprice AS DOUBLE) AS arr_d_lo,
             CAST(p_retailprice * 2 AS DOUBLE) AS arr_d_hi,
             hex(unhex(md5(p_name))) AS bin_hex
      FROM part WHERE p_partkey < 10
      ORDER BY p_partkey"""))

  /** Map data is emitted as exploded (key, value) ROWS — the gateable
    * form. (A raw map column canonicalizes as entry-list in Spark parquet
    * but as a dict in DuckDB: never emit one.) */
  val mapCanary: GQuery = GQuery(
    "c_type_map_entries",
    "canary: map output contract = exploded (key, value) rows",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 5)
        .select(col("p_partkey"),
          map_from_arrays(array(lit("brand"), lit("type")),
            array(col("p_brand"), col("p_type"))).as("m"))
        .select(col("p_partkey"), explode(col("m")).as(Seq("k", "v")))
        .orderBy(col("p_partkey"), col("k"))
    },
    Some("""
      SELECT p_partkey, unnest(map_keys(m)) AS k, unnest(map_values(m)) AS v
      FROM (SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) AS m
            FROM part WHERE p_partkey < 5) t
      ORDER BY p_partkey, k"""))

  /** IEEE special values as outputs: NaN, signed zero, both infinities.
    * Constructed identically on both engines (string-literal casts and a
    * sign-producing product — no division, which ANSI mode rejects). */
  val floatEdgeCanary: GQuery = GQuery(
    "c_type_float_edge",
    "canary: NaN / -0.0 / +0.0 / +-Infinity output representation",
    (spark, dir) => {
      val r = Catalog.table(spark, dir, "region")
      r.select(col("r_regionkey"),
          expr("CAST('NaN' AS DOUBLE)").as("v_nan"),
          expr("-1.0D * 0.0D").as("v_negzero"),
          expr("1.0D * 0.0D").as("v_poszero"),
          expr("CAST('Infinity' AS DOUBLE)").as("v_inf"),
          expr("CAST('-Infinity' AS DOUBLE)").as("v_ninf"))
        .orderBy(col("r_regionkey"))
    },
    Some("""
      SELECT r_regionkey,
             CAST('NaN' AS DOUBLE) AS v_nan,
             CAST(-1.0 AS DOUBLE) * CAST(0.0 AS DOUBLE) AS v_negzero,
             CAST(1.0 AS DOUBLE) * CAST(0.0 AS DOUBLE) AS v_poszero,
             CAST('Infinity' AS DOUBLE) AS v_inf,
             CAST('-Infinity' AS DOUBLE) AS v_ninf
      FROM region
      ORDER BY r_regionkey"""))

  /** DECIMAL(18,x) — boundary-precision decimal arithmetic, gated as
    * fixed-scale STRING renders (both engines pad to scale: "-123.40",
    * "0.500000"). A decimal-TYPED gate column is never hash-stable under
    * the driver: its pandas path coerces oracle DECIMAL to float64 and
    * drops trailing scale zeros (red rounds 1-5 on exactly this).
    * Exercises negative values and scale widening at precision 18. */
  val decimal18Canary: GQuery = GQuery(
    "c_type_decimal18",
    "canary: DECIMAL(18,2)/(18,6) arithmetic, fixed-scale string render",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      l.filter(col("l_orderkey") < 100)
        .agg(
          sum(graft.util.Num.dec2(col("l_extendedprice")))
            .cast("decimal(18,2)").cast("string").as("d18_2"),
          sum(graft.util.Num.dec2(col("l_extendedprice")) * -1)
            .cast("decimal(18,2)").cast("string").as("d18_2_neg"),
          // scale WIDENING only (2 -> 6 fractional digits) — exact; a
          // decimal AVG would divide with engine-specific tie rounding
          sum(graft.util.Num.dec2(col("l_discount")))
            .cast("decimal(18,6)").cast("string").as("d18_6"))
    },
    Some(s"""
      SELECT CAST(CAST(SUM(p) AS DECIMAL(18,2)) AS VARCHAR) AS d18_2,
             CAST(CAST(SUM(p * -1) AS DECIMAL(18,2)) AS VARCHAR) AS d18_2_neg,
             CAST(CAST(SUM(d) AS DECIMAL(18,6)) AS VARCHAR) AS d18_6
      FROM (SELECT ${graft.util.Num.dec2Sql("l_extendedprice")} AS p,
                   ${graft.util.Num.dec2Sql("l_discount")} AS d
            FROM lineitem WHERE l_orderkey < 100) t"""))

  /** Representation-contract canary: ONE query emitting every gateable
    * output dtype the registry uses — BIGINT (from a SUM the oracle must
    * CAST out of HUGEINT), exact double (fix6 discipline), string, date,
    * boolean, hex-rendered binary — so a future harness/dtype drift reds this single
    * named canary instead of scattering across the registry (extends the
    * r4 timestamp-canary pattern that caught the epoch-ns flip). The
    * oracle side deliberately routes its integer SUM through DuckDB's
    * HUGEINT and CASTs it back — the exact divergence class that shipped
    * 8 red rows in round 5. */
  val reprCanary: GQuery = GQuery(
    "c_type_repr",
    "canary: one row-set with every gateable dtype (bigint/double/string/date/bool/binary)",
    (spark, dir) => {
      val o = Catalog.table(spark, dir, "orders")
      o.filter(col("o_orderkey") < 100)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_key"),
          graft.util.Num.dsum(col("o_totalprice")).as("tot_price"),
          min(col("o_orderdate")).as("first_date"),
          expr("bool_or(o_totalprice > 100000.0D)").as("any_big"),
          min(col("o_orderstatus")).as("first_status"),
          hex(unhex(md5(min(col("o_orderstatus"))))).as("status_digest"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""
      SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
             ${graft.util.Num.dsumSql("o_totalprice")} AS tot_price,
             MIN(o_orderdate) AS first_date,
             bool_or(o_totalprice > 100000.0) AS any_big,
             MIN(o_orderstatus) AS first_status,
             hex(unhex(md5(MIN(o_orderstatus)))) AS status_digest
      FROM orders WHERE o_orderkey < 100
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Empty-input GROUPING SETS divergence, pinned IN-ENGINE (round-8
    * fuzzer finding fz160, promoted per the r8 verdict: a semantic
    * divergence this sharp belongs in the engine's own record, not only
    * in a fuzz-grammar guard). Spark's Expand-based grouping sets emit
    * NO global `()` row when the input is empty; the SQL standard — and
    * DuckDB — emit one with COUNT(*) = 0. This canary runs the same
    * grouping-sets shape over an always-empty branch and a non-empty
    * control branch: the control proves the global row DOES appear on
    * non-empty input (non-vacuous), the empty branch pins Spark's
    * zero-row answer. The ORACLE is written to Spark's semantics: its
    * empty branch appends `HAVING COUNT(*) > 0`, which is an identity on
    * non-empty groups and filters exactly the standard's empty-input
    * global row. Dialect note lives in COVERAGE.md next to the
    * decimal/float entries; the fuzz grammar's structural guard
    * (grouping-set templates carry the same HAVING) stays. */
  val gsEmptyCanary: GQuery = GQuery(
    "c_gs_empty",
    "canary: GROUPING SETS on empty input emits no global row (Spark) vs one zero row (standard)",
    (spark, dir) => {
      val d = Catalog.table(spark, dir, "documents")
      def gs(f: org.apache.spark.sql.Column, tag: String) = d.filter(f)
        .groupingSets(Seq(Seq(col("source")), Seq.empty), col("source"))
        .agg(grouping_id().cast("int").as("gid"), count(lit(1)).as("n"))
        .select(lit(tag).as("branch"),
          coalesce(col("source"), lit("ALL")).as("src"), col("gid"), col("n"))
      gs(col("doc_id") < 0, "empty")
        .unionByName(gs(col("doc_id") < 50, "ctl"))
        .orderBy(col("branch"), col("gid"), col("src"))
    },
    Some("""
      WITH eg AS (
        SELECT 'empty' AS branch, COALESCE(source, 'ALL') AS src,
               CAST(GROUPING(source) AS INTEGER) AS gid, COUNT(*) AS n
        FROM (SELECT source FROM documents WHERE doc_id < 0)
        GROUP BY GROUPING SETS ((source), ())
        HAVING COUNT(*) > 0),
      cg AS (
        SELECT 'ctl' AS branch, COALESCE(source, 'ALL') AS src,
               CAST(GROUPING(source) AS INTEGER) AS gid, COUNT(*) AS n
        FROM (SELECT source FROM documents WHERE doc_id < 50)
        GROUP BY GROUPING SETS ((source), ()))
      SELECT branch, src, gid, n FROM eg
      UNION ALL
      SELECT branch, src, gid, n FROM cg
      ORDER BY branch, gid, src"""))
}

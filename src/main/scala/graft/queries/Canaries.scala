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
  * representation contract"):
  *  - timestamps: emit TIMESTAMP_NTZ (parquet isAdjustedToUTC=false ≡
  *    DuckDB's naive TIMESTAMP). Session-local TIMESTAMP writes
  *    tz-adjusted parquet that canonicalizes with a zone suffix — not
  *    gateable.
  *  - decimals: precision ≤ 18 (int64-backed in both engines; > 18
  *    switches to decimal128/HUGEINT whose canonicalizations diverge).
  *  - arrays and binary: gateable as-is.
  *  - maps: NOT gateable as a column (engines canonicalize entries vs
  *    dict differently); emit exploded (key, value) rows — map_entries +
  *    explode — which this canary pins.
  *  - float specials: NaN, ±0.0, ±Infinity are gateable (NaN is
  *    canonicalized by name; signed zero and infinities round-trip
  *    identically).
  */
object Canaries {

  def queries: Seq[GQuery] = Seq(tsCanary, arrayCanary, mapCanary,
    floatEdgeCanary, decimal18Canary)

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
    * BINARY column — all four gate as-is. */
  val arrayCanary: GQuery = GQuery(
    "c_type_array",
    "canary: array<bigint/string/double> and binary output representation",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 10)
        .select(col("p_partkey"),
          array(col("p_partkey") + 1, col("p_partkey") * 2).as("arr_i"),
          split(col("p_type"), " ").as("arr_s"),
          array(col("p_retailprice").cast("double"),
            (col("p_retailprice") * 2).cast("double")).as("arr_d"),
          unhex(md5(col("p_name").cast("binary"))).as("bin"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             [p_partkey + 1, p_partkey * 2] AS arr_i,
             string_split(p_type, ' ') AS arr_s,
             [CAST(p_retailprice AS DOUBLE), CAST(p_retailprice * 2 AS DOUBLE)] AS arr_d,
             unhex(md5(p_name)) AS bin
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

  /** DECIMAL(18,x) — the maximum int64-backed precision, the documented
    * ceiling for decimal outputs. Exercises negative values and both
    * supported scales at the boundary precision. */
  val decimal18Canary: GQuery = GQuery(
    "c_type_decimal18",
    "canary: DECIMAL(18,2)/(18,6) boundary-precision output representation",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      l.filter(col("l_orderkey") < 100)
        .agg(
          sum(graft.util.Num.dec2(col("l_extendedprice")))
            .cast("decimal(18,2)").as("d18_2"),
          sum(graft.util.Num.dec2(col("l_extendedprice")) * -1)
            .cast("decimal(18,2)").as("d18_2_neg"),
          // scale WIDENING only (2 -> 6 fractional digits) — exact; a
          // decimal AVG would divide with engine-specific tie rounding
          sum(graft.util.Num.dec2(col("l_discount")))
            .cast("decimal(18,6)").as("d18_6"))
    },
    Some(s"""
      SELECT CAST(SUM(p) AS DECIMAL(18,2)) AS d18_2,
             CAST(SUM(p * -1) AS DECIMAL(18,2)) AS d18_2_neg,
             CAST(SUM(d) AS DECIMAL(18,6)) AS d18_6
      FROM (SELECT ${graft.util.Num.dec2Sql("l_extendedprice")} AS p,
                   ${graft.util.Num.dec2Sql("l_discount")} AS d
            FROM lineitem WHERE l_orderkey < 100) t"""))
}

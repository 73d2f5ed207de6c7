package graft.queries

import graft.{Catalog, GQuery}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Round-3 widening of the SQL function surface: GROUPING SETS, higher-order
  * array functions, exact percentiles, regex, generator (LATERAL VIEW
  * explode), bitwise and scalar-conditional functions. All of these are
  * "free" capabilities in the reference's DataFusion layer (SURVEY §2b);
  * declaring them as oracle-gated queries proves them rather than assuming
  * them — same rationale as [[Extras]].
  *
  * Scale notes are per-query; the common theme is that everything here is a
  * scan + narrow per-row projection or a single two-phase aggregate — no
  * new shuffle families.
  */
object SqlFuncs {

  def queries: Seq[GQuery] = Seq(
    groupingSetsQ, arrayFuncs, percentiles, regexFuncs, lateralExplode,
    bitwiseFuncs, scalarFuncs)

  /** GROUPING SETS beyond rollup/cube: an explicit irregular set list plus
    * `grouping_id()` disambiguation (rollup/cube are proved separately in
    * [[Extras.rollupAgg]]/[[Extras.cubeAgg]]). Spark expands grouping sets
    * into a single Expand + two-phase hash aggregate — one shuffle
    * regardless of how many sets, so the 100 TB cost is the same as one
    * group-by pass. */
  val groupingSetsQ: GQuery = GQuery(
    "x_grouping_sets",
    "explicit GROUPING SETS ((flag),(status),()) with grouping_id",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      l.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("gid"), col("n"))
        .orderBy(col("gid"), col("flag"), col("status"))
    },
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS flag,
             COALESCE(l_linestatus, 'ALL') AS status,
             CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY gid, flag, status"""))

  /** Higher-order array functions — transform/filter/aggregate lambdas plus
    * array_max/sort/slice — all codegen'd Catalyst expressions (no UDF), so
    * they stay inside WholeStageCodegen on a 100 TB scan. The long
    * accumulator in `aggregate` is exact, order-fixed (sequential left
    * fold), hence engine-identical. */
  val arrayFuncs: GQuery = GQuery(
    "x_array_funcs",
    "transform/filter/aggregate lambdas, array_max, sort_array, slice",
    (spark, dir) => {
      val d = Catalog.table(spark, dir, "documents")
      d.filter(col("doc_id") < 5)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .select(
          col("doc_id"),
          size(col("l")).as("n_toks"),
          size(expr("filter(l, x -> length(x) > 4)")).as("n_long"),
          expr("aggregate(transform(l, x -> CAST(length(x) AS BIGINT))," +
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("sum_len"),
          expr("array_max(transform(l, x -> length(x)))").as("max_len"),
          concat_ws(",", slice(sort_array(col("l")), 1, 3)).as("first3"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(l) AS INTEGER) AS n_toks,
             CAST(len(list_filter(l, x -> length(x) > 4)) AS INTEGER) AS n_long,
             CAST(list_sum(list_transform(l, x -> length(x))) AS BIGINT) AS sum_len,
             CAST(list_max(list_transform(l, x -> length(x))) AS INTEGER) AS max_len,
             array_to_string(list_sort(l)[1:3], ',') AS first3
      FROM (SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE doc_id < 5) t
      ORDER BY doc_id"""))

  /** Exact interpolated percentiles (quantile_cont semantics, the
    * `(n-1)*p` rank rule both engines implement). Determinism: quarter
    * quantiles over an integer-valued domain interpolate with fractions in
    * {0, .25, .5, .75} between integer neighbors — exact in IEEE-754 on
    * both engines, no ulp drift. Scale note: exact percentile is a
    * sort-based aggregate; at 100 TB swap in approx_percentile (t-digest)
    * — same query shape, bounded memory. */
  val percentiles: GQuery = GQuery(
    "x_percentiles",
    "exact percentile (quantile_cont) p25/p50/p75 per group",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      l.groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          min(col("l_quantity")).cast("double").as("qmin"),
          max(col("l_quantity")).cast("double").as("qmax"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS p25,
             quantile_cont(l_quantity, 0.5)  AS p50,
             quantile_cont(l_quantity, 0.75) AS p75,
             CAST(MIN(l_quantity) AS DOUBLE) AS qmin,
             CAST(MAX(l_quantity) AS DOUBLE) AS qmax
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Regex surface: extract / match / global replace. Patterns restricted
    * to the portable subset (character classes, quantifiers) where Java
    * regex (Spark) and RE2 (DuckDB) agree. Note DuckDB's regexp_replace
    * needs the explicit 'g' flag to match Spark's always-global semantics —
    * pinned in the oracle. */
  val regexFuncs: GQuery = GQuery(
    "x_regex_funcs",
    "regexp_extract, rlike, global regexp_replace",
    (spark, dir) => {
      val c = Catalog.table(spark, dir, "customer")
      c.filter(col("c_custkey") < 30)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          col("c_name").rlike("0{2}").cast(IntegerType).as("has00"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey,
             regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             CAST(regexp_matches(c_name, '0{2}') AS INTEGER) AS has00,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
      FROM customer
      WHERE c_custkey < 30
      ORDER BY c_custkey"""))

  /** Generator / LATERAL VIEW surface: posexplode keeps the element index —
    * the building block every explode-shaped op in TextOps relies on,
    * proved here directly against DuckDB's zipped
    * unnest + generate_subscripts. Narrow row-expansion, no shuffle. */
  val lateralExplode: GQuery = GQuery(
    "x_lateral_explode",
    "posexplode (LATERAL VIEW) with element position",
    (spark, dir) => {
      val d = Catalog.table(spark, dir, "documents")
      d.filter(col("doc_id") < 3)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast(IntegerType).as("pos"), col("tok"))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""
      SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS INTEGER) AS pos,
             unnest(l) AS tok
      FROM (SELECT doc_id, string_split(text, ' ') AS l
            FROM documents WHERE doc_id < 3) t
      ORDER BY doc_id, pos"""))

  /** Bitwise function surface over int64 keys: and/or/xor/shift/popcount.
    * Pure per-row integer ops — exact on both engines. */
  val bitwiseFuncs: GQuery = GQuery(
    "x_bitwise",
    "bitwise and/or/xor, shifts, bit_count",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 40)
        .select(
          col("p_partkey"),
          col("p_partkey").bitwiseAND(lit(255L)).as("b_and"),
          col("p_partkey").bitwiseOR(lit(4096L)).as("b_or"),
          col("p_partkey").bitwiseXOR(lit(21845L)).as("b_xor"),
          expr("shiftleft(p_partkey, 2)").as("b_shl"),
          expr("bit_count(CAST(p_partkey AS BIGINT))").cast(IntegerType).as("pop"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             p_partkey & 255 AS b_and,
             p_partkey | 4096 AS b_or,
             xor(p_partkey, 21845) AS b_xor,
             p_partkey << 2 AS b_shl,
             CAST(bit_count(CAST(p_partkey AS BIGINT)) AS INTEGER) AS pop
      FROM part
      WHERE p_partkey < 40
      ORDER BY p_partkey"""))

  /** Scalar conditional/arith surface: least/greatest/nullif/abs/mod/sign
    * over integers (exact everywhere). */
  val scalarFuncs: GQuery = GQuery(
    "x_scalar_funcs",
    "least, greatest, nullif, abs, mod, sign",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 60)
        .select(
          col("p_partkey"),
          least(col("p_size"), col("p_partkey") % 30).as("lo"),
          greatest(col("p_size"), col("p_partkey") % 30).as("hi"),
          expr("nullif(p_size, 25)").as("size_not25"),
          abs(col("p_size") - 25).as("dist25"),
          (col("p_partkey") % 7).as("m7"),
          signum(col("p_size") - 25).cast(IntegerType).as("sgn"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             LEAST(p_size, p_partkey % 30) AS lo,
             GREATEST(p_size, p_partkey % 30) AS hi,
             NULLIF(p_size, 25) AS size_not25,
             ABS(p_size - 25) AS dist25,
             p_partkey % 7 AS m7,
             CAST(SIGN(p_size - 25) AS INTEGER) AS sgn
      FROM part
      WHERE p_partkey < 60
      ORDER BY p_partkey"""))
}

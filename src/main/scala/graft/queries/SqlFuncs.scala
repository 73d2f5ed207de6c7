package graft.queries

import graft.{Catalog, GQuery}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
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
    bitwiseFuncs, scalarFuncs, mapFuncs, condAgg, statsAgg, windowLeadLag,
    lateralJoin, unpivotQ, windowDistribution, variantJson, recursiveCte,
    sqlUdf, tryFuncs, stringAgg)

  /** LISTAGG-style ordered string aggregation — the report/export
    * surface every warehouse ships. Spark's collect_set is
    * partition-order NONdeterministic, so the deterministic spelling is
    * collect_set → sort_array → concat_ws: the sort pins the element
    * order no matter how partials merged, which is exactly what makes
    * the result hash-gateable (and partition-layout invariant at
    * cluster scale). The oracle is DuckDB's native
    * `string_agg(DISTINCT … ORDER BY …)`. Group cardinality bounds the
    * list length (|statuses| ≤ 3 here) — at 100 TB keep LISTAGG to
    * bounded-domain columns or cap with slice(). */
  val stringAgg: GQuery = GQuery(
    "x_string_agg",
    "ordered LISTAGG: sorted distinct status list + flag roster per priority",
    (spark, dir) => {
      val o = Catalog.table(spark, dir, "orders")
      o.groupBy(col("o_orderpriority").as("priority"))
        .agg(
          concat_ws("|", sort_array(collect_set(col("o_orderstatus"))))
            .as("statuses"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(col("priority"))
    },
    Some("""
      SELECT o_orderpriority AS priority,
             string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
               AS statuses,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS n_custs
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY priority"""))

  /** Error-safe `try_*` arithmetic — the ANSI-mode safety valves. The
    * session runs ANSI (GraftSession pins it, matching the reference's
    * strict-SQL semantics), where 1/0 and bad casts THROW; the try_
    * family turns row-level poison into NULLs so one malformed record
    * can't kill a 100 TB job. Covered: try_divide (NULL on zero
    * denominator), try_cast (NULL on unparseable string), try_element_at
    * (NULL out of bounds). Division output is quantized via the fix6
    * floor grid (pure IEEE per-row arithmetic — no round() tie risk;
    * NULL propagates through floor/cast). Oracle: NULLIF guards +
    * TRY_CAST + DuckDB's native NULL-on-OOB list indexing. */
  val tryFuncs: GQuery = GQuery(
    "x_try_funcs",
    "try_divide/try_cast/try_element_at error-safe row-level arithmetic",
    (spark, dir) => {
      Catalog.registerAll(spark, dir)
      spark.sql("""
        SELECT o_orderkey,
               o_custkey % 5 AS d,
               CAST(FLOOR(try_divide(o_totalprice, o_custkey % 5)
                          * 1000000 + 0.5) AS BIGINT) AS div6,
               CAST(try_cast(CASE WHEN o_custkey % 3 = 0 THEN 'n/a'
                                  ELSE CAST(o_custkey AS STRING) END
                             AS INT) AS BIGINT) AS parsed,
               try_element_at(split(o_orderpriority, '-'), 2) AS prio_word,
               try_element_at(split(o_orderpriority, '-'), 3) AS beyond
        FROM orders WHERE o_orderkey <= 200
        ORDER BY o_orderkey""")
    },
    Some("""
      SELECT o_orderkey,
             o_custkey % 5 AS d,
             CAST(FLOOR(o_totalprice / NULLIF(o_custkey % 5, 0)
                        * 1000000 + 0.5) AS BIGINT) AS div6,
             CAST(TRY_CAST(CASE WHEN o_custkey % 3 = 0 THEN 'n/a'
                                ELSE CAST(o_custkey AS VARCHAR) END
                           AS INTEGER) AS BIGINT) AS parsed,
             string_split(o_orderpriority, '-')[2] AS prio_word,
             string_split(o_orderpriority, '-')[3] AS beyond
      FROM orders WHERE o_orderkey <= 200
      ORDER BY o_orderkey"""))

  // ------------------------------------------------------------ recursion
  /** WITH RECURSIVE calendar-spine gap-fill — the canonical recursive-CTE
    * production pattern: a date spine LEFT-JOINs daily aggregates so
    * zero-activity days survive (a plain GROUP BY silently drops them).
    * Spark 4 executes the recursion as `UnionLoopExec` — the anchor seeds
    * an iteration whose step output feeds the next step, the same shape
    * [[GraphOps]] builds as an explicit driver job loop for CC/BFS, here
    * expressed in pure SQL (DataFusion grew the same operator,
    * RecursiveQueryExec — SURVEY §2b note).
    *
    * Scale shape: the recursion only ever touches the spine (bounded by
    * the calendar — 31 rows here, a few thousand for a decade of days);
    * the fact table aggregates FIRST through one ordinary two-phase agg,
    * and the tiny spine joins the aggregate. Recursion depth is the
    * calendar length, independent of data volume. */
  val recursiveCte: GQuery = GQuery(
    "x_recursive_cte",
    "WITH RECURSIVE calendar-spine gap-fill over March-1995 orders",
    (spark, dir) => {
      Catalog.registerAll(spark, dir)
      spark.sql("""
        WITH RECURSIVE spine(day) AS (
          SELECT DATE'1995-03-01'
          UNION ALL SELECT date_add(day, 1) FROM spine WHERE day < DATE'1995-03-31'),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
                 COUNT(DISTINCT o_custkey) AS n_custs
          FROM orders
          WHERE o_orderdate >= TIMESTAMP'1995-03-01 00:00:00'
            AND o_orderdate < TIMESTAMP'1995-04-01 00:00:00'
          GROUP BY 1)
        SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
               COALESCE(d.n_custs, 0) AS n_custs
        FROM spine s LEFT JOIN daily d ON d.day = s.day
        ORDER BY s.day""")
    },
    Some("""
      WITH RECURSIVE spine(day) AS (
        SELECT DATE '1995-03-01'
        UNION ALL SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM spine
        WHERE day < DATE '1995-03-31'),
      daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_custs
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-03-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
        GROUP BY 1)
      SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
             COALESCE(d.n_custs, 0) AS n_custs
      FROM spine s LEFT JOIN daily d ON d.day = s.day
      ORDER BY s.day"""))

  /** SQL-defined scalar UDFs (`CREATE TEMPORARY FUNCTION … RETURN expr`,
    * Spark 4): the declarative UDF path. Unlike a JVM closure UDF the
    * body is inlined into the plan at analysis time, so it stays inside
    * whole-stage codegen and Catalyst pushes/prunes straight through it
    * — the UDF surface with zero optimizer cost (the JVM typed-Aggregator
    * and native-Expression paths are proven separately in
    * AggregatorsSpec / `v_knn_native`). Oracle: the same bodies inlined
    * by hand — definition and use site must agree semantically. */
  val sqlUdf: GQuery = GQuery(
    "x_sql_udf",
    "SQL scalar UDFs (CREATE FUNCTION .. RETURN) inlined into an aggregate",
    (spark, dir) => {
      Catalog.registerAll(spark, dir)
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000 THEN 'small'
                    WHEN p < 150000 THEN 'mid' ELSE 'large' END""")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION urgent(pri STRING)
        RETURNS BOOLEAN RETURN pri IN ('1-URGENT', '2-HIGH')""")
      spark.sql("""
        SELECT price_band(o_totalprice) AS band, COUNT(*) AS n_orders,
               COUNT(IF(urgent(o_orderpriority), 1, NULL)) AS n_urgent
        FROM orders GROUP BY 1 ORDER BY band""")
    },
    Some("""
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'mid' ELSE 'large' END AS band,
             COUNT(*) AS n_orders,
             COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)
               AS n_urgent
      FROM orders GROUP BY 1 ORDER BY band"""))

  /** Distribution window functions: percent_rank, cume_dist, NTILE — the
    * remaining rank-family members (rank/dense_rank/row_number proven in
    * Extras, lead/lag/nth in [[windowLeadLag]]). PARTITIONED windows only
    * (per-nation): the partition key shuffles once and each partition
    * sorts independently — no global window anywhere (the a_rfm_segments
    * lesson). Determinism: percent_rank = (rank−1)/(n−1) and cume_dist =
    * peers/n are exact small-integer ratios — bit-identical in any IEEE
    * engine; NTILE is positional over a TOTAL order (acctbal is unique at
    * fixture scale, custkey breaks ties anyway) and DuckDB returns it as
    * BIGINT, so both sides pin INTEGER. */
  val windowDistribution: GQuery = GQuery(
    "x_window_distribution",
    "percent_rank / cume_dist / ntile over partitioned windows",
    (spark, dir) => {
      val c = Catalog.table(spark, dir, "customer")
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.filter(col("c_custkey") <= 200)
        .select(col("c_nationkey"), col("c_custkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          ntile(4).over(w).cast(IntegerType).as("quartile"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""
      SELECT c_nationkey, c_custkey,
             ROUND(percent_rank() OVER w, 6) AS pr,
             ROUND(cume_dist() OVER w, 6) AS cd,
             CAST(NTILE(4) OVER w AS INTEGER) AS quartile
      FROM customer
      WHERE c_custkey <= 200
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_nationkey, c_custkey"""))

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

  /** MAP column surface: construct / element_at / cardinality. Spark's MAP
    * and DuckDB's MAP differ in subscript semantics (DuckDB `m[k]` yields a
    * LIST), so the oracle pins `m[k][1]`; outputs are scalars on both sides
    * so the hash compare sees identical shapes. Per-row only — maps ride
    * inside Tungsten rows, no shuffle. */
  val mapFuncs: GQuery = GQuery(
    "x_map_funcs",
    "map_from_arrays, element_at, map cardinality",
    (spark, dir) => {
      val p = Catalog.table(spark, dir, "part")
      p.filter(col("p_partkey") < 20)
        .select(col("p_partkey"),
          map_from_arrays(
            array(lit("brand"), lit("type")),
            array(col("p_brand"), col("p_type"))).as("m"))
        .select(
          col("p_partkey"),
          element_at(col("m"), "brand").as("brand"),
          element_at(col("m"), "type").as("typ"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             m['brand'][1] AS brand,
             m['type'][1] AS typ,
             CAST(cardinality(m) AS INTEGER) AS n_keys
      FROM (SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) AS m
            FROM part WHERE p_partkey < 20) t
      ORDER BY p_partkey"""))

  /** Conditional aggregation surface: count_if, the SQL:2003 FILTER clause,
    * bool_and/bool_or. One two-phase hash aggregate — the FILTER predicates
    * evaluate map-side inside codegen, so conditional aggs cost the same as
    * unconditional ones at 100 TB. `l_quantity` is integer-valued, so the
    * filtered SUM is exact on both engines. The decimal sum gates as a
    * fixed-scale STRING render: the driver's pandas comparator coerces
    * oracle-side DECIMAL to float64 ("154.0" vs Spark's exact "154.00"),
    * so a decimal-typed gate column is never hash-stable (COVERAGE.md,
    * type representation contract). */
  val condAgg: GQuery = GQuery(
    "x_cond_agg",
    "count_if, aggregate FILTER clause, bool_and/bool_or",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      l.groupBy(col("l_returnflag"))
        .agg(
          expr("count_if(l_discount > 0.05)").as("n_disc"),
          expr("sum(l_quantity) FILTER (WHERE l_tax > 0.04)")
            .cast("decimal(18,2)").cast("string").as("qty_taxed"),
          expr("bool_and(l_quantity > 0)").as("all_pos"),
          expr("bool_or(l_discount > 0.09)").as("any_big"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             count(*) FILTER (WHERE l_discount > 0.05) AS n_disc,
             CAST(CAST(SUM(l_quantity) FILTER (WHERE l_tax > 0.04) AS DECIMAL(18,2))
                  AS VARCHAR) AS qty_taxed,
             bool_and(l_quantity > 0) AS all_pos,
             bool_or(l_discount > 0.09) AS any_big
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Statistical aggregate surface: stddev/variance/correlation/covariance
    * from EXACT integer moments. The builtins (Spark's Welford-style
    * CentralMomentAgg, DuckDB's streaming formula) keep non-integer
    * intermediate means merged in shuffle-fetch order — engines agree only
    * to ~1e-9, which a hash gate cannot tolerate. Here the five moments
    * (n, Σx, Σx², Σxy, …) are BIGINT sums over integer-valued columns
    * (quantity 1..50, linenumber 1..7) — exact under any merge order —
    * and the closed forms then do identical IEEE-754 arithmetic on
    * identical integers: bit-equal on any engine. (The builtins are
    * separately proven ≈ these closed forms in ApproxSpec.) Distribution:
    * the moment sums are plain algebraic aggregates — same two-phase
    * shuffle as SUM at any scale; closed-form doubles stay exact while
    * n·Σx² < 2^53, i.e. comfortably past 10⁹ rows at these domains. */
  val statsAgg: GQuery = GQuery(
    "x_stats_agg",
    "stddev_samp, var_samp, corr, covar_samp via exact integer moments",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      val x = col("l_quantity").cast(LongType)
      val y = col("l_linenumber").cast(LongType)
      val d = (c: Column) => c.cast("double")
      val g = l.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(x * x).as("sxx"),
          sum(y).as("sy"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
      val nD = d(col("n"))
      val vx = (nD * d(col("sxx")) - d(col("sx")) * d(col("sx"))) / (nD * (nD - 1))
      val vy = (nD * d(col("syy")) - d(col("sy")) * d(col("sy"))) / (nD * (nD - 1))
      val cxy = (nD * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / (nD * (nD - 1))
      g.select(col("l_returnflag"),
          round(sqrt(vx), 6).as("sd_qty"),
          round(vx, 6).as("var_qty"),
          round(cxy / sqrt(vx * vy), 6).as("corr_qn"),
          round(cxy, 6).as("cov_qn"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
             ROUND(sqrt((n * sxx - sx * sx) / (n * (n - 1))), 6) AS sd_qty,
             ROUND((n * sxx - sx * sx) / (n * (n - 1)), 6) AS var_qty,
             ROUND(((n * sxy - sx * sy) / (n * (n - 1))) /
                   sqrt(((n * sxx - sx * sx) / (n * (n - 1))) *
                        ((n * syy - sy * sy) / (n * (n - 1)))), 6) AS corr_qn,
             ROUND((n * sxy - sx * sy) / (n * (n - 1)), 6) AS cov_qn
      FROM m
      ORDER BY l_returnflag"""))

  /** Offset/value window functions: lag, lead, first_value, nth_value. The
    * window order (o_orderdate, o_orderkey) is a total order (orderkey
    * unique), so no peer-group ambiguity; default RANGE-to-current frame
    * semantics then agree between engines (nth_value is NULL until the
    * frame holds n rows — pinned by the oracle). One shuffle on the
    * partition key, sort within partitions. */
  val windowLeadLag: GQuery = GQuery(
    "x_window_lead_lag",
    "lag/lead/first_value/nth_value over a per-customer order timeline",
    (spark, dir) => {
      val o = Catalog.table(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.filter(col("o_custkey") < 30)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             first_value(o_totalprice) OVER w AS first_price,
             nth_value(o_totalprice, 2) OVER w AS second_price
      FROM orders
      WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** Correlated LATERAL subquery — the per-row subquery surface beyond
    * scalar subqueries (proved in TpchLike q02/q17): a per-customer
    * aggregate over their own orders. Catalyst decorrelates this into a
    * single aggregate + join (no per-row re-execution), so the 100 TB
    * plan is one shuffle on the correlation key — pinned here through the
    * SQL-text path since LATERAL has no DataFrame-API spelling.
    * `max(double)` is order-free, so no fix6 needed. */
  val lateralJoin: GQuery = GQuery(
    "x_lateral_join",
    "correlated LATERAL subquery (decorrelated to join + aggregate)",
    (spark, dir) => {
      graft.Catalog.registerAll(spark, dir)
      spark.sql(lateralSql)
    },
    Some(lateralSql))

  private lazy val lateralSql = """
      SELECT c.c_custkey, t.n_orders, t.max_price
      FROM customer c,
      LATERAL (SELECT count(*) AS n_orders, max(o_totalprice) AS max_price
               FROM orders o WHERE o.o_custkey = c.c_custkey) t
      WHERE c.c_custkey < 20
      ORDER BY c.c_custkey"""

  /** UNPIVOT / melt — wide-to-long reshaping, the inverse of x_pivot:
    * three per-group measures become (group, metric, value) rows. Spark's
    * `Dataset.unpivot` is a zero-shuffle Expand (each input row emits one
    * row per measure), so at 100 TB the reshape costs one scan. Measures
    * are exact BIGINTs, so the long form hash-compares cleanly. */
  val unpivotQ: GQuery = GQuery(
    "x_unpivot",
    "UNPIVOT (wide measures -> long metric/value rows)",
    (spark, dir) => {
      val l = Catalog.table(spark, dir, "lineitem")
      val wide = l.groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast(LongType)).as("qty"),
          count(lit(1)).as("cnt"),
          sum(col("l_linenumber").cast(LongType)).as("lines"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("qty"), col("cnt"), col("lines")),
          "metric", "val")
        .orderBy(col("l_returnflag"), col("metric"))
    },
    Some("""
      WITH w AS (SELECT l_returnflag,
                        CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS BIGINT) AS qty,
                        CAST(COUNT(*) AS BIGINT) AS cnt,
                        CAST(CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS BIGINT) AS lines
                 FROM lineitem GROUP BY 1)
      SELECT l_returnflag, metric, val FROM w
      UNPIVOT (val FOR metric IN (qty, cnt, lines))
      ORDER BY l_returnflag, metric"""))

  /** Semi-structured VARIANT path (Spark 4's binary-encoded JSON type —
    * the modern lakehouse answer to string-typed JSON columns):
    * `parse_json` builds the variant once per row, `variant_get` does
    * TYPED extraction (no string round-trip), `try_variant_get` probes a
    * missing path without erroring. The variant stays INSIDE the plan —
    * outputs are plain BIGINTs, so the cross-engine gate sees only
    * standard types ([[Canaries]] output-type contract). Differs from
    * e_json_extract (string get_json_object) in the engine path
    * exercised: here extraction happens on the variant binary encoding.
    * Scale shape: scan-parallel per-row parse + one small rollup. */
  val variantJson: GQuery = GQuery(
    "x_variant_json",
    "Spark VARIANT parse_json + typed variant_get extraction + try-probe",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          expr("try_variant_get(parse_json(props), '$.missing', 'bigint')")
            .as("miss"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          count(col("miss")).as("n_missing_hits"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(k) AS n_with_k,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MAX(k) AS max_k,
             COUNT(CAST(json_extract_string(props, '$.missing') AS BIGINT))
               AS n_missing_hits
      FROM (SELECT event_type, props,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type"""))
}

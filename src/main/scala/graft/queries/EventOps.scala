package graft.queries

import graft.{Catalog, GQuery}
import graft.util.Num._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream analytics over the `events` table (batch view; the same
  * transforms port to Structured Streaming — watermark + mapGroupsWithState
  * variants live in graft.streaming). The reference is bounded-batch only
  * (reference: src/plan/arrow_flight_read.rs:36-38), so this whole module
  * is north-star extension surface.
  *
  * Timestamps are compared as epoch microseconds everywhere: the parquet
  * files store ns, Spark truncates to us, DuckDB to us — epoch_us is the
  * common exact currency.
  */
object EventOps {

  def queries: Seq[GQuery] =
    Seq(sessionize, hourlyStats, jsonExtract, funnel, topUsers, retention,
      asofJoin, rangeJoin, intervalJoin, upsertCompact, anomalyZscore, scd2,
      attribution, funnelSteps, slidingStats, markovTransitions, cohortLtv,
      interpolate, streaks, decimate, outOfOrder, patternMatch, cohortMatrix,
      stickiness)

  /** DAU/WAU stickiness — the product-analytics engagement ratio: per
    * week, weekly-active users, average daily-active users across that
    * week's observed days, and stickiness = avgDAU/WAU (1.0 = everyone
    * active every observed day). Day and week are the same integer
    * epoch-floor family (`week = day div 7`), so bucketing is
    * calendar-free and engine-exact; avgDAU and stickiness are
    * fixed-order double expressions over exact integer counts.
    * Scale shape: two distinct-aggregates ((user,day) and (user,week) —
    * both ∝ activity, with map-side partials), then week-grain tiny
    * joins; no window functions at all. */
  val stickiness: GQuery = GQuery(
    "e_stickiness",
    "per-week DAU/WAU stickiness from integer epoch buckets",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val dau = e.distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("dau"))
        .withColumn("week", expr("day div 7"))
        .groupBy(col("week"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val wau = e.select(col("user_id"), expr("day div 7").as("week")).distinct()
        .groupBy(col("week")).agg(count(lit(1)).as("wau"))
      dau.join(wau, "week")
        .select(col("week"), col("wau"), col("n_days"),
          round(col("sum_dau").cast("double") / col("n_days").cast("double"), 4)
            .as("avg_dau"),
          round(col("sum_dau").cast("double") /
            (col("n_days").cast("double") * col("wau").cast("double")), 4)
            .as("stickiness"))
        .orderBy(col("week"))
    },
    Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_us(ts) // 86400000000 AS day
                  FROM events),
      dau AS (SELECT day // 7 AS week, COUNT(*) AS n_days,
                     CAST(SUM(dau) AS BIGINT) AS sum_dau
              FROM (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
              GROUP BY 1),
      wau AS (SELECT week, COUNT(*) AS wau
              FROM (SELECT DISTINCT user_id, day // 7 AS week FROM ud)
              GROUP BY week)
      SELECT week, wau, n_days,
             ROUND(CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE), 4)
               AS avg_dau,
             ROUND(CAST(sum_dau AS DOUBLE) /
                   (CAST(n_days AS DOUBLE) * CAST(wau AS DOUBLE)), 4)
               AS stickiness
      FROM dau JOIN wau USING (week)
      ORDER BY week"""))

  /** Weekly cohort-retention matrix — the full triangular report behind
    * [[retention]]'s day-over-day single diagonal: users bucket into
    * signup cohorts by FIRST-activity week, and cell (cohort, offset)
    * counts how many are still active `offset` weeks later, as an exact
    * percentage of cohort size. Weeks are pure integer epoch-week
    * arithmetic (`ts div 7·86400e9` — no calendar functions, so both
    * engines bucket identically), and the retention percentage is one
    * fixed-order double expression of two exact integers.
    *
    * Scale shape: distinct (user, week) ∝ activity not events; cohorts
    * are a per-user MIN (two-phase); one user-keyed join back; the
    * matrix itself is weeks² — report-sized at any corpus. */
  val cohortMatrix: GQuery = GQuery(
    "a_cohort_matrix",
    "weekly cohort retention matrix: cohort week x offset, pct of cohort",
    (spark, dir) => {
      val wkNs = 7L * 86400L * 1000000000L
      val e = Catalog.table(spark, dir, "events")
      val uw = e.select(col("user_id"), expr(s"ts div $wkNs").as("wk")).distinct()
      val cohort = uw.groupBy(col("user_id")).agg(min(col("wk")).as("c"))
      val sizes = cohort.groupBy(col("c")).agg(count(lit(1)).as("n_cohort"))
      uw.join(cohort, "user_id")
        .groupBy(col("c"), (col("wk") - col("c")).as("off"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "c")
        .select(col("c").as("cohort_week"), col("off"), col("n_active"),
          col("n_cohort"),
          round(lit(100.0d) * col("n_active") / col("n_cohort"), 4).as("pct"))
        .orderBy(col("cohort_week"), col("off"))
    },
    Some("""
      WITH uw AS (SELECT DISTINCT user_id,
                         epoch_us(ts) // 604800000000 AS wk
                  FROM events),
      cohort AS (SELECT user_id, MIN(wk) AS c FROM uw GROUP BY user_id),
      sizes AS (SELECT c, COUNT(*) AS n_cohort FROM cohort GROUP BY c),
      cells AS (
        SELECT c, wk - c AS off, COUNT(*) AS n_active
        FROM uw JOIN cohort USING (user_id)
        GROUP BY 1, 2)
      SELECT c AS cohort_week, off, n_active, n_cohort,
             ROUND(100.0 * n_active / n_cohort, 4) AS pct
      FROM cells JOIN sizes USING (c)
      ORDER BY cohort_week, off"""))

  /** Complex-event-processing (CEP) pattern matching — the Flink-CEP /
    * MATCH_RECOGNIZE capability re-expressed relationally: each user's
    * event-type history becomes one code string (event types map to
    * single chars in deterministic (ts, event_id) order), and sequence
    * patterns are plain regexes counted per user — 'cp' (click
    * immediately followed by purchase), 'ee+' (an error burst),
    * 's[^p]*p' (signup→first purchase span). All three constructs
    * behave identically in Java regex and RE2, and matching is the same
    * leftmost non-overlapping scan in both engines, so occurrence counts
    * hash-gate exactly.
    *
    * Scale shape: ONE hash shuffle on user_id; per-user state is that
    * user's own history (the same bounded-state assumption every CEP
    * engine makes), built by array_sort(collect_list) — map-side
    * partial-collected, never a global sort. Patterns are evaluated as
    * three codegen'd columns over the per-user strings; the final
    * aggregate is 1 row stacked to 3. */
  val patternMatch: GQuery = GQuery(
    "e_pattern_match",
    "CEP regex patterns over per-user event-code sequences: users + occurrences",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      // explicit type->code map (NOT first-char truncation): a future
      // fixture type sharing an initial (e.g. 'checkout' vs 'click')
      // would conflate identically on both engines, so the differential
      // gate could never catch the semantic drift — unknown types code
      // to 'x' and surface as zero-match noise instead (r5 advice)
      val codeCase = "CASE event_type WHEN 'signup' THEN 's'" +
        " WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'" +
        " WHEN 'error' THEN 'e' WHEN 'view' THEN 'v' ELSE 'x' END"
      val seqs = e
        .select(col("user_id"),
          struct(expr("ts div 1000").as("ts_us"), col("event_id"),
            expr(codeCase).as("code")).as("ev"))
        .groupBy(col("user_id"))
        .agg(array_join(
          expr("transform(array_sort(collect_list(ev)), x -> x.code)"), "")
          .as("seq"))
      val counted = seqs.select(
        expr("size(regexp_extract_all(seq, 'cp', 0))").as("n_cp"),
        expr("size(regexp_extract_all(seq, 'ee+', 0))").as("n_burst"),
        expr("size(regexp_extract_all(seq, 's[^p]*p', 0))").as("n_s2p"))
      counted.agg(
          sum(when(col("n_cp") > 0, 1L).otherwise(0L)).as("u_cp"),
          sum(col("n_cp").cast("long")).as("o_cp"),
          sum(when(col("n_burst") > 0, 1L).otherwise(0L)).as("u_burst"),
          sum(col("n_burst").cast("long")).as("o_burst"),
          sum(when(col("n_s2p") > 0, 1L).otherwise(0L)).as("u_s2p"),
          sum(col("n_s2p").cast("long")).as("o_s2p"))
        .select(expr(
          "stack(3, 'click_purchase', u_cp, o_cp," +
            " 'error_burst', u_burst, o_burst," +
            " 'signup_to_purchase', u_s2p, o_s2p)" +
            " AS (pattern, n_users, n_occurrences)"))
        .orderBy(col("pattern"))
    },
    Some("""
      WITH seqs AS (
        SELECT user_id,
               string_agg(CASE event_type WHEN 'signup' THEN 's'
                            WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
                            WHEN 'error' THEN 'e' WHEN 'view' THEN 'v'
                            ELSE 'x' END, ''
                 ORDER BY epoch_us(ts), event_id) AS seq
        FROM events GROUP BY user_id),
      counted AS (
        SELECT len(regexp_extract_all(seq, 'cp')) AS n_cp,
               len(regexp_extract_all(seq, 'ee+')) AS n_burst,
               len(regexp_extract_all(seq, 's[^p]*p')) AS n_s2p
        FROM seqs),
      agged AS (
        SELECT CAST(SUM(CASE WHEN n_cp > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_cp,
               CAST(SUM(n_cp) AS BIGINT) AS o_cp,
               CAST(SUM(CASE WHEN n_burst > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_burst,
               CAST(SUM(n_burst) AS BIGINT) AS o_burst,
               CAST(SUM(CASE WHEN n_s2p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS u_s2p,
               CAST(SUM(n_s2p) AS BIGINT) AS o_s2p
        FROM counted)
      SELECT 'click_purchase' AS pattern, u_cp AS n_users, o_cp AS n_occurrences FROM agged
      UNION ALL
      SELECT 'error_burst', u_burst, o_burst FROM agged
      UNION ALL
      SELECT 'signup_to_purchase', u_s2p, o_s2p FROM agged
      ORDER BY pattern"""))

  /** Watermark-policy audit: how late would events be under a given
    * arrival order? The fixture arrives ts-sorted (zero disorder), so
    * arrival is modeled as a deterministic hash permutation of event_id —
    * the worst-case shuffle a multi-shard ingest can produce — and the
    * batch-watermark mechanics are the real ones: arrival splits into
    * 4096 batches (top bits of the 60-bit arrival hash), the watermark
    * entering a batch is the max event-time of all PRIOR batches, and an
    * event is late by (watermark − ts). The answer — how much mass lands
    * beyond 1d/30d — is what sizes `withWatermark` in the streaming twin
    * (streaming/StreamOps): too short drops the tail, too long holds
    * state.
    *
    * Scale shape: per-batch maxima are one tiny two-phase aggregate
    * (≤ 4096 rows), the prior-max running window runs on that tiny table,
    * and classification is a broadcast join back — the event stream is
    * scanned once and never globally sorted. */
  val outOfOrder: GQuery = GQuery(
    "e_out_of_order",
    "batch-watermark lateness audit under a hashed arrival permutation",
    (spark, dir) => {
      val batchDiv = 281474976710656L // 2^48: 60-bit hash -> 4096 batches
      val e = Catalog.table(spark, dir, "events")
        .select(
          conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 15),
            16, 10).cast("long").as("arr"),
          expr("ts div 1000").as("us"))
        .withColumn("batch", expr(s"arr div $batchDiv"))
      val wm = e.groupBy(col("batch")).agg(max(col("us")).as("mx"))
        .withColumn("wm",
          max(col("mx")).over(Window.orderBy(col("batch"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .select(col("batch"), col("wm"))
      e.join(broadcast(wm), "batch")
        .select(
          when(col("wm").isNull || col("us") >= col("wm"), "a_on_time")
            .when(col("wm") - col("us") <= 86400L * 1000000L, "b_late_1d")
            .when(col("wm") - col("us") <= 2592000L * 1000000L, "c_late_30d")
            .otherwise("d_late_gt_30d").as("bucket"),
          when(col("wm") > col("us"), col("wm") - col("us"))
            .otherwise(lit(0L)).as("late_us"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), max(col("late_us")).as("max_late_us"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH e AS (
        SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                 // 281474976710656 AS batch,
               epoch_us(ts) AS us
        FROM events),
      wm AS (
        SELECT batch, MAX(mx) OVER (ORDER BY batch
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        FROM (SELECT batch, MAX(us) AS mx FROM e GROUP BY batch)),
      c AS (SELECT us, wm FROM e JOIN wm USING (batch))
      SELECT CASE WHEN wm IS NULL OR us >= wm THEN 'a_on_time'
                  WHEN wm - us <= 86400::BIGINT * 1000000 THEN 'b_late_1d'
                  WHEN wm - us <= 2592000::BIGINT * 1000000 THEN 'c_late_30d'
                  ELSE 'd_late_gt_30d' END AS bucket,
             COUNT(*) AS n,
             MAX(CASE WHEN wm > us THEN wm - us ELSE 0 END) AS max_late_us
      FROM c GROUP BY 1 ORDER BY 1"""))

  /** Min/max time-series decimation — how a billion-point series becomes
    * a few thousand renderable/alertable points without losing its
    * envelope: per (series, coarse bucket) keep exactly the extreme
    * observations (the row holding the bucket's max value and the row
    * holding its min), everything else drops. Deterministic ties
    * (value, then earliest ts, then event_id) keep the output
    * hash-gateable.
    *
    * Scale shape: one shuffle on (type, bucket) — per-partition window
    * state is one bucket's rows; output is 2 rows per bucket regardless
    * of input density, so downstream cost is ∝ time-span, not events.
    * (A plain min/max AGGREGATE would lose WHICH row was extreme — the
    * decimated series keeps real observations with their timestamps,
    * which is what rendering and alert backtesting need.) */
  val decimate: GQuery = GQuery(
    "e_decimate",
    "min/max decimation: per type x 6h-bucket keep only the extreme observations",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val b = e.select(col("event_type"),
        expr("(ts div 21600000000000) * 21600").as("bucket_epoch"),
        expr("ts div 1000").as("ts_us"), col("value"), col("event_id"))
      val part = Window.partitionBy(col("event_type"), col("bucket_epoch"))
      val ranked = b.select(col("event_type"), col("bucket_epoch"),
        col("ts_us"), col("value"), col("event_id"),
        row_number().over(part.orderBy(col("value").desc, col("ts_us"),
          col("event_id"))).as("rmax"),
        row_number().over(part.orderBy(col("value").asc, col("ts_us"),
          col("event_id"))).as("rmin"))
      val keep = (kind: String, rk: Column) => ranked.filter(rk === 1)
        .select(col("event_type"), col("bucket_epoch"), lit(kind).as("kind"),
          col("ts_us"), col("value"), col("event_id"))
      keep("max", col("rmax")).unionAll(keep("min", col("rmin")))
        .orderBy(col("event_type"), col("bucket_epoch"), col("kind"))
    },
    Some("""
      WITH b AS (
        SELECT event_type,
               (epoch_ns(ts) // 21600000000000) * 21600 AS bucket_epoch,
               epoch_ns(ts) // 1000 AS ts_us, value, event_id
        FROM events),
      ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_epoch
                 ORDER BY value DESC, ts_us, event_id) AS rmax,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket_epoch
                 ORDER BY value ASC, ts_us, event_id) AS rmin
        FROM b)
      SELECT event_type, bucket_epoch, 'max' AS kind, ts_us, value, event_id
      FROM ranked WHERE rmax = 1
      UNION ALL
      SELECT event_type, bucket_epoch, 'min' AS kind, ts_us, value, event_id
      FROM ranked WHERE rmin = 1
      ORDER BY event_type, bucket_epoch, kind"""))

  /** Consecutive-day activity streaks — the gaps-and-islands pattern on
    * the integer day grid (the session twin [[sessionize]] works on a
    * continuous time gap instead). Island key = day − row_number(): any
    * run of consecutive days collapses to one constant, so streak
    * membership falls out of one per-user window pass with NO self-join.
    *
    * Distribution: distinct (user, day) is a two-phase aggregate; the
    * window shuffles once on user_id with per-user state (streaming-
    * compatible keying); the streak histogram is a tiny final aggregate.
    * Everything is linear in events at any corpus size. */
  val streaks: GQuery = GQuery(
    "e_streaks",
    "gaps-and-islands: consecutive-active-day streak histogram",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val days = e.select(col("user_id"),
        expr("ts div 86400000000000").as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days
        .withColumn("isl", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("len"))
        .agg(count(lit(1)).as("n_streaks"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("len"))
    },
    Some("""
      WITH days AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events),
      isl AS (SELECT user_id,
                     day - ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY day) AS isl
              FROM days),
      streak AS (SELECT user_id, isl, COUNT(*) AS len
                 FROM isl GROUP BY user_id, isl)
      SELECT len, COUNT(*) AS n_streaks,
             COUNT(DISTINCT user_id) AS n_users
      FROM streak GROUP BY len ORDER BY len"""))

  /** Hourly resample + linear gap interpolation per user — the
    * time-series regularization step (sensor/metric pipelines: turn an
    * irregular event stream into a dense grid a model can consume).
    * Per user: the hourly grid spans first..last observed hour
    * (sequence explode — fanout bounded by the span, never a global
    * calendar), observed hours carry their exact fix6 value sum, and
    * missing hours interpolate linearly between the nearest observed
    * neighbors via IGNORE NULLS carry windows (the as-of pattern, both
    * directions, per-user partitions — no global sort).
    *
    * Determinism: observed values live on the 1e-6 grid (dsum); the
    * interpolation `prev + (next−prev)·Δh/span` is a fixed-shape IEEE
    * expression — bit-identical per row on any engine — and the result
    * is floor-quantized to fix6 BEFORE the per-user total, so the audit
    * sums are exact BIGINTs. Output is the per-user audit (n_hours,
    * n_obs, n_filled, series total), one row per user. */
  val interpolate: GQuery = GQuery(
    "e_interpolate",
    "hourly resample with linear gap interpolation: per-user audit",
    // Work is ∝ OBSERVED (user, hour) rows, never the time-span grid: the
    // round-4 form materialized users × full hour range (131 M rows at the
    // 10× replica — 215 s) to interpolate each missing hour individually.
    // A linear gap's hourly values sum in closed form — for a gap of g
    // missing hours between observations (h_p, pv) and (h_n, nv) with
    // d = h_n - h_p:  Σ = g·pv + (nv-pv)·(g(g+1)/2)/d — so one lead()
    // over observed rows replaces the grid entirely. Each gap contribution
    // is fix6-quantized as ONE term (the grid form quantized per hour;
    // same 1e-6 grain, and the oracle computes the identical expression so
    // the gate stays exact). n_hours is pure arithmetic: hmax - hmin + 1.
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = Catalog.table(spark, dir, "events")
        .groupBy(col("user_id"), expr("ts div 3600000000000").as("h"))
        .agg(dsum(col("value")).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      hourly
        .select(col("user_id"), col("h"), col("v"),
          lead(col("h"), 1).over(w).as("nh"),
          lead(col("v"), 1).over(w).as("nv"))
        .select(col("user_id"), col("h"), col("v"),
          fix6(col("v")).as("obs6"),
          when(col("nh") > col("h") + 1,
            fix6((col("nh") - col("h") - 1).cast("double") * col("v") +
              (col("nv") - col("v")) *
                (((col("nh") - col("h") - 1) * (col("nh") - col("h")) / 2L)
                  .cast("double") / (col("nh") - col("h")).cast("double"))))
            .otherwise(0L).as("gap6"),
          when(col("nh").isNotNull, col("nh") - col("h") - 1)
            .otherwise(0L).as("gapn"))
        .groupBy(col("user_id"))
        .agg((max(col("h")) - min(col("h")) + 1L).as("n_hours"),
          count(lit(1)).as("n_obs"),
          sum(col("gapn")).as("n_filled"),
          (sum(col("obs6") + col("gap6")).cast("double") / 1000000.0d)
            .as("series_total"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH hourly AS (
        SELECT user_id, epoch_ns(ts) // 3600000000000 AS h,
               ${dsumSql("value")} AS v
        FROM events GROUP BY user_id, h),
      led AS (
        SELECT user_id, h, v,
               LEAD(h) OVER (PARTITION BY user_id ORDER BY h) AS nh,
               LEAD(v) OVER (PARTITION BY user_id ORDER BY h) AS nv
        FROM hourly),
      terms AS (
        SELECT user_id, h, v,
               ${fix6Sql("v")} AS obs6,
               CASE WHEN nh > h + 1 THEN ${fix6Sql(
      "CAST(nh - h - 1 AS DOUBLE) * v + (nv - v) * (CAST((nh - h - 1) * (nh - h) // 2 AS DOUBLE) / CAST(nh - h AS DOUBLE))")}
                    ELSE 0 END AS gap6,
               CASE WHEN nh IS NOT NULL THEN nh - h - 1 ELSE 0 END AS gapn
        FROM led)
      SELECT user_id, MAX(h) - MIN(h) + 1 AS n_hours,
             COUNT(*) AS n_obs,
             CAST(SUM(gapn) AS BIGINT) AS n_filled,
             CAST(CAST(SUM(obs6 + gap6) AS BIGINT) AS DOUBLE) / 1000000.0
               AS series_total
      FROM terms
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Cohort lifetime-value matrix: users grouped by first-activity week
    * (their cohort), then per weeks-since-cohort age: how many are still
    * active and what they spend. The canonical growth-analytics pivot
    * input (cohort × age), and the curation analog of "contribution of
    * each crawl snapshot's new documents over subsequent snapshots".
    * Weekly grain because the fixture spans one month; the month form is
    * the same query with a different trunc unit.
    *
    * Scale shape: the cohort assignment is one groupBy(user) min-week
    * aggregate joined back on user_id — the per-user dimension shuffles
    * once; the LTV matrix is one further two-phase agg on
    * (cohort, age), whose cardinality is weeks² — tiny regardless of
    * data volume. Week starts are exact integer day arithmetic on
    * epoch-us (both engines trunc weeks to Monday); money through dsum
    * (order-free fix6). */
  val cohortLtv: GQuery = GQuery(
    "a_cohort_ltv",
    "cohort-week x weeks-since-cohort active users and revenue",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
        .select(col("user_id"), col("value"),
          trunc(expr("date_add(DATE'1970-01-01', CAST(ts div 86400000000000 AS INT))"),
            "week").as("wk"))
      val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      e.join(cohorts, "user_id")
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("bigint").as("age"))
        .agg(countDistinct(col("user_id")).as("n_active"),
          dsum(col("value")).as("revenue"))
        .orderBy(col("cohort"), col("age"))
    },
    Some(s"""
      WITH e AS (SELECT user_id, value,
                        date_trunc('week', CAST(ts AS DATE)) AS wk
                 FROM events),
      cohorts AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id)
      SELECT CAST(cohort AS DATE) AS cohort,
             CAST(datediff('day', cohort, wk) // 7 AS BIGINT) AS age,
             COUNT(DISTINCT e.user_id) AS n_active,
             ${dsumSql("value")} AS revenue
      FROM e JOIN cohorts ON e.user_id = cohorts.user_id
      GROUP BY cohort, wk
      ORDER BY cohort, age"""))

  /** Range join: each event lands in the value band containing it. With
    * a small band dimension this is the broadcast-nested-loop pattern
    * (scan-parallel, no shuffle of the fact side); banded equi-bucketing
    * is the path when both sides are large. */
  val rangeJoin: GQuery = GQuery(
    "e_range_join",
    "broadcast range join of events into value bands",
    (spark, dir) => {
      import spark.implicits._
      val e = Catalog.table(spark, dir, "events")
      val bands = Seq((0.0, 50.0, "low"), (50.0, 150.0, "mid"),
        (150.0, 1.0e18, "high")).toDF("lo", "hi", "band")
      e.join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("tot"))
        .orderBy(col("band"))
    },
    Some(s"""
      SELECT band, COUNT(*) AS n, ${dsumSql("value")} AS tot
      FROM events
      JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
                   (150.0, 1e18, 'high')) bands(lo, hi, band)
        ON value >= lo AND value < hi
      GROUP BY band
      ORDER BY band"""))

  /** As-of join, composed from existing operators (preference (a) of the
    * custom-operator ladder: Spark has no AsOfJoinExec, but the
    * sorted-carry-forward formulation — one hash shuffle on the key, one
    * in-partition sort, last_value(IGNORE NULLS) — gives the same
    * semantics with windowed state instead of a specialized operator,
    * and scales as a single exchange). Each purchase is matched to the
    * latest signup at-or-before it for the same user. */
  val asofJoin: GQuery = GQuery(
    "e_asof_join",
    "as-of join: each purchase matched to the latest prior signup",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("last_signup_us",
          last(when(col("event_type") === "signup", col("ts_us")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase" && col("last_signup_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matched"),
          max(col("ts_us") - col("last_signup_us")).as("max_lag_us"),
          min(col("ts_us") - col("last_signup_us")).as("min_lag_us"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, COUNT(*) AS n_matched,
             MAX(ts_us - last_signup_us) AS max_lag_us,
             MIN(ts_us - last_signup_us) AS min_lag_us
      FROM (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   LAST_VALUE(CASE WHEN event_type = 'signup'
                                   THEN epoch_us(ts) END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS last_signup_us
            FROM events) t
      WHERE event_type = 'purchase' AND last_signup_us IS NOT NULL
      GROUP BY user_id
      ORDER BY user_id"""))

  /** Last-touch marketing attribution: each purchase is credited to the
    * user's most recent click if one happened within the 7-day lookback,
    * otherwise counted organic; attributed value rolls up per purchase
    * day. Same sorted-carry-forward core as [[asofJoin]] (one hash
    * shuffle on user_id, in-partition sort, last_value IGNORE NULLS) —
    * the attribution WINDOW (7 days) is then a pure row-local compare on
    * the carried timestamp, and the rollup is a tiny per-day aggregate.
    * Value sums go through the fix6 grid ([[graft.util.Num]]) so the
    * per-day doubles hash-match DuckDB exactly. */
  val attribution: GQuery = GQuery(
    "e_attribution",
    "last-touch attribution: purchase value credited to a click <= 7d prior",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lookbackUs = 7L * 86400L * 1000000L
      e.select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("last_click_us",
          last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("attributed",
          col("last_click_us").isNotNull &&
            col("ts_us") - col("last_click_us") <= lookbackUs)
        .groupBy(expr("ts_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("attributed").cast("long")).as("n_attributed"),
          round(dsum(when(col("attributed"), col("value")).otherwise(lit(0.0d))), 6)
            .as("attributed_value"))
        .orderBy(col("day"))
    },
    Some(s"""
      SELECT ts_us // 86400000000 AS day, COUNT(*) AS n_purchases,
             CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_attributed,
             ROUND(${dsumSql("CASE WHEN attributed THEN value ELSE CAST(0 AS DOUBLE) END")}, 6)
               AS attributed_value
      FROM (SELECT event_type, value, ts_us,
                   (last_click_us IS NOT NULL
                    AND ts_us - last_click_us <= 604800000000) AS attributed
            FROM (SELECT event_type, value, epoch_us(ts) AS ts_us, event_id,
                         LAST_VALUE(CASE WHEN event_type = 'click'
                                         THEN epoch_us(ts) END IGNORE NULLS)
                           OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS last_click_us
                  FROM events) t) t2
      WHERE event_type = 'purchase'
      GROUP BY day
      ORDER BY day"""))

  /** Day-over-day retention: of the users active on day d, how many were
    * also active on day d+1. One distinct-(user, day) projection, then a
    * self-equi-join on user with a day offset — both sides shuffle once
    * on the same key. */
  val retention: GQuery = GQuery(
    "e_retention",
    "day-over-day active-user retention",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val days = e.select(col("user_id"),
          expr("ts div 86400000000000").as("day")).distinct()
      days.as("a")
        .join(days.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.day") === col("a.day") + 1, "left_outer")
        .groupBy(col("a.day").as("day"))
        .agg(count(lit(1)).as("active"),
          count(col("b.user_id")).as("retained"))
        .orderBy(col("day"))
    },
    Some("""
      WITH days AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day
                    FROM events)
      SELECT a.day AS day, COUNT(*) AS active, COUNT(b.user_id) AS retained
      FROM days a LEFT OUTER JOIN days b
        ON a.user_id = b.user_id AND b.day = a.day + 1
      GROUP BY a.day
      ORDER BY day"""))

  // ------------------------------------------------------------ sessionize
  /** Gap-based sessionization (30-min inactivity): lag + running flag-sum.
    * One shuffle keyed by user_id; window state is per-user and streaming-
    * friendly (same keying a mapGroupsWithState would use). */
  val sessionize: GQuery = GQuery(
    "e_sessionize",
    "30-min-gap sessionization: per-user session and event counts",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      // ts is BIGINT epoch-nanos (see Catalog.table); truncate to micros to
      // match DuckDB's us-precision timestamps exactly.
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      e.select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_id"))
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM (SELECT user_id,
                   CASE WHEN prev_us IS NULL
                             OR epoch_us(ts) - prev_us > 1800 * 1000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM (SELECT user_id, ts,
                         LAG(epoch_us(ts)) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                  FROM events) t) s
      GROUP BY user_id
      ORDER BY user_id"""))

  // ------------------------------------------------------------ hourly stats
  /** Tumbling 1-hour windows x event_type: the batch twin of a streaming
    * windowed aggregation (same keys a watermarked groupBy would use). */
  val hourlyStats: GQuery = GQuery(
    "e_hourly_stats",
    "tumbling-hour x type: counts and exact value sums",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.groupBy(
          expr("(ts div 3600000000000) * 3600").as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("tot_value"))
        .orderBy(col("hour_epoch"), col("event_type"))
    },
    Some(s"""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             event_type, COUNT(*) AS n, ${dsumSql("value")} AS tot_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_epoch, event_type"""))

  // ------------------------------------------------------------ json extract
  /** Semi-structured extraction: pull props.$.k out of the JSON payload
    * column and aggregate it — scan-parallel projection, one shuffle. */
  val jsonExtract: GQuery = GQuery(
    "e_json_extract",
    "JSON field extraction + per-type aggregate of extracted values",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, COUNT(k) AS n_with_k,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type"""))

  // ------------------------------------------------------------ funnel
  /** Signup -> purchase funnel: per-user first-signup vs first-later-
    * purchase, one grouped pass (conditional min aggregates, no self-join). */
  val funnel: GQuery = GQuery(
    "e_funnel",
    "signup->purchase conversion via conditional min-timestamp aggregates",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val perUser = e.groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", expr("ts div 1000"))).as("first_signup"),
          min(when(col("event_type") === "purchase", expr("ts div 1000"))).as("first_purchase"))
      perUser.agg(
          count(col("first_signup")).as("n_signed_up"),
          count(when(col("first_purchase") > col("first_signup"), lit(1))).as("n_converted"))
    },
    Some("""
      SELECT COUNT(first_signup) AS n_signed_up,
             COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
      FROM (SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
                   MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
            FROM events GROUP BY user_id) t"""))

  /** Ordered multi-step funnel with per-step deadlines: first signup →
    * first click STRICTLY AFTER it within 3 days → first purchase
    * strictly after that click within 3 days. Unlike [[funnel]] (which
    * only compares unconditioned minima), each step's candidate events
    * are gated on the PREVIOUS step's timestamp, so the steps must
    * resolve sequentially.
    *
    * Scale shape: one staged aggregate per step — filter the event type,
    * equi-join user_id against the (shrinking) prior-step table, keep
    * in-deadline events, take the min. Every join is key-co-partitioned
    * on user_id (the same single exchange reused stage to stage; the
    * prior-step table only shrinks), no windows, no per-user event
    * arrays. */
  val funnelSteps: GQuery = GQuery(
    "e_funnel_steps",
    "3-step ordered funnel (signup->click->purchase) with 3-day deadlines",
    (spark, dir) => {
      val ddl = 3L * 86400L * 1000000L
      val e = Catalog.table(spark, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("s"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts_us") > col("s") && col("ts_us") - col("s") <= ddl)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("c"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts_us") > col("c") && col("ts_us") - col("c") <= ddl)
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("p"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_click_3d")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase_3d")))
    },
    Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      s1 AS (SELECT user_id, MIN(ts_us) AS s FROM e
             WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(ts_us) AS c
             FROM e JOIN s1 ON e.user_id = s1.user_id
             WHERE event_type = 'click' AND ts_us > s AND ts_us - s <= 259200000000
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(ts_us) AS p
             FROM e JOIN s2 ON e.user_id = s2.user_id
             WHERE event_type = 'purchase' AND ts_us > c AND ts_us - c <= 259200000000
             GROUP BY e.user_id)
      SELECT (SELECT COUNT(*) FROM s1) AS n_signup,
             (SELECT COUNT(*) FROM s2) AS n_click_3d,
             (SELECT COUNT(*) FROM s3) AS n_purchase_3d"""))

  // ------------------------------------------------------------ top users
  /** Top-10 purchasers by exact spend — TakeOrderedAndProject over one
    * partial+final aggregate. */
  val topUsers: GQuery = GQuery(
    "e_top_users",
    "top-10 users by exact purchase spend",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(dsum(col("value")).as("spend"), count(lit(1)).as("n_purchases"))
        .orderBy(col("spend").desc, col("user_id"))
        .limit(10)
    },
    Some(s"""
      SELECT user_id, ${dsumSql("value")} AS spend, COUNT(*) AS n_purchases
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
      ORDER BY spend DESC, user_id
      LIMIT 10"""))

  /** Interval (event-time) join: every purchase within 30 minutes AFTER a
    * click by the same user — the batch twin of the stream-stream interval
    * join in [[graft.streaming.StreamOps.clickPurchaseJoin]] (differential
    * proof in DifferentialSpec). Equi-key on user_id carries the shuffle;
    * the time band is a residual filter on the joined pairs, so at 100 TB
    * this is one hash exchange per side, no range-partitioning needed.
    * The streaming form bounds state by watermark + the 30-minute band. */
  val intervalJoin: GQuery = GQuery(
    "e_interval_join",
    "click->purchase pairs within 30 minutes, per-user counts",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val bandNs = 30L * 60L * 1000000000L
      val c = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"), col("value"))
      c.join(p, col("user_id") === col("p_uid") &&
          col("p_ts") >= col("c_ts") && col("p_ts") < col("c_ts") + bandNs)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"), dsum(col("value")).as("tot_value"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      SELECT c.user_id, COUNT(*) AS n_pairs, ${dsumSql("p.value")} AS tot_value
      FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
       AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
      GROUP BY c.user_id
      ORDER BY c.user_id"""))

  /** CDC-style upsert compaction: per entity keep only the LATEST record
    * (max event time, ties to highest event_id) — the "current state"
    * materialization every changelog-consuming pipeline runs. The
    * row_number window is NOT a full per-partition sort at scale: Spark's
    * WindowGroupLimit pushes the rank<=1 limit below the sort as a
    * partial+final group-limit, so each task retains one row per key
    * before any shuffle (pinned in PlanSpec). At 100 TB this is one
    * key-shuffle of pre-compacted partials — the same shape as a MAX
    * aggregate. */
  val upsertCompact: GQuery = GQuery(
    "e_upsert_compact",
    "latest record per entity (CDC changelog -> current state)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_type"), col("event_id"), col("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
      e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts_us"), col("event_type"), col("event_id"),
          col("value"))
        .orderBy(col("user_id"))
    },
    Some("""
      SELECT user_id, ts_us, event_type, event_id, value
      FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
            FROM events) t
      WHERE rn = 1
      ORDER BY user_id"""))

  /** Time-series anomaly detection: per event type, flag hours whose
    * count deviates ≥2σ from the trailing-24-observation baseline.
    * Determinism discipline: the window moments are INTEGER sums (S, Q
    * over BIGINT counts, exact under any accumulation order), and the
    * z-score is one closed-form IEEE expression over those integers —
    * engine-identical, so even a 2.0000001σ edge case hashes equal. The
    * frame is rows-based (24 trailing observations, not wall-hours):
    * gap-tolerant and identically defined on both engines; rows with
    * fewer than 24 predecessors are not scored. Scale: one shuffle on
    * event_type for the hourly rollup, then a per-key sorted window —
    * state is 24 integers per key regardless of corpus size. */
  val anomalyZscore: GQuery = GQuery(
    "e_anomaly_zscore",
    "hours whose event count deviates >=2 sigma from the trailing-24h baseline",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val hourly = e
        .select(col("event_type"),
          expr("(ts div 1000) div 3600000000").as("hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-24, -1)
      val d = (c: Column) => c.cast("double")
      val scored = hourly
        .withColumn("s", sum(col("c")).over(w))
        .withColumn("q", sum(col("c") * col("c")).over(w))
        .withColumn("k", count(lit(1)).over(w))
        .filter(col("k") === 24)
      val varE = (lit(24.0) * d(col("q")) - d(col("s")) * d(col("s"))) /
        (lit(24.0) * lit(23.0))
      scored
        // zero-variance baselines are unscorable (and ANSI-mode division
        // errors): integer guard identical on both engines
        .filter(lit(24L) * col("q") - col("s") * col("s") > 0L)
        // filter on the UNROUNDED z (exactly as the oracle does), round
        // only for output — rounding first would keep/drop rows in
        // [1.9999995, 2.0) differently across engines
        .withColumn("z_raw", (d(col("c")) - d(col("s")) / 24.0d) / sqrt(varE))
        .filter(abs(col("z_raw")) >= 2.0d)
        .withColumn("z", round(col("z_raw"), 6))
        .select(col("event_type"), col("hour"), col("c"), col("z"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      scored AS (
        SELECT event_type, hour, c,
               SUM(c) OVER w AS s,
               SUM(c * c) OVER w AS q,
               COUNT(*) OVER w AS k
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      SELECT event_type, hour, c,
             ROUND((CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / 24.0) /
                   sqrt((24.0 * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
                        (24.0 * 23.0)), 6) AS z
      FROM scored
      WHERE k = 24
        AND 24 * q - s * s > 0
        AND ABS((CAST(c AS DOUBLE) - CAST(s AS DOUBLE) / 24.0) /
                sqrt((24.0 * CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
                     (24.0 * 23.0))) >= 2.0
      ORDER BY event_type, hour"""))

  // ------------------------------------------------------------ SCD2
  /** Slowly-Changing-Dimension Type-2 build from an event log: collapse
    * each user's consecutive same-event_type runs (gaps-and-islands) into
    * versioned rows with [valid_from, valid_to) validity and an is_current
    * flag — the standard dimension-table maintenance op a warehouse runs
    * over CDC/event feeds (Kimball SCD2; the batch twin of
    * e_upsert_compact's latest-row compaction).
    *
    * Distribution shape: every window is PARTITIONED BY user_id — state
    * for one key only, never a global sort; the run-collapse is one
    * key-partitioned shuffle, the version numbering rides the same
    * partitioning. At 100 TB this is the same per-key-window cost as
    * sessionization. The user_id < 20 slice only bounds the *output* (a
    * pushed-down scan predicate), not the algorithm. */
  val scd2: GQuery = GQuery(
    "e_scd2",
    "SCD type-2 versioned history of per-user event_type runs (users 0-19)",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val runs = e
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("chg",
          when(col("prev_type").isNull || col("prev_type") =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("grp", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val vers = runs.groupBy(col("user_id"), col("grp"), col("event_type"))
        .agg(min(col("ts_us")).as("valid_from_us"), count(lit(1)).as("n_events"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("grp"))
      vers
        .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
        .select(col("user_id"), col("grp").as("version"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"),
          col("valid_to_us").isNull.as("is_current"), col("n_events"))
        .orderBy(col("user_id"), col("version"))
    },
    Some("""
      WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
                 FROM events WHERE user_id < 20),
      r AS (SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL
                             OR LAG(event_type) OVER w <> event_type
                           THEN 1 ELSE 0 END AS chg
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      g AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
            FROM r),
      v AS (SELECT user_id, grp, event_type,
                   MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
            FROM g GROUP BY user_id, grp, event_type),
      s AS (SELECT *, LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY grp) AS valid_to_us
            FROM v)
      SELECT user_id, CAST(grp AS BIGINT) AS version, event_type,
             valid_from_us, valid_to_us,
             valid_to_us IS NULL AS is_current, n_events
      FROM s
      ORDER BY user_id, version"""))

  // ------------------------------------------------------------ sliding windows
  /** Sliding-window statistics (1 h window, 15 min slide): each event
    * expands to the window_len/slide = 4 window slots that contain it
    * (integer bucket arithmetic on the epoch-nanos BIGINT — no timestamp
    * rounding to diverge on), then ONE keyed aggregate. The expansion
    * factor is the only cost over tumbling windows, and map-side partial
    * aggregation collapses each (slot, type) per task before the
    * shuffle — the standard batch twin of a streaming sliding window at
    * any scale. Partial windows at the corpus edges are kept (the same
    * semantics Spark's own `window(ts, len, slide)` emits). */
  val slidingStats: GQuery = GQuery(
    "e_sliding_stats",
    "sliding 1h/15min window x type: counts and exact value sums",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      e.select(col("event_type"), col("value"),
          expr("ts div 900000000000").as("b"))
        .select(col("event_type"), col("value"),
          explode(expr("sequence(b - 3, b)")).as("s"))
        .groupBy((col("s") * 900).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("tot_value"))
        .orderBy(col("win_start"), col("event_type"))
    },
    Some(s"""
      SELECT s * 900 AS win_start, event_type, COUNT(*) AS n,
             ${dsumSql("value")} AS tot_value
      FROM (SELECT event_type, value,
                   unnest(generate_series(b - 3, b)) AS s
            FROM (SELECT event_type, value,
                         epoch_ns(ts) // 900000000000 AS b
                  FROM events) t1) t2
      GROUP BY 1, 2
      ORDER BY win_start, event_type"""))

  // ------------------------------------------------------------ transitions
  /** First-order Markov transition matrix over each user's event stream:
    * next event via LEAD on a user-partitioned window ((ts, event_id)
    * order — tie-stable), transition counts, and the per-source-state
    * probability in exact integer permille. The per-key window is the
    * sessionize scale shape (never a global sort); the transition table
    * itself is |event_types|² rows, driver-tiny at any corpus size —
    * the behavioral-model fit a product-analytics engine ships. */
  val markovTransitions: GQuery = GQuery(
    "e_markov_transitions",
    "per-user event-type transition counts with integer-permille probabilities",
    (spark, dir) => {
      val e = Catalog.table(spark, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val c = e.withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("p_pm", expr(
          "(1000 * n) div sum(n) OVER (PARTITION BY from_type)"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS next_type
        FROM events),
      c AS (SELECT event_type AS from_type, next_type AS to_type,
                   COUNT(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             (1000 * n) // CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
               AS p_pm
      FROM c
      ORDER BY from_type, to_type"""))
}

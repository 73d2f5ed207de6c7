package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every capability in SURVEY §2 (and the north-star extension layer) is a
  * named entry in [[Registry]]; this object just adapts the registry to the
  * driver's shape. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q01_pricing_summary").run(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. Every entry
    * runs through the small-plan single-shot gate
    * ([[graft.plans.AdaptiveGate]]) — the engine's execution-mode
    * decision is part of the contract surface, so the correctness gate
    * verifies the gated path, not a different one. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> tuned(q)).toMap

  /** Per-query exec-conf overrides applied last round, with the values
    * they displaced — restored before the next body so one query's
    * overrides never leak into another's execution (same discipline as
    * the gate's own marker conf). Driver mains run queries sequentially
    * in one session, so a plain var suffices. */
  private var prevExecConf: Map[String, Option[String]] = Map.empty

  private[graft] def tuned(q: GQuery): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      // restore the session's own conf BEFORE every body: queries that
      // execute jobs eagerly during construction (localCheckpoint,
      // layout/store writes) must never inherit the PREVIOUS plan's
      // single-shot conf (round-7 verdict item 3) — nor a previous
      // query's execConf overrides
      prevExecConf.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
      prevExecConf = Map.empty
      graft.plans.AdaptiveGate.reset(spark)
      val df = q.run(spark, dir)
      if (!q.needsAqe) graft.plans.AdaptiveGate.tune(spark, df)
      // applied AFTER the body: eager build-time work (localCheckpoint
      // stages) runs under session defaults; only the remaining plan's
      // EXECUTION (physical planning happens at first action) sees the
      // overrides
      if (q.execConf.nonEmpty && q.execConfIf.forall(_(spark))) {
        prevExecConf = q.execConf.keys
          .map(k => k -> spark.conf.getOption(k)).toMap
        q.execConf.foreach { case (k, v) => spark.conf.set(k, v) }
      }
      df
    }

  /** Eagerly put back any execConf overrides left by the most recent
    * tuned() invocation. Driver mains call this after a query's ACTION
    * completes, so the session never carries a query-specific conf (e.g.
    * `spark.sql.codegen.wholeStage=false`) into unrelated follow-on work —
    * the r12 advisor flagged that the last registry query's overrides
    * otherwise persist until the next tuned() call or session end. */
  def restore(spark: SparkSession): Unit = {
    prevExecConf.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    prevExecConf = Map.empty
  }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}

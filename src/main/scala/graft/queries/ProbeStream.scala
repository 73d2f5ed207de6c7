package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Stream-semantics probe (diagnostic main, NOT part of the driver
  * surface): replays the late-data layout through one of the stateful
  * streaming ops with progress capture, printing per-batch watermark /
  * input-count / event-time stats from the progress log. This is the
  * measurement tool behind the late-replay oracles' lagged-horizon
  * arithmetic — Spark 3.4+ splits the watermark into a late-event filter
  * horizon (batch N-1's) and an eviction horizon (batch N's), and the
  * only safe way to author an oracle against that split is to read the
  * progress line, not the docs (the first cut of s_late_data assumed one
  * watermark and was measurably wrong; r9). Generalized from the r9
  * single-query throwaway for the r10 dedup/sessionize late variants.
  *
  * usage: ProbeStream <sfDir> <op: hourly|dedup|sessionize> [delaySeconds]
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeStream <sfDir> <hourly|dedup|sessionize> [delaySeconds]")
    val dir = args(0)
    val op = args(1)
    val delayS = args.lift(2).map(_.toLong).getOrElse(86400L)
    val spark = graft.GraftSession.get()
    import spark.implicits._

    val data = StreamRuns.lateReplayRoot(spark, dir) + "/data"
    println(s"[probe] data=$data files=${new java.io.File(data).list().sorted.mkString(",")}")
    val schema = spark.read.parquet(data).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(data)
    val out = op match {
      case "hourly" => graft.streaming.StreamOps.hourlyStats(src, s"$delayS seconds")
      case "dedup" =>
        graft.streaming.StreamOps.dedupByKey(
          src.withColumn("event_key", concat_ws("|",
            col("user_id"), col("event_type"),
            expr("ts_us div 3600000000"))),
          s"$delayS seconds")
      case "sessionize" =>
        graft.streaming.StreamOps.sessionize(
          src.select(col("user_id"), col("ts_us"), col("event_type"),
            col("value")).as[graft.streaming.StreamOps.Ev],
          gapMinutes = 30, delay = s"$delayS seconds").toDF()
      case other => sys.error(s"unknown op $other")
    }
    val ckpt = TextOps.trackedTempDir("graft-probestream-ckpt-")
    val sq = out.writeStream.format("memory").queryName("probe_sink")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    sq.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"eventTime=${p.eventTime}")
    }
    val sink = spark.table("probe_sink")
    println(s"[probe] sink rows: ${sink.count()}")
    op match {
      case "dedup" =>
        val real = sink.filter(col("user_id") >= 0L)
        println(s"[probe] real emits: ${real.count()}, distinct keys: " +
          real.select(col("event_key")).distinct().count())
      case "sessionize" =>
        val real = sink.filter(col("user_id") >= 0L)
        println(s"[probe] sessions: ${real.count()}, users: " +
          real.select(col("user_id")).distinct().count() +
          ", events: " + real.agg(sum(col("n_events"))).head().getLong(0))
      case _ => ()
    }
    spark.stop()
  }
}

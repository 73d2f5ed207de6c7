package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Throwaway diagnostic for the s_late_data replay: runs the same
  * bounded file stream inline and prints per-batch watermark /
  * input-count / eventTime stats from the progress log, so the drop
  * semantics are pinned against what the engine actually does. */
object DebugLate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val delayS = args.lift(1).map(_.toLong).getOrElse(690171L)
    val spark = graft.GraftSession.get()
    // build the late layout via the registry query once (cachedLayout)
    val root = "/tmp/" // not used; layout key is internal
    val _ = root
    // run the registry query once so the layout exists
    val q = graft.Registry.byName("s_late_data")
    println(s"[dbg] registry rows: ${q.run(spark, dir).count()}")

    // now re-run the raw stream with progress capture
    val dataDirs = new java.io.File("/tmp").listFiles()
      .filter(f => f.getName.startsWith("graft-layout-slatereplay"))
    println(s"[dbg] candidate layout dirs: ${dataDirs.map(_.getName).mkString(",")}")
    val data = TextOps.cachedLayout("slatereplay", dir) { _ => () } + "/data"
    println(s"[dbg] data=$data files=${new java.io.File(data).list().sorted.mkString(",")}")
    val schema = spark.read.parquet(data).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(data)
    val ckpt = TextOps.trackedTempDir("graft-dbglate-ckpt-")
    val sq = graft.streaming.StreamOps.hourlyStats(src, s"$delayS seconds")
      .writeStream.format("memory").queryName("dbg_late_sink")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    sq.recentProgress.foreach { p =>
      println(s"[dbg] batch=${p.batchId} rows=${p.numInputRows} " +
        s"eventTime=${p.eventTime}")
    }
    println(s"[dbg] sink rows: ${spark.table("dbg_late_sink").count()}")
    spark.stop()
  }
}

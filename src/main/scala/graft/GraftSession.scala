package graft

import org.apache.spark.sql.SparkSession

/** Session construction for the graft engine.
  *
  * Mirrors the operational surface of the reference's `SessionBuilder`
  * (reference: src/flight_service/session_builder.rs:9-111) — programmatic
  * session building with engine-pinned config — expressed Spark-natively as a
  * thin layer over `SparkSession.builder`.
  *
  * Config choices are scale-oriented, not demo-oriented:
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *    broadcast-join demotion are exactly the knobs that keep a plan healthy
  *    when the same code runs at 100 TB.
  *  - shuffle.partitions matches local cores here; on a real cluster this is
  *    a deploy-time setting (AQE coalesces down from it).
  *  - UTC session timezone so results are reproducible against any oracle.
  */
object GraftSession {

  /** Default parallelism for the local test harness. */
  def defaultCpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(cpus: Int = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .appName("graft")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")

  /** Build (or reuse) the engine session, with graft-native functions
    * registered (≡ the reference's per-request SessionBuilder hook,
    * reference: src/flight_service/do_get.rs:100-113). */
  def get(cpus: Int = defaultCpus): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}

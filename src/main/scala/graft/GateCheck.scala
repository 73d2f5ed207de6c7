package graft

/** Prints the simhash interpreted-tail gate decision (and the execConf
  * actually applied by the driver-contract layer) for a data dir —
  * validates the r13 size gate at each replica scale without inferring
  * the regime from timings alone. usage: GateCheck <sfDir> */
object GateCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val key = "spark.sql.codegen.wholeStage"
    val before = spark.conf.get(key)
    SparkEntry.queries("t_simhash_neardup")(spark, dir)
    println(s"[gatecheck] dir=$dir docBytes=${Catalog.tableBytes(dir, "documents")}")
    println(s"[gatecheck] graft.simhash.interpretedTail=" +
      spark.conf.getOption("graft.simhash.interpretedTail").getOrElse("<unset>"))
    println(s"[gatecheck] $key: $before -> ${spark.conf.get(key)}")
    SparkEntry.restore(spark)
    spark.stop()
  }
}

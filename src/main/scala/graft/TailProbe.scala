package graft

/** A/B probe for execution-regime confs on named registry queries (r12
  * verdict item 5): times each query under the session defaults and under
  * the supplied conf overrides, same JVM, alternating, so the JFR-found
  * interpreted-tail rule (high-fanout codegen loops buffering their whole
  * expansion as UnsafeRow copies) can be tested on OTHER expansion-shaped
  * queries before generalizing it.
  *
  * usage: TailProbe <sfDir> <q1,q2,...> [k=v;k=v ...] [iters]
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TailProbe <sfDir> <q1,q2,...> [k=v;k=v] [iters]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val conf: Map[String, String] = args.lift(2)
      .getOrElse("spark.sql.codegen.wholeStage=false")
      .split(";").map(_.trim).filter(_.nonEmpty).map { kv =>
        require(kv.contains("="), s"bad conf entry: $kv")
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for (name <- names) {
      val q = Registry.byName(name)
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      q.run(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      val (base, alt) = (1 to iters).map { _ =>
        // alternate within the same window so drift hits both arms
        val b = timeOnce()
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val a = timeOnce()
        saved.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
        (b, a)
      }.unzip
      val line = f"[tailprobe] $name%-22s base_min=${base.min}%9.1f ms  alt_min=${alt.min}%9.1f ms  alt/base=${alt.min / base.min}%5.2f  (conf: ${conf.map { case (k, v) => s"$k=$v" }.mkString(";")})"
      println(line)
      lines += line
      GraftSession.releaseQueryState(spark)
    }
    println("[tailprobe] ==== summary ====")
    lines.foreach(println)
    spark.stop()
  }
}

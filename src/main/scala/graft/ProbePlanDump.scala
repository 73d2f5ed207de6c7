package graft

/** Scratch diagnostic: print the normalized physical plan of one registry
  * query at a given dir. usage: ProbePlanDump <sfDir> <query> */
object ProbePlanDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
    val spark = GraftSession.get()
    val df = Registry.byName(name).run(spark, dir)
    println("[plandump] ==== " + name)
    println(graft.plans.PlanDescriber.simpleString(df).linesIterator
      .map(l => "[plandump] " + l).mkString("\n"))
  }
}

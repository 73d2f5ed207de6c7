package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry path: multi-statement scripts through the session — parity
  * with the reference's primary entry point (`ctx.sql(...)` per statement,
  * reference: tests/tpch.rs:175) including the q15-style 3-statement
  * create-view / select / drop-view flow the reference special-cases
  * (reference: benchmarks/src/tpch/run.rs:186-199; splitter
  * benchmarks/src/tpch/mod.rs:148-161). Spark handles the DDL natively,
  * so the whole script runs through one code path and q15 needs no skip.
  */
object GraftSql {

  /** Split a SQL script on top-level ';' (quote-aware — a ';' inside a
    * string literal does not split; ≡ mod.rs:148-161's splitter plus the
    * quoting the reference's corpus never needed). */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < script.length) {
      val c = script.charAt(i)
      c match {
        case '\'' =>
          cur.append(c)
          if (inQuote && i + 1 < script.length && script.charAt(i + 1) == '\'') {
            cur.append('\''); i += 1 // '' is an escaped quote inside a literal
          } else inQuote = !inQuote
        case ';' if !inQuote =>
          out += cur.toString; cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Execute every statement in order; return the LAST result that
    * produces rows (≡ run.rs:186-199, which keeps the middle SELECT of
    * the q15 flow — generalized to "last rowful statement"). */
  def runScript(spark: SparkSession, script: String): DataFrame = {
    val dfs = splitStatements(script).map(spark.sql)
    dfs.reverse.find(_.schema.nonEmpty).getOrElse(dfs.last)
  }
}

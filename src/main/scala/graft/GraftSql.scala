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

  /** Split a SQL script on top-level ';' (quote- and comment-aware: a ';'
    * inside a string literal, a `--` line comment, or a `/* */` block
    * comment does not split — ≡ mod.rs:148-161's splitter plus the
    * quoting/commenting the reference's corpus never needed; external
    * scripts fed through runScript routinely carry comments). */
  def splitStatements(script: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    val n = script.length
    def at(j: Int, c: Char): Boolean = j < n && script.charAt(j) == c
    while (i < n) {
      val c = script.charAt(i)
      if (!inQuote && c == '-' && at(i + 1, '-')) {
        // line comment: copy verbatim through end-of-line (Spark accepts it)
        while (i < n && script.charAt(i) != '\n') { cur.append(script.charAt(i)); i += 1 }
      } else if (!inQuote && c == '/' && at(i + 1, '*')) {
        // block comment, nestable (both engines nest /* */)
        var depth = 0
        do {
          if (script.charAt(i) == '/' && at(i + 1, '*')) { depth += 1; cur.append("/*"); i += 2 }
          else if (script.charAt(i) == '*' && at(i + 1, '/')) { depth -= 1; cur.append("*/"); i += 2 }
          else { cur.append(script.charAt(i)); i += 1 }
        } while (i < n && depth > 0)
      } else {
        c match {
          case '\'' =>
            cur.append(c)
            if (inQuote && at(i + 1, '\'')) {
              cur.append('\''); i += 1 // '' is an escaped quote inside a literal
            } else inQuote = !inQuote
          case ';' if !inQuote =>
            out += cur.toString; cur.clear()
          case other => cur.append(other)
        }
        i += 1
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(s => s.nonEmpty && !isCommentOnly(s))
  }

  /** True when a segment contains nothing but comments/whitespace — such
    * a segment (e.g. a trailing `-- done` after the final ';') is not a
    * statement and would make spark.sql throw a ParseException. */
  private def isCommentOnly(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        var depth = 0
        do {
          if (i + 1 < n && s.charAt(i) == '/' && s.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (i + 1 < n && s.charAt(i) == '*' && s.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        } while (i < n && depth > 0)
      } else return false
    }
    true
  }

  /** Execute every statement in order; return the LAST result that
    * produces rows (≡ run.rs:186-199, which keeps the middle SELECT of
    * the q15 flow — generalized to "last rowful statement"). */
  def runScript(spark: SparkSession, script: String): DataFrame = {
    val dfs = splitStatements(script).map(spark.sql)
    dfs.reverse.find(_.schema.nonEmpty).getOrElse(dfs.last)
  }
}

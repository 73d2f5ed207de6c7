package graft

import java.nio.file.{Files, Paths}

/** Write `oracle_sql.json` (the [[SparkEntry.oracleSql]] map) WITHOUT
  * running any query — the DuckDB anchor only needs the SQL text, and
  * the full `graft.Verify` run that also produces this file happens much
  * later in the ritual than the anchor's same-window DuckDB timing slot
  * (which sits at the center of the bench interleave, see
  * tools/round_artifacts.sh step [3]).
  *
  * usage: OracleDump <outDir>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: OracleDump <outDir>")
    val dir = Paths.get(args(0))
    Files.createDirectories(dir)
    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.writeString(dir.resolve("oracle_sql.json"), json)
    println(s"[oracledump] ${SparkEntry.oracleSql.size} oracle entries -> " +
      dir.resolve("oracle_sql.json"))
  }
}

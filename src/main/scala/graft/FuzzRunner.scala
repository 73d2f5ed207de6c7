package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Spark half of the differential fuzz harness: executes each generated
  * query (tools/gen_fuzz.py, name<TAB>single-line-SQL TSV) with
  * `spark.sql` over the registered fixture views and dumps Verify-shaped
  * output — per-query parquet + an oracle_sql.json whose "oracle" is the
  * IDENTICAL query text — so `tools/check_oracles.py` applies the same
  * pandas-canonicalized comparator the driver uses. Because both engines
  * evaluate the same SQL, a mismatch here is a genuine cross-engine
  * semantic divergence, which generalizes the reference's fixed-corpus
  * differential testing (reference: tests/tpch.rs:168-194) to an
  * unbounded generated corpus.
  *
  * usage: sbt "runMain graft.FuzzRunner <sfDir> <queriesTsv> <outDir>"
  */
object FuzzRunner {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: FuzzRunner <sfDir> <queriesTsv> <outDir>")
    val Array(sfDir, tsv, outDir) = args
    val spark = GraftSession.get()
    Catalog.registerAll(spark, sfDir)
    val queries = Files.readAllLines(Paths.get(tsv)).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        require(i > 0, s"malformed fuzz line: $line")
        (line.substring(0, i), line.substring(i + 1))
      }
    val out = new java.io.File(outDir)
    // same ownership guard as Verify: never recursively delete a dir
    // that is not provably a prior run's dump
    if (out.exists()) {
      val children = Option(out.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      if (children.isEmpty || children.exists(f =>
        f.getName == "oracle_sql.json" || f.getName == ".graft-verify")) {
        def rm(f: java.io.File): Unit = {
          // listFiles returns null on I/O error / concurrent removal
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(out)
      }
    }
    out.mkdirs()
    Files.writeString(Paths.get(s"$outDir/.graft-verify"), "fuzz-run\n")
    var failed = List.empty[String]
    queries.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[fuzz] $name failed to execute: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      queries.map { case (n, s) => s"${q(n)}: ${q(s)}" }
        .mkString("{", ",", "}"))
    require(failed.isEmpty,
      s"fuzz queries failed to EXECUTE on Spark (dialect bug in the " +
        s"generator, fix gen_fuzz.py): ${failed.sorted.mkString(", ")}")
    spark.stop()
  }
}

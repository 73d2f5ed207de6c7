package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the driver-contract bench line (r14, VERDICT r13 item 1): the
  * adjudicating driver keeps only the LAST ~2000 characters of the sbt
  * run's combined output and parses the JSON object it finds there.
  * Thirteen rounds of BENCH_r*.json carried `parsed: null` because the
  * line was ~1.9 KB, `[info] `-prefixed, and one long epilogue away from
  * truncation. The contract this spec enforces:
  *   - the line is under 500 characters for the full 204-query registry,
  *   - it is one physical line of valid JSON with the required fields
  *     (metric/value/unit/queries/nq/failed/sf — and the 22 TPC-H keys
  *     that every previous round's `queries` map carried, never removed
  *     or renamed),
  *   - it survives the driver's tail window: appending a worst-case sbt
  *     epilogue and slicing the last 2000 chars still yields the whole
  *     object, extractable by the obvious "last line starting with '{'"
  *     rule. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Representative full-registry result set: 22 TPC-H keys plus 182
    * other registry entries (the r13 registry size), worst-case-ish
    * values (3-digit seconds, one failed query reporting None). */
  private val tpchKeys = (1 to 22).map(i => f"q$i%02d_some_long_query_name")
  private val otherKeys = (1 to 182).map(i => f"t_registry_query_$i%03d")
  private val results: Seq[(String, Option[Double])] =
    (tpchKeys.map(k => k -> Option(123.456)) ++
      otherKeys.map(k => k -> Option(9.876))).updated(30, otherKeys.head -> None)

  private def line = Bench.compactLine(
    total = 1234.567,
    perQuery = results,
    nq = 204,
    nFailed = 1,
    iterations = 3,
    sfDir = "/root/testdata/sf0.1",
    detailPath = "/tmp/graft_bench_detail.json")

  test("compact line is a single line under 500 characters") {
    assert(!line.contains("\n"))
    assert(line.length < 500, s"line is ${line.length} chars:\n$line")
  }

  test("compact line is valid JSON with the contract fields") {
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(math.abs(node.get("value").asDouble() - 1234.567) < 1e-3)
    assert(node.get("nq").asInt() == 204)
    assert(node.get("failed").asInt() == 1)
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    val qs = node.get("queries")
    // the 22 TPC-H keys of every previous round's map, none removed/renamed
    (1 to 22).foreach { i =>
      val k = f"q$i%02d"
      assert(qs.has(k), s"missing $k in $qs")
    }
    assert(qs.size() == 22)
  }

  test("line survives the driver's 2000-char tail window after an sbt epilogue") {
    // worst-case-ish combined-output tail: late Spark WARN spam on stderr,
    // then the contract line, then sbt's epilogue
    val spam = ("26/08/18 09:46:29 WARN WindowExec: No Partition Defined " +
      "for Window operation! Moving all data to a single partition.\n") * 20
    val epilogue =
      "[success] Total time: 536 s (08:56), completed Aug 18, 2026, 9:47:22 AM\n"
    val combined = spam + line + "\n" + epilogue
    val tail = combined.takeRight(2000)
    // the whole object must be inside the window
    assert(tail.contains(line), "contract line truncated by the tail window")
    // and extractable by the obvious rule: last line that starts with '{'
    val extracted = tail.linesIterator.toSeq.reverse
      .find(_.trim.startsWith("{")).get.trim
    assert(extracted == line)
    assert(mapper.readTree(extracted).get("nq").asInt() == 204)
  }

  test("None timings serialize as null, not as a dropped key") {
    val withNullQ = Bench.compactLine(1.0,
      Seq("q01_x" -> None, "q02_y" -> Option(0.5)), 2, 1, 3, "sf", "d")
    val qs = mapper.readTree(withNullQ).get("queries")
    assert(qs.has("q01") && qs.get("q01").isNull)
    assert(qs.get("q02").asDouble() == 0.5)
  }
}

package graft

import graft.functions.Aggregators
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the pure kernels (no Spark session needed —
  * these are the laws the distributed versions rely on). */
object PropertySpec extends Properties("graft.kernels") {

  property("fix6 quantization is order/partitioning independent") =
    forAll(Gen.listOf(Gen.chooseNum(-1e9, 1e9)), Gen.chooseNum(1, 7)) {
      (xs: List[Double], k: Int) =>
        def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
        val whole = xs.map(q).sum
        val parts = xs.grouped(k).map(_.map(q).sum).sum
        whole == parts
    }

  property("GraftSql splitter loses no statements") =
    forAll(Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumStr.map(s => s"SELECT $s"),
        Gen.alphaNumStr.map(s => s"SELECT 'a;$s'"),
        Gen.const("SELECT 'it''s; quoted'")))) { stmts =>
      GraftSql.splitStatements(stmts.mkString(";")) ==
        stmts.map(_.trim).filter(_.nonEmpty)
    }

  property("KMin merge is commutative, bounded, equals model") =
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) {
      (a: List[Long], b: List[Long]) =>
        val agg = Aggregators.KMin(5)
        val ba = a.foldLeft(agg.zero)(agg.reduce)
        val bb = b.foldLeft(agg.zero)(agg.reduce)
        val m1 = agg.merge(ba, bb)
        val m2 = agg.merge(bb, ba)
        m1 == m2 && m1.size <= 5 && m1 == (a ++ b).distinct.sorted.take(5)
    }

  property("universal minhash variant stays in [0, P)") = {
    val P = 1000000007L
    forAll(Gen.chooseNum(0L, P - 1), Gen.chooseNum(0, 15)) { (v: Long, s: Int) =>
      val h = (v * (2 * s + 1) + s * 7919) % P
      h >= 0 && h < P
    }
  }
}

package graft.queries

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native ngram_hv60(text, n) expression must reproduce, ORDERED and
  * value-for-value, each of the three legacy interpreted gram pipelines
  * it replaced (t_substr_runs / t_dup_ngrams n=8 slice+array_join form,
  * t_contamination n=5 concat_ws form, t_winnow n=3 element-indexing
  * form). Those pipelines are what the DuckDB oracles mirror, so ordered
  * equality here transfers the oracle proof to the native kernel.
  * Empty-token, multi-byte, short-doc and NULL edges included. */
class NgramHvSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and more tokens here"),
    (2L, "a b c d"), // < 5 and < 8 tokens
    (3L, "a b c d e f g h"), // exactly 8 tokens: one 8-gram
    (4L, "x y z x y z x y z x y"), // repeats: order (not set) must match
    (5L, "double  space and trailing space padded out to length "), // empties
    (6L, " leading space here too plus filler words to cross eight"),
    (7L, ""), // split('',' ') = [""]: 1 token, no grams at any n
    (8L, "unicode tökens säme spāce handling éè plus ascii tail words"),
    (9L, (1 to 40).map(i => s"w$i").mkString(" ")),
    (10L, null.asInstanceOf[String]) // NULL text → NULL array
  ).toDF("doc_id", "text")

  private val h60 = (e: String) =>
    s"cast(conv(substring(md5(cast($e as binary)), 1, 15), 16, 10) as bigint)"

  /** Legacy ordered pipelines, one per consumer form. All CASE-guarded
    * because sequence(1, 0) counts DOWN instead of emitting empty. */
  private def legacy(n: Int): String = n match {
    case 8 => // t_substr_runs / t_dup_ngrams form: slice + array_join
      s"""CASE WHEN size(split(text, ' ')) >= 8
            THEN transform(sequence(1, size(split(text, ' ')) - 7),
                   i -> ${h60("array_join(slice(split(text, ' '), i, 8), ' ')")})
            ELSE cast(array() as array<bigint>) END"""
    case 5 => // t_contamination form: concat_ws over a slice
      s"""CASE WHEN size(split(text, ' ')) >= 5
            THEN transform(sequence(1, size(split(text, ' ')) - 4),
                   i -> ${h60("concat_ws(' ', slice(split(text, ' '), i, 5))")})
            ELSE cast(array() as array<bigint>) END"""
    case 3 => // t_winnow form: 0-based element indexing
      s"""CASE WHEN size(split(text, ' ')) >= 3
            THEN transform(sequence(0, size(split(text, ' ')) - 3), i ->
                   ${h60("concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1], split(text, ' ')[i+2])")})
            ELSE cast(array() as array<bigint>) END"""
  }

  private def collect(d: DataFrame, n: Int): (Map[Long, Seq[Long]], Map[Long, Seq[Long]]) = {
    graft.functions.GraftFunctions.register(spark)
    val native = d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr(s"ngram_hv60(text, $n)").as("hv"))
      .as[(Long, Seq[Long])].collect().toMap
    val leg = d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr(legacy(n)).as("hv"))
      .as[(Long, Seq[Long])].collect().toMap
    (native, leg)
  }

  for (n <- Seq(3, 5, 8))
    test(s"ngram_hv60(text, $n) matches the legacy pipeline, ordered") {
      val (native, leg) = collect(docs, n)
      assert(native.keySet === leg.keySet)
      for ((id, hv) <- leg)
        assert(native(id) === hv, s"n=$n doc $id: native ${native(id)} != legacy $hv")
      assert(native(7L).isEmpty) // 1 empty token: no grams
      assert(native(9L).size === 40 - n + 1)
    }

  test("NULL text yields a NULL array; n wider than any doc yields empty") {
    graft.functions.GraftFunctions.register(spark)
    val nullRow = docs.filter(col("doc_id") === 10L)
      .select(expr("ngram_hv60(text, 8)")).collect()
    assert(nullRow.head.isNullAt(0))
    val wide = docs.filter(col("doc_id") === 1L)
      .select(expr("ngram_hv60(text, 999)")).as[Seq[Long]].collect()
    assert(wide.head.isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    val (gen, _) = collect(docs, 8)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (interp, _) = collect(docs, 8)
      assert(interp === gen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("winnow_fp(hs, 4) matches the legacy winnowing pipeline, ordered") {
    graft.functions.GraftFunctions.register(spark)
    val legacyFp =
      """array_distinct(transform(sequence(0, size(hs) - 4), j ->
           concat(cast(array_min(slice(hs, j + 1, 4)) as string), ':',
                  cast(j + 4 - array_position(reverse(slice(hs, j + 1, 4)),
                       array_min(slice(hs, j + 1, 4))) as string))))"""
    // synthetic hash arrays: ties inside a window (rightmost-min rule),
    // strictly increasing, strictly decreasing, plateau, minimal length
    val arrs = Seq(
      Seq(5L, 3L, 3L, 9L, 1L, 1L, 7L, 2L),
      (1L to 12L),
      (12L to 1L by -1L),
      Seq(4L, 4L, 4L, 4L, 4L),
      Seq(8L, 6L, 7L, 5L) // exactly one window
    ).map(_.toSeq)
    val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "hs")
    val both = df.select(col("id"),
        expr("winnow_fp(hs, 4)").as("native"), expr(legacyFp).as("legacy"))
      .as[(Long, Seq[String], Seq[String])].collect()
    both.foreach { case (id, n, l) => assert(n === l, s"arr $id") }
    // and over real text-derived hs for every fixture doc in `docs`
    val real = docs.filter(col("text").isNotNull)
      .select(expr("ngram_hv60(text, 3)").as("hs"))
      .filter(size(col("hs")) >= 4)
      .select(expr("winnow_fp(hs, 4)").as("native"), expr(legacyFp).as("legacy"))
      .as[(Seq[String], Seq[String])].collect()
    assert(real.nonEmpty)
    real.foreach { case (n, l) => assert(n === l) }
    // shorter than one window: empty
    val short = Seq((0L, Seq(1L, 2L, 3L))).toDF("id", "hs")
      .select(expr("winnow_fp(hs, 4)")).as[Seq[String]].collect()
    assert(short.head.isEmpty)
  }

  test("winnow_hv(hs, 4) == (size(winnow_fp), sorted distinct h of winnow_fp)") {
    // the r14 struct kernel must derive exactly from the winnow_fp
    // pipeline it replaces in t_winnow: n_fp is the distinct-fingerprint
    // count, hv the ascending distinct hash values (split(f,':')[0])
    graft.functions.GraftFunctions.register(spark)
    val arrs = Seq(
      Seq(5L, 3L, 3L, 9L, 1L, 1L, 7L, 2L),
      (1L to 12L),
      (12L to 1L by -1L),
      Seq(4L, 4L, 4L, 4L, 4L), // plateau: one distinct hash, several positions
      Seq(8L, 6L, 7L, 5L),
      Seq(1L, 2L) // shorter than one window: (0, [])
    ).map(_.toSeq)
    val df = arrs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("id", "hs")
      .unionByName(docs.filter(col("text").isNotNull)
        .select(col("doc_id").as("id"),
          expr("ngram_hv60(text, 3)").as("hs")))
    val both = df.select(col("id"),
        expr("winnow_hv(hs, 4).n_fp").as("n_fp"),
        expr("winnow_hv(hs, 4).hv").as("hv"),
        expr("winnow_fp(hs, 4)").as("fps"))
      .as[(Long, Int, Seq[Long], Seq[String])].collect()
    assert(both.nonEmpty)
    both.foreach { case (id, nFp, hv, fps) =>
      assert(nFp === fps.size, s"id $id n_fp")
      val expect = fps.map(_.split(":")(0).toLong).distinct.sorted
      assert(hv === expect, s"id $id hv")
    }
  }

  test("ngram_hv60(text, 3) distinct-sorted equals shingle_hv60(text)") {
    // the two kernels must agree on the shared 3-gram substrate
    graft.functions.GraftFunctions.register(spark)
    val both = docs.filter(col("text").isNotNull)
      .select(
        expr("array_sort(array_distinct(ngram_hv60(text, 3)))").as("a"),
        expr("array_sort(shingle_hv60(text))").as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (a, b) => assert(a === b) }
  }
}

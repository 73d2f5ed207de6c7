package graft.queries

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The native shingle_hv60 expression must reproduce the composable
  * shingle pipeline it replaced value-for-value: same single-space
  * tokenization (empty tokens kept), same 3-token shingles re-joined
  * with ' ', same 60-bit md5-prefix hash per DISTINCT shingle. The
  * composable pipeline is the one the DuckDB minhash oracles mirror, so
  * set-equality here transfers the oracle proof to the native kernel.
  * (Output order differs by design — native is ascending, legacy is
  * first-occurrence — so both sides compare sorted.) */
class ShingleHvSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b"), // < 3 tokens: no shingles
    (3L, "a b c"), // exactly one shingle
    (4L, "x y z x y z x y z"), // repeated shingles: distinct must collapse
    (5L, "double  space and trailing space "), // empty tokens: inner + trailing
    (6L, " leading space here too"), // empty first token
    (7L, ""), // split('', ' ') = [""], 1 token: no shingles
    (8L, "unicode tökens säme spāce handling éè"), // multi-byte UTF-8
    (9L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (10L, null.asInstanceOf[String]) // NULL text → NULL array
  ).toDF("doc_id", "text")

  private val legacyHv =
    """array_sort(array_distinct(transform(
         CASE WHEN size(split(text, ' ')) < 3 THEN array()
              ELSE array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
                     i -> array_join(slice(split(text, ' '), i + 1, 3), ' '))) END,
         sh -> cast(conv(substring(md5(cast(sh as binary)), 1, 15), 16, 10) as bigint))))"""

  private def collectMaps(d: DataFrame): (Map[Long, Seq[Long]], Map[Long, Seq[Long]]) = {
    graft.functions.GraftFunctions.register(spark)
    val native = d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("array_sort(shingle_hv60(text))").as("hv"))
      .as[(Long, Seq[Long])].collect().toMap
    val legacy = d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr(legacyHv).as("hv"))
      .as[(Long, Seq[Long])].collect().toMap
    (native, legacy)
  }

  test("shingle_hv60 matches the legacy composable pipeline per doc") {
    val (native, legacy) = collectMaps(docs)
    assert(native.keySet === legacy.keySet)
    for ((id, hv) <- legacy)
      assert(native(id) === hv, s"doc $id: native ${native(id)} != legacy $hv")
    assert(native(2L).isEmpty && native(7L).isEmpty)
    assert(native(3L).size === 1)
    assert(native(4L).size === 3) // 7 shingle positions, 3 distinct rotations
    // NULL text must yield a NULL array (row then drops at explode)
    graft.functions.GraftFunctions.register(spark)
    val nullRow = docs.filter(col("doc_id") === 10L)
      .select(expr("shingle_hv60(text)")).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    val (gen, _) = collectMaps(docs)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (interp, _) = collectMaps(docs)
      assert(interp === gen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("fixture cross-check: minhash pairs unchanged in shape on sf0.001") {
    // the real gate is the DuckDB oracle at sf0.01; this is the fast
    // in-suite smoke that the rewired signature pipeline still verifies
    // pairs (jacc bounds, ordering contract) end to end
    val d = graft.Catalog.table(spark, sf0001, "documents")
    val pairs = TextOps.minhashPairs(d.select(col("doc_id"), col("text")), 0.5)
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }
}

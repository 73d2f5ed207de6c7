package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float-array columns.
  *
  * The composable form (`aggregate(zip_with(...))`) allocates an
  * intermediate array and evaluates a lambda per element; this expression
  * is a single fused loop with whole-stage codegen — the preference order
  * the build follows (native Expression > lambda chain > UDF). The
  * reference proves the analogous extension point with a custom operator
  * + codec (reference: tests/custom_extension_codec.rs:159-263); in Spark
  * the equivalent surface is an Expression registered through
  * SparkSessionExtensions — no wire codec needed, the class is on every
  * executor's classpath.
  *
  * Semantics bit-match the composable form: sequential left-fold double
  * accumulation of dot and both norms on equal-length inputs, and NULL on
  * mismatched lengths (zip_with null-pads the shorter side, which nulls
  * the aggregate) — so a malformed embedding surfaces as a detectable
  * null, never as a plausible-looking truncated similarity.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = (double) $a.getFloat($i);
            double $yv = (double) $b.getFloat($i);
            $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Engine function registry: makes graft-native expressions callable from
  * SQL / `expr(...)` (≡ the reference's SessionBuilder UDF hook,
  * reference: src/flight_service/session_builder.rs:10-13). */
object GraftFunctions {
  private val fns: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (cs: Seq[Expression]) => CosineSim(cs(0), cs(1))),
    ("damerau_levenshtein",
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "damerau_levenshtein"),
      (cs: Seq[Expression]) => DamerauLevenshtein(cs(0), cs(1))),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (cs: Seq[Expression]) => SimHash60(cs(0))),
    ("shingle_hv60",
      new ExpressionInfo(classOf[ShingleHv60].getName, "shingle_hv60"),
      (cs: Seq[Expression]) => ShingleHv60(cs(0))),
    ("ngram_hv60",
      new ExpressionInfo(classOf[NgramHv60].getName, "ngram_hv60"),
      (cs: Seq[Expression]) => NgramHv60(cs(0), cs(1))),
    ("winnow_fp",
      new ExpressionInfo(classOf[WinnowFp].getName, "winnow_fp"),
      (cs: Seq[Expression]) => WinnowFp(cs(0), cs(1))),
    ("winnow_hv",
      new ExpressionInfo(classOf[WinnowHv].getName, "winnow_hv"),
      (cs: Seq[Expression]) => WinnowHv(cs(0), cs(1))),
    ("token_counts",
      new ExpressionInfo(classOf[TokenCounts].getName, "token_counts"),
      (cs: Seq[Expression]) => TokenCounts(cs(0), cs(1))))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    fns.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    // engine optimizer rules ride the same idempotent hook (every session
    // entry point already calls register): fold filters over inlined tiny
    // dims so their broadcast builds stay job-free (see FoldLocalFilters),
    // and plan LocalRelations with the job-free broadcast-collect node
    // (see DriverLocalScan)
    val extra = spark.experimental.extraOptimizations
    val rules = Seq(graft.plans.FoldLocalFilters, graft.plans.OnePartitionSort)
      .filterNot(extra.contains(_))
    if (rules.nonEmpty)
      spark.experimental.extraOptimizations = extra ++ rules
    val strats = spark.experimental.extraStrategies
    if (!strats.contains(graft.plans.DriverLocalScan))
      spark.experimental.extraStrategies = strats :+ graft.plans.DriverLocalScan
  }

  /** Builder-time injection for `withExtensions` / spark.sql.extensions. */
  def inject(ext: SparkSessionExtensions): Unit = {
    fns.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.FoldLocalFilters)
    ext.injectOptimizerRule(_ => graft.plans.OnePartitionSort)
    ext.injectPlannerStrategy(_ => graft.plans.DriverLocalScan)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}

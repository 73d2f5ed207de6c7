package graft.errors

import org.apache.spark.SparkException
import org.apache.spark.sql.AnalysisException

/** Typed error taxonomy surfaced by the engine — the parity target for the
  * reference's full DataFusionError round-trip over the wire (reference:
  * src/errors/mod.rs:17-45 recovers 19 typed variants across gRPC, with
  * per-domain sub-codecs in src/errors/arrow_error.rs, parquet_error.rs,
  * io_error.rs, parser_error.rs, schema_error.rs, objectstore_error.rs).
  * Spark propagates executor exceptions to the driver natively; this layer
  * classifies them into the engine's own stable taxonomy and preserves the
  * root message (≡ tests/error_propagation.rs:48-66, which asserts the
  * original message survives three network hops).
  *
  * Shape: four FAMILIES (planning / data / execution / internal — the
  * r1-r10 taxonomy, still the match targets for coarse handling) refined
  * into typed leaves a user can catch individually, mirroring the
  * reference's per-domain variants: parse vs analysis vs schema-mismatch
  * vs parquet-corruption vs missing-file vs arithmetic vs cast vs
  * overflow vs invalid-index vs user-code vs configuration. Every leaf
  * carries `kind` (stable wire string) and the classification is driven
  * by Spark 4's own error-condition names (`SparkThrowable.getCondition`)
  * where one exception CLASS covers several conditions — e.g.
  * SparkArithmeticException is DIVIDE_BY_ZERO and ARITHMETIC_OVERFLOW. */
sealed abstract class GraftError(val kind: String, message: String,
    cause: Throwable) extends RuntimeException(message, cause) {

  /** Enclosing causal-context frames, outermost first — the parity
    * target for the reference's nested Context/Collection wrappers
    * (src/errors/datafusion_error.rs:21-61), which hand the user the
    * full causal chain rather than just root message + top cause.
    * Two sources: labels pushed by [[GraftError.context]] scopes (query
    * name, stage, operator), and the intermediate Spark wrapper messages
    * between the caught throwable and its root cause. Set once during
    * classification; empty when there was no enclosing context. */
  private var ctx: List[String] = Nil
  def contexts: Seq[String] = ctx
  private[errors] def withContexts(cs: List[String]): this.type = {
    ctx = cs; this
  }
  private[errors] def pushContext(label: String): this.type = {
    ctx = label :: ctx; this
  }
}

// ------------------------------------------------------------- planning
/** Query is malformed / refers to missing tables/columns. */
sealed class PlanningError(msg: String, cause: Throwable,
    k: String = "planning") extends GraftError(k, msg, cause)

/** SQL text failed to parse (reference: src/errors/parser_error.rs). */
final class ParseError(msg: String, cause: Throwable)
  extends PlanningError(msg, cause, "planning.parse")

/** Query parsed but failed analysis: unknown column/table/function,
  * type-check failure (reference: DataFusionError::Plan). */
final class AnalysisError(msg: String, cause: Throwable)
  extends PlanningError(msg, cause, "planning.analysis")

// ----------------------------------------------------------------- data
/** Input data unreadable or schema-incompatible. */
sealed class DataError(msg: String, cause: Throwable,
    k: String = "data") extends GraftError(k, msg, cause)

/** Declared/requested schema conflicts with the file's physical types
  * (reference: src/errors/schema_error.rs). */
final class SchemaMismatchError(msg: String, cause: Throwable)
  extends DataError(msg, cause, "data.schema")

/** File bytes are not valid parquet / footer corrupt (reference:
  * src/errors/parquet_error.rs). */
final class ParquetCorruptionError(msg: String, cause: Throwable)
  extends DataError(msg, cause, "data.parquet")

/** File or directory vanished / unreadable at scan time (reference:
  * src/errors/io_error.rs, objectstore_error.rs). */
final class IoError(msg: String, cause: Throwable)
  extends DataError(msg, cause, "data.io")

// ------------------------------------------------------------ execution
/** Runtime failure inside distributed execution (root cause preserved). */
sealed class ExecutionError(msg: String, cause: Throwable,
    k: String = "execution") extends GraftError(k, msg, cause)

/** ANSI arithmetic fault: divide by zero, invalid argument domain. */
final class ArithmeticError(msg: String, cause: Throwable)
  extends ExecutionError(msg, cause, "execution.arithmetic")

/** Numeric/decimal overflow under ANSI semantics. */
final class OverflowError(msg: String, cause: Throwable)
  extends ExecutionError(msg, cause, "execution.overflow")

/** ANSI cast/conversion failure (CAST_INVALID_INPUT, bad number/date
  * literals reaching a runtime cast). */
final class CastError(msg: String, cause: Throwable)
  extends ExecutionError(msg, cause, "execution.cast")

/** Out-of-bounds array/element access under ANSI semantics. */
final class InvalidIndexError(msg: String, cause: Throwable)
  extends ExecutionError(msg, cause, "execution.index")

/** User code (UDF/UDAF/mapPartitions) threw; the user's own message is
  * the payload (reference: DataFusionError::External). */
final class UserCodeError(msg: String, cause: Throwable)
  extends ExecutionError(msg, cause, "execution.user")

// ---------------------------------------------------------------- other
/** Invalid engine/session configuration value (reference:
  * DataFusionError::Configuration). */
final class ConfigError(msg: String, cause: Throwable)
  extends GraftError("config", msg, cause)

/** Anything else. */
final class InternalError(msg: String, cause: Throwable)
  extends GraftError("internal", msg, cause)

object GraftError {

  /** Innermost non-Spark-wrapper cause (task failures arrive wrapped in
    * layers of SparkException). */
  @annotation.tailrec
  def rootCause(t: Throwable): Throwable =
    if (t.getCause != null && t.getCause != t) rootCause(t.getCause) else t

  /** Spark 4 error-condition name when the throwable carries one —
    * the stable discriminator where one exception class covers several
    * faults (SparkArithmeticException ⇒ DIVIDE_BY_ZERO vs
    * ARITHMETIC_OVERFLOW vs INTERVAL_ARITHMETIC_OVERFLOW...). */
  private def condition(t: Throwable): String = t match {
    case st: org.apache.spark.SparkThrowable =>
      Option(st.getCondition).getOrElse("")
    case _ => ""
  }

  /** Leaf classification of a ROOT cause (wrappers already stripped).
    * Order matters: condition names first (most specific), then classes. */
  private def classifyRoot(root: Throwable, top: Throwable): GraftError = {
    val msg = s"${root.getClass.getSimpleName}: ${root.getMessage}"
    val cond = condition(root)
    root match {
      case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        new ParseError(msg, top)
      case a: AnalysisException =>
        new AnalysisError(a.getMessage, top)
      case _: java.io.FileNotFoundException |
           _: java.nio.file.NoSuchFileException =>
        new IoError(msg, top)
      case _ if cond.startsWith("DIVIDE_BY_ZERO") =>
        new ArithmeticError(msg, top)
      case _ if cond.contains("OVERFLOW") ||
        cond.startsWith("NUMERIC_VALUE_OUT_OF_RANGE") ||
        cond.startsWith("DECIMAL_PRECISION_EXCEEDS") =>
        new OverflowError(msg, top)
      case _ if cond.startsWith("CAST_") || cond.contains("NUMBER_FORMAT") ||
        cond.startsWith("CANNOT_PARSE") ||
        root.isInstanceOf[java.time.format.DateTimeParseException] =>
        new CastError(msg, top)
      case _ if cond.startsWith("INVALID_ARRAY_INDEX") ||
        cond.startsWith("INVALID_INDEX") ||
        root.isInstanceOf[ArrayIndexOutOfBoundsException] =>
        new InvalidIndexError(msg, top)
      // parquet corruption surfaces as a plain RuntimeException from the
      // footer reader; match on the reader's stable message shapes
      case r: RuntimeException if r.getMessage != null &&
        (r.getMessage.contains("is not a Parquet file") ||
          r.getMessage.contains("Could not read footer") ||
          r.getMessage.contains("expected magic number")) =>
        new ParquetCorruptionError(msg, top)
      // vectorized parquet reader: requested logical type conflicts with
      // the file's physical type (class name matched to avoid a hard dep
      // on the private[spark] type)
      case r if r.getClass.getSimpleName ==
        "SchemaColumnConvertNotSupportedException" ||
        cond.startsWith("PARQUET_TYPE") ||
        cond.startsWith("UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE") =>
        new SchemaMismatchError(msg, top)
      case _: org.apache.spark.SparkThrowable =>
        new ExecutionError(msg, top)
      // a non-Spark exception that crossed the executor boundary is user
      // code by construction (Spark's own faults are SparkThrowables)
      case _ if top.isInstanceOf[SparkException] =>
        new UserCodeError(msg, top)
      case _ => new InternalError(msg, top)
    }
  }

  /** Classify any engine throwable into the graft taxonomy, preserving the
    * root message across the executor->driver boundary. */
  def classify(t: Throwable): GraftError = t match {
    // driver-side analysis/parse faults arrive unwrapped
    case p: org.apache.spark.sql.catalyst.parser.ParseException =>
      new ParseError(p.getMessage, p)
    case a: AnalysisException => classifyAnalysis(a)
    case s: SparkException =>
      val root = rootCause(s)
      classifyRoot(root, s).withContexts(wrapperChain(s, root))
    case _: IllegalArgumentException
      if t.getMessage != null && t.getMessage.contains("spark.") =>
      new ConfigError(s"${t.getClass.getSimpleName}: ${t.getMessage}", t)
    // Spark 4 raises typed SparkThrowables (arithmetic, cast, overflow...)
    // directly from the execution path without a SparkException wrapper;
    // generic driver-side throwables (e.g. the parquet footer reader's
    // plain RuntimeException) take the same leaf classification
    case other =>
      val root = rootCause(other)
      classifyRoot(root, other).withContexts(wrapperChain(other, root))
  }

  /** AnalysisException covers both true analysis faults and data-access
    * faults raised at planning time (missing path, unreadable store) —
    * split on the error condition so `data.io` means IO everywhere. */
  private def classifyAnalysis(a: AnalysisException): GraftError = {
    val cond = condition(a)
    if (cond.startsWith("PATH_NOT_FOUND") ||
      cond.startsWith("UNABLE_TO_INFER_SCHEMA"))
      new IoError(a.getMessage, a)
    else if (cond.startsWith("INVALID_CONF_VALUE") ||
      cond.startsWith("SQL_CONF"))
      new ConfigError(a.getMessage, a)
    else new AnalysisError(a.getMessage, a)
  }

  /** Run a block, rethrowing as classified engine errors. */
  def wrap[T](body: => T): T =
    try body catch { case t: Throwable if !t.isInstanceOf[GraftError] =>
      throw classify(t)
    }

  /** Intermediate wrapper frames between the surfaced throwable and its
    * root cause, outermost first — e.g. the SparkException("Job aborted")
    * and SparkException("Task failed") layers a task failure crosses on
    * its way to the driver. Messages truncated: Spark wrapper messages
    * can embed whole stack traces. */
  private def wrapperChain(top: Throwable, root: Throwable): List[String] = {
    def abbrev(m: String): String = {
      val one = Option(m).getOrElse("").takeWhile(_ != '\n')
      if (one.length > 160) one.take(157) + "..." else one
    }
    Iterator.iterate(top)(_.getCause)
      .takeWhile(t => t != null && !(t eq root))
      .map(t => s"${t.getClass.getSimpleName}: ${abbrev(t.getMessage)}")
      .toList
  }

  /** Run `body` under a named causal context (query name, stage,
    * operator). A failure escaping the scope carries the label on its
    * [[GraftError.contexts]] chain, outermost label first — nesting
    * scopes builds the full chain, like the reference's
    * `DataFusionError::Context` nesting. Already-classified errors keep
    * their classification and gain the frame. */
  def context[T](label: String)(body: => T): T =
    try body catch {
      case g: GraftError => throw g.pushContext(label)
      case t: Throwable  => throw classify(t).pushContext(label)
    }
}

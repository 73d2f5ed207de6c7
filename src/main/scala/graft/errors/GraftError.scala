package graft.errors

import org.apache.spark.SparkException
import org.apache.spark.sql.AnalysisException

/** Typed error taxonomy surfaced by the engine — the parity target for the
  * reference's full DataFusionError round-trip over the wire (reference:
  * src/errors/mod.rs:17-45 recovers 19 typed variants across gRPC).
  * Spark propagates executor exceptions to the driver natively; this layer
  * classifies them into the engine's own stable taxonomy and preserves the
  * root message (≡ tests/error_propagation.rs:48-66, which asserts the
  * original message survives three network hops).
  */
sealed abstract class GraftError(val kind: String, message: String,
    cause: Throwable) extends RuntimeException(message, cause)

/** Query is malformed / refers to missing tables/columns. */
final class PlanningError(msg: String, cause: Throwable)
  extends GraftError("planning", msg, cause)

/** Input data unreadable or schema-incompatible. */
final class DataError(msg: String, cause: Throwable)
  extends GraftError("data", msg, cause)

/** Runtime failure inside distributed execution (root cause preserved). */
final class ExecutionError(msg: String, cause: Throwable)
  extends GraftError("execution", msg, cause)

/** Anything else. */
final class InternalError(msg: String, cause: Throwable)
  extends GraftError("internal", msg, cause)

object GraftError {

  /** Innermost non-Spark-wrapper cause (task failures arrive wrapped in
    * layers of SparkException). */
  @annotation.tailrec
  def rootCause(t: Throwable): Throwable =
    if (t.getCause != null && t.getCause != t) rootCause(t.getCause) else t

  /** Classify any engine throwable into the graft taxonomy, preserving the
    * root message across the executor->driver boundary. */
  def classify(t: Throwable): GraftError = t match {
    case a: AnalysisException => new PlanningError(a.getMessage, a)
    case s: SparkException =>
      val root = rootCause(s)
      val msg = s"${root.getClass.getSimpleName}: ${root.getMessage}"
      root match {
        case _: java.io.FileNotFoundException => new DataError(msg, s)
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          new PlanningError(msg, s)
        case _ => new ExecutionError(msg, s)
      }
    // Spark 4 raises typed SparkThrowables (arithmetic, cast, overflow...)
    // directly from the execution path without a SparkException wrapper.
    case st: org.apache.spark.SparkThrowable =>
      new ExecutionError(
        s"${t.getClass.getSimpleName}: ${t.getMessage}", t)
    case other => new InternalError(
      s"${other.getClass.getSimpleName}: ${other.getMessage}", other)
  }

  /** Run a block, rethrowing as classified engine errors. */
  def wrap[T](body: => T): T =
    try body catch { case t: Throwable if !t.isInstanceOf[GraftError] =>
      throw classify(t)
    }
}

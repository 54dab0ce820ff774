package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Executor-side, once-per-JVM-per-tag diagnostics backing
  * [[WarnLargeBucket]]. Logging goes through slf4j (lands in the executor
  * stderr Spark already collects) — a warning, never a failure: the
  * uncapped path's exhaustiveness guarantee must hold, the blowup just
  * stops being silent. */
object DiagLog {
  private val fired = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def warnLargeBucket(count: Long, threshold: Long, tag: String): Unit = {
    if (count > threshold && fired.add(tag)) {
      org.slf4j.LoggerFactory.getLogger("graft.Dedup").warn(
        s"[$tag] uncapped blocking bucket holds $count rows (> $threshold): " +
        s"this block alone emits ~${count * (count - 1) / 2} candidate pairs. " +
        "Collapse (near-)exact duplicates upstream with Dedup.exact, or pass " +
        "maxBucketSize > 0 to bound degenerate blocks (trades away the " +
        "exhaustive-recall guarantee for those blocks).")
    }
  }

  private[graft] def reset(): Unit = fired.clear()
  private[graft] def firedTags: Set[String] = {
    import scala.jdk.CollectionConverters._
    fired.asScala.toSet
  }
}

/** Pass-through of `value` that logs a rate-limited executor-side warning
  * when `bucketCount` exceeds `threshold` — the "loud but lossless" half of
  * [[graft.operators.Dedup]]'s bucket-cap dial (round-4 flipped simhash to
  * uncapped for exact pigeonhole recall; this keeps that guarantee while
  * making an n² boilerplate block diagnosable instead of a silent stage
  * sink). Wrapping a column the downstream join consumes keeps the
  * diagnostic alive through column pruning (a dropped side-channel column
  * would be optimized away together with the count that feeds it).
  * Codegen: one static call; the child's result variables are reused, no
  * extra copy. */
case class WarnLargeBucket(value: Expression, bucketCount: Expression,
                           threshold: Long, tag: String)
    extends BinaryExpression {
  override def prettyName: String = "warn_large_bucket"
  override def left: Expression = value
  override def right: Expression = bucketCount
  override def dataType: DataType = value.dataType
  override def nullable: Boolean = value.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (bucketCount.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bucketCount must be LONG, got ${bucketCount.dataType}")

  override def eval(input: InternalRow): Any = {
    val c = bucketCount.eval(input)
    if (c != null) DiagLog.warnLargeBucket(c.asInstanceOf[Long], threshold, tag)
    value.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = value.genCode(ctx)
    val c = bucketCount.genCode(ctx)
    // the tag goes through a reference object, NOT a string literal — the
    // function is SQL-registered, so a tag containing quotes/backslashes
    // must not be interpolated into generated Java source
    val tagRef = ctx.addReferenceObj("warnTag", tag, "java.lang.String")
    val code = code"""
      ${c.code}
      if (!${c.isNull}) {
        graft.functions.DiagLog.warnLargeBucket(${c.value}, ${threshold}L, $tagRef);
      }
      ${v.code}"""
    ev.copy(code = code, isNull = v.isNull, value = v.value)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(value = newLeft, bucketCount = newRight)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency probe into a serialized `CountMinSketch` (the
  * binary produced by Spark's `count_min_sketch` aggregate). Spark
  * ships the mergeable sketch aggregate but no SQL-level estimator —
  * this closes the loop so the whole sketch→merge→probe pipeline stays
  * in the engine (no driver round-trip).
  *
  * Deliberately NOT codegen'd (CodegenFallback): the probe runs on
  * post-aggregation rows — one per group, thousands at most — while
  * the hot path (the sketch build) is Spark's own map-side-combined
  * aggregate. Deserializing per evaluated row is therefore bounded by
  * the group count, not the fact-table size; at 100 TB the fact rows
  * never touch this expression.
  *
  * Determinism: CMS cell updates are counter additions — commutative
  * and associative — so the merged sketch (and hence the estimate) is
  * identical under any partitioning / merge order, given the fixed
  * seed in the aggregate call.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, bigint item), got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    cms.estimateCount(item.asInstanceOf[Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def estimate(sketch: Column, item: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
  }
}

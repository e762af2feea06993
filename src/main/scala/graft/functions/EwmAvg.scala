package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst window function for the pandas
  * `ewm(alpha, adjust=False).mean()` recursion (SURVEY §2.6 W5 — the
  * one aggregate Spark lacks):
  *
  *   y_0 = x_0;  y_t = alpha*x_t + (1-alpha)*y_{t-1}
  *
  * Implemented as a declarative [[AggregateWindowFunction]]: the
  * running EMA is a single double of window-frame state updated by an
  * expression, so the window engine evaluates it in ONE ordered pass
  * per partition — same asymptotics as the reference's C loop, no
  * O(n^2) prefix re-fold, no per-group array. Null inputs carry the
  * previous state unchanged — pandas `ignore_na=True` semantics. The
  * reference's `ewm(alpha, adjust=False)` defaults to ignore_na=False,
  * which decays relative weights across NaN gaps; the two agree
  * exactly on null-free inputs (all current pipelines) and diverge
  * only when the EWM input itself contains nulls.
  *
  * Frame: rows from UNBOUNDED PRECEDING to CURRENT ROW (the running
  * frame every AggregateWindowFunction uses).
  */
case class EwmAvg(child: Expression, alpha: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewm_avg"

  private lazy val ema = AttributeReference("ema", DoubleType)()
  override def aggBufferAttributes: Seq[AttributeReference] = Seq(ema)

  override val initialValues: Seq[Expression] = Seq(Literal(null, DoubleType))

  override val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(
      If(IsNull(child), ema,
        If(IsNull(ema), x,
          Add(Multiply(Literal(alpha), x),
            Multiply(Literal(1.0 - alpha), ema)))))
  }

  override val evaluateExpression: Expression = ema

  override protected def withNewChildInternal(newChild: Expression): EwmAvg =
    copy(child = newChild)
}

object EwmAvg {
  /** Column wrapper with the window spec built directly in catalyst —
    * the running RowFrame(UnboundedPreceding, CurrentRow) a window
    * aggregate requires: `EwmAvg.ewmAvg(col("v"), 0.3, Seq(col("k")),
    * Seq(col("t")))`. */
  def ewmAvg(c: Column, alpha: Double,
             partitionBy: Seq[Column], orderBy: Seq[Column]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val order = orderBy.map(ColumnBridge.expression(_) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    ColumnBridge.column(WindowExpression(
      EwmAvg(ColumnBridge.expression(c), alpha),
      WindowSpecDefinition(
        partitionBy.map(ColumnBridge.expression),
        order,
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftColumnBridge

/** Spark 4.x bridge between the public Column API (ColumnNode-backed
  * since SPARK-44444) and Catalyst Expressions, for wiring custom
  * expressions into the DataFrame DSL. Delegates to a shim in the
  * org.apache.spark.sql namespace because the conversion is
  * `private[sql]` upstream.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = GraftColumnBridge.toColumn(e)
  def toExpression(c: Column): Expression = GraftColumnBridge.toExpression(c)
}

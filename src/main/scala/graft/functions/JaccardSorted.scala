package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact Jaccard similarity of two SORTED, DEDUPLICATED string arrays as
  * one allocation-free merge scan.
  *
  * Spark's `array_intersect` + `array_union` each build a hash set and a
  * result array PER ROW — at ~10⁶ scored pairs/batch that allocation
  * rate dominates GC and caps multi-core scaling. Our value sets are
  * canonically `array_sort(array_distinct(...))` (SURVEY.md §7.4
  * determinism rule), so intersection/union sizes come from a single
  * merge pass with zero allocation.
  *
  * Semantics are bit-identical to
  * size(array_intersect)/size(array_union) on sorted-distinct inputs
  * (integer ratio in double division) — the DuckDB oracle is unchanged.
  */
object JaccardSorted {

  /** Static entry point for generated code. Inputs must be sorted +
    * deduplicated; verified cheap in tests, assumed in the hot path.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    inter.toDouble / union.toDouble
  }

  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.toColumn(JaccardSortedExpr(
      ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))
}

case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSorted.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSorted.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

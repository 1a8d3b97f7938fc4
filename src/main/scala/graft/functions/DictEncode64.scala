package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dictionary-encode a string array to its sorted distinct xxhash64
  * ids as ONE native codegen expression — the hot-loop form of
  * `array_sort(array_distinct(transform(x, xxhash64)))`
  * (Features.dictEncode), whose `transform` HOF is CodegenFallback and
  * whose distinct/sort each allocate per row. The swoosh refine path
  * re-encodes every fused entity's token UNION per round, and every
  * records/catalog build pays it per row.
  *
  * Value-identical to the HOF formulation (NativeFoldSpec pins raw
  * equality): each element hashed with Spark's own XXH64 at the
  * builtin's seed 42, then sorted ascending (signed, = array_sort on
  * longs) and deduplicated — distinct-then-sort and sort-then-unique
  * coincide on sets. Elements must be non-null (every caller feeds
  * canonical value sets).
  */
object DictEncode64 {

  /** Static entry point for generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) m += 1
      i += 1
    }
    val out = new Array[Any](m)
    out(0) = hs(0)
    var j = 1
    i = 1
    while (i < n) {
      if (hs(i) != hs(i - 1)) { out(j) = hs(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  def dictEncode64(values: Column): Column =
    ColumnBridge.toColumn(DictEncode64Expr(ColumnBridge.toExpression(values)))
}

case class DictEncode64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    DictEncode64.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DictEncode64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "dict_encode64"
}

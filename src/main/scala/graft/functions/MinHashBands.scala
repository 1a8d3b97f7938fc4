package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash-LSH band keys as ONE native Catalyst expression.
  *
  * The pure-HOF formulation (transform ∘ aggregate ∘ least ∘ xxhash64,
  * SURVEY.md §4.2) is semantically right but Spark's higher-order
  * functions are CodegenFallback — b×r nested aggregates evaluate
  * interpreted per row, which a thread dump showed dominating the
  * feature stage. This expression does the whole signature in one tight
  * loop: hash each element once, derive the b×r per-hash values by
  * splitmix64 remixing, track minima, emit band keys.
  *
  * Cost: O(|set| × numHashes) long ops per row, no allocation beyond the
  * output; codegen emits a single static call (same pattern as
  * JaroWinkler).
  */
object MinHashBands {

  private def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Static entry point called from generated code. */
  def compute(arr: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nh = bands * rowsPerBand
    val mins = new Array[Long](nh)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // one strong base hash per element; per-hash-function values are
      // independent splitmix64 remixes of it
      val base = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      val base64 = mix64(base.toLong ^ (s.numBytes.toLong << 32))
      var h = 0
      while (h < nh) {
        val v = mix64(base64 ^ (h.toLong * 0xC2B2AE3D27D4EB4FL))
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(40)
    var b = 0
    while (b < bands) {
      // band key = band index + combined hash of its r minima
      var acc = 0x9E3779B97F4A7C15L ^ b.toLong
      var r = 0
      while (r < rowsPerBand) {
        acc = mix64(acc ^ mins(b * rowsPerBand + r))
        r += 1
      }
      sb.setLength(0)
      sb.append("M|").append(b).append('|').append(java.lang.Long.toHexString(acc))
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  def minhashBands(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.toColumn(
      MinHashBandsExpr(ColumnBridge.toExpression(shingles), bands, rowsPerBand))
}

case class MinHashBandsExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashBands.compute(v.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBands.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

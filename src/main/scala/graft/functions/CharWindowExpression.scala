package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Positional sliding-window hashes over a string: xxhash64 (seed 42 —
  * Spark's default, so element i equals `xxhash64(substr(text, i+1, n))`
  * exactly, asserted in spec) of every n-CHARACTER window.
  *
  * This is the kernel of substring-level duplicate detection (the
  * "train-data dedup at span granularity" pass): the composed form —
  * `transform(sequence(...), i -> xxhash64(substr(text, i, n)))` — is an
  * interpreted per-element HOF that MATERIALIZES every n-char window
  * (~n× the corpus in transient strings: a 2,500-char doc becomes ~100 KB
  * of window copies). Here one pass walks the UTF-8 bytes, records the
  * byte offset of each character boundary, and hashes each window's byte
  * range in place — zero string allocation, one array of longs out.
  */
object CharWindowUtil {
  private val Seed = 42L // org.apache.spark.sql.functions.xxhash64 default

  def windowHashes(s: UTF8String, n: Int): ArrayData = {
    val numChars = s.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // byte offset of each character start (UTF-8 is self-synchronizing:
    // the first byte of each code point determines its width)
    val bounds = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (c < numChars) {
      bounds(c) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      c += 1
    }
    bounds(numChars) = s.numBytes()
    val out = new Array[Any](numChars - n + 1)
    var k = 0
    while (k <= numChars - n) {
      out(k) = XXH64.hashUnsafeBytes(
        base, off + bounds(k), bounds(k + n) - bounds(k), Seed)
      k += 1
    }
    new GenericArrayData(out)
  }
}

object CharWindowExpression {

  /** Hashes of all n-char windows; strings shorter than n yield []. */
  case class CharWindowHashes(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "window length must be >= 1")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"char_window_hashes needs string, got $other")
      }
    }

    override def nullSafeEval(s: Any): Any =
      CharWindowUtil.windowHashes(s.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.CharWindowUtil.windowHashes($c, $n)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API. */
  def char_window_hashes(text: Column, n: Int): Column =
    Bridge.toColumn(CharWindowHashes(Bridge.toExpression(text), n))
}

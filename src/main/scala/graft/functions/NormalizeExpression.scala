package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization pass every
  * multilingual training corpus needs before ANY content hashing:
  * decomposed sequences (`e` + U+0301 combining acute) and their
  * precomposed forms (`é` U+00E9) are the same text to a reader but
  * different bytes to md5/MinHash/SimHash, so un-normalized corpora
  * silently miss duplicates across sources that disagree on encoding
  * form (web crawls do).
  *
  * Spark has no built-in for this, so it is a native codegen'd
  * `UnaryExpression` (rung (b) of the custom-op preference order):
  * one static Java call per row into `java.text.Normalizer`, staying
  * inside whole-stage codegen — never a Scala UDF. The fast path is
  * free: `Normalizer.isNormalized` is O(n) with no allocation for the
  * overwhelmingly-already-NFC case, so the expression only pays the
  * decompose/recompose cost on the rows that actually need it.
  */
object NormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object NormalizeExpression {

  /** NFC-normalize a string column. Null-preserving. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"nfc_normalize needs string, got $other")
      }
    }

    override def nullSafeEval(s: Any): Any =
      NormalizeUtil.nfc(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.NormalizeUtil.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API. */
  def nfc_normalize(text: Column): Column =
    Bridge.toColumn(NfcNormalize(Bridge.toExpression(text)))
}

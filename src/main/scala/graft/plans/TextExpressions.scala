package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static implementation the generated code calls (a plain object with
  * no companion class, so the JVM sees `UnicodeNorm.nfc` as a static
  * method). Fast paths keep the common cases allocation-free: pure
  * ASCII (numBytes == numChars) is NFC by definition and returns the
  * input UTF8String untouched, and already-normalized non-ASCII text
  * returns the input after the JDK's quick check. */
object UnicodeNorm {
  def nfc(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) s // pure ASCII ⇒ already NFC
    else {
      val j = s.toString
      if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
    }
  }
}

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step every multilingual corpus needs before
  * fingerprinting or dedup: "é" as U+00E9 and as "e"+U+0301 are the
  * same text but different bytes, so un-normalized corpora leak
  * duplicate near-identical documents past every hash-keyed dedup
  * stage (q30/q32/q33 all key on byte content).
  *
  * Spark has no builtin for this, and the (b)-tier custom-Expression
  * path (SURVEY.md §7.3) beats a UDF: `doGenCode` emits one static
  * call, stays inside whole-stage codegen, and the ASCII fast path
  * never leaves UTF8String. DuckDB's `nfc_normalize` is the exact
  * oracle counterpart.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string, got ${t.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.UnicodeNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** DataFrame-API binding. */
  def col(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}

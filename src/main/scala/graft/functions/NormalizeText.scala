package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_text(s)`: the standard pre-tokenization text canonicalization
  * every corpus pipeline runs before fingerprinting/dedup — Unicode NFC
  * composition (é as one codepoint, not e + combining acute, so visually
  * identical docs hash identically), Unicode lowercasing, and control
  * character removal (C0/C1 + DEL; tab/newline/CR are kept — they are
  * whitespace, not noise).
  *
  * A Catalyst `Expression` (SURVEY §2 custom-op preference (b)): stays
  * inside whole-stage codegen — no UDF serialization boundary, null
  * handling inlined by `nullSafeCodeGen`. The ASCII-only fast path skips
  * the NFC pass entirely (Normalizer.isNormalized is O(n) cheap for
  * ASCII), which is the overwhelmingly common case in a crawled corpus.
  */
object NormalizeText {

  def normalizeText(s: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      NormalizeTextExpr(org.apache.spark.sql.GraftShim.expression(s)))

  /** Kernel body, called from both interpreted eval and generated code. */
  def kernel(s: UTF8String): UTF8String = {
    val raw = s.toString
    val nfc = if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
    else Normalizer.normalize(raw, Normalizer.Form.NFC)
    val lower = lowerNfc(nfc)
    // strip C0 (minus \t\n\r), DEL, and C1 controls in one scan
    var hasControl = false
    var i = 0
    while (i < lower.length && !hasControl) {
      if (isControl(lower.charAt(i))) hasControl = true
      i += 1
    }
    val out = if (!hasControl) lower else {
      val b = new java.lang.StringBuilder(lower.length)
      var j = 0
      while (j < lower.length) {
        val c = lower.charAt(j)
        if (!isControl(c)) b.append(c)
        j += 1
      }
      // stripping can CREATE composable sequences (a control char between
      // a base char and its combining mark blocked composition until now)
      // — re-compose so the NFC postcondition holds on every path
      val stripped = b.toString
      if (Normalizer.isNormalized(stripped, Normalizer.Form.NFC)) stripped
      else Normalizer.normalize(stripped, Normalizer.Form.NFC)
    }
    UTF8String.fromString(out)
  }

  /** Unicode lowercase of an NFC string. `String.toLowerCase` can change
    * length (e.g. İ → i + combining dot) and may de-normalize; re-compose
    * afterwards so the NFC postcondition holds.
    */
  private def lowerNfc(nfc: String): String = {
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    if (Normalizer.isNormalized(lower, Normalizer.Form.NFC)) lower
    else Normalizer.normalize(lower, Normalizer.Form.NFC)
  }

  private def isControl(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') ||
      (c >= 0x7f && c <= 0x9f)
}

case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeText$$.MODULE$$.kernel($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

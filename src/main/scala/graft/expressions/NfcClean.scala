package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning: NFC canonical
  * composition (combining sequences collapse to their precomposed
  * forms, so `e` + U+0301 and `é` hash/dedup/shingle identically)
  * followed by C0/C1-control stripping (NUL, BEL, and friends —
  * crawl-corpus debris that breaks tokenizers; `\t`, `\n`, `\r` are
  * KEPT, they are document structure). Deliberately NFC, not NFKC:
  * compatibility folding (ﬁ → fi, ² → 2) is lossy and belongs to a
  * tokenizer's own normalizer, not the corpus store.
  *
  * A native Expression rather than a UDF (the repo's zero-UDF
  * contract): interpreted and codegen paths share one static kernel,
  * so they are identical by construction; the fast path returns the
  * INPUT UTF8String untouched when nothing changed (the overwhelmingly
  * common case for already-clean ASCII corpora — no allocation, no
  * copy).
  *
  * Registered as SQL `nfc_clean` via
  * [[graft.extensions.GraftExtensions]]; DuckDB replays it as
  * `nfc_normalize` + a control-class regexp_replace (q112).
  */
case class NfcClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_clean expects a string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_clean"

  override def nullSafeEval(input: Any): Any =
    NfcClean.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcClean$$.MODULE$$.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcClean =
    copy(child = newChild)
}

object NfcClean {

  private def isStrippedControl(ch: Char): Boolean =
    (ch < 0x20 && ch != '\t' && ch != '\n' && ch != '\r') || ch == 0x7f ||
      (ch >= 0x80 && ch <= 0x9f)

  /** The shared interpreted/codegen kernel. Returns the input object
    * itself when no rewrite is needed. */
  def clean(s: UTF8String): UTF8String = {
    val str = s.toString
    val normalized =
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) str
      else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    var hasControl = false
    var i = 0
    while (i < normalized.length && !hasControl) {
      if (isStrippedControl(normalized.charAt(i))) hasControl = true
      i += 1
    }
    if (!hasControl) {
      if (normalized eq str) s else UTF8String.fromString(normalized)
    } else {
      val sb = new java.lang.StringBuilder(normalized.length)
      var j = 0
      while (j < normalized.length) {
        val ch = normalized.charAt(j)
        if (!isStrippedControl(ch)) sb.append(ch)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

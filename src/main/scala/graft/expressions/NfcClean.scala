package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning: C0/C1-control
  * stripping (NUL, BEL, and friends — crawl-corpus debris that breaks
  * tokenizers; `\t`, `\n`, `\r` are KEPT, they are document
  * structure) followed by NFC canonical composition (combining
  * sequences collapse to their precomposed forms, so `e` + U+0301 and
  * `é` hash/dedup/shingle identically). Strip-first makes the whole
  * operation idempotent — see [[NfcClean.clean]]. Deliberately NFC,
  * not NFKC:
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
    * itself when no rewrite is needed.
    *
    * Order matters: controls are stripped BEFORE normalization. The
    * reverse is not idempotent — a control sitting between a base
    * char and a combining mark blocks composition on the first pass,
    * and stripping it leaves a newly composable pair for a second
    * pass to find (caught by KernelPropertySpec's idempotence sweep).
    * Strip-first is a fixpoint: NFC never produces strippable
    * controls, so pass two finds nothing to do. */
  def clean(s: UTF8String): UTF8String = {
    val str = s.toString
    var hasControl = false
    var i = 0
    while (i < str.length && !hasControl) {
      if (isStrippedControl(str.charAt(i))) hasControl = true
      i += 1
    }
    val stripped =
      if (!hasControl) str
      else {
        val sb = new java.lang.StringBuilder(str.length)
        var j = 0
        while (j < str.length) {
          val ch = str.charAt(j)
          if (!isStrippedControl(ch)) sb.append(ch)
          j += 1
        }
        sb.toString
      }
    val normalized =
      if (java.text.Normalizer.isNormalized(stripped,
          java.text.Normalizer.Form.NFC)) stripped
      else java.text.Normalizer.normalize(stripped,
        java.text.Normalizer.Form.NFC)
    if (normalized eq str) s else UTF8String.fromString(normalized)
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>`
  * columns — the custom-`Expression` tier of the similarity stack
  * (SURVEY.md §7.5: "a codegen'd CosineSimilarity if HOF-based
  * similarity is too slow").
  *
  * Why an Expression and not the `zip_with`+`aggregate` HOF form
  * ([[graft.functions.VectorFunctions.cosine]]): the HOF version
  * materializes a products array per pair and walks three separate
  * folds (dot, ‖a‖², ‖b‖²); this one is a single fused loop with no
  * allocation, inside whole-stage codegen. Same numeric contract —
  * sequential left-to-right double accumulation, so results are
  * BIT-IDENTICAL to the HOF form and to DuckDB's `list_dot_product`
  * (ExpressionSpec asserts the HOF equivalence on random vectors).
  *
  * Null/edge semantics (mirrors what the HOF composition produces):
  * null if either array is null, contains a null element, or lengths
  * differ; 0.0 if either norm is zero.
  *
  * Registered as SQL function `cosine_sim` via
  * [[graft.extensions.GraftExtensions]]; reach it from the DataFrame
  * API with `call_function("cosine_sim", a, b)`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}); " +
        "cast float embeddings with CAST(v AS ARRAY<DOUBLE>)")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
      final int $n = $x.numElements();
      if ($n != $y.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
          final double $xi = $x.getDouble($i);
          final double $yi = $y.getDouble($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if (!${ev.isNull}) {
          ${ev.value} = ($na == 0.0 || $nb == 0.0)
            ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

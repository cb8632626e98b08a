package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{CosineSimilarity, JaccardSimilarity, JaccardSimilaritySorted}

/** Engine extension point (the `SparkSessionExtensions` surface):
  * registers graft's native expressions into the session's function
  * registry, making them first-class in BOTH the SQL dialect
  * (`SELECT cosine_sim(a, b)`) and the DataFrame API
  * (`call_function("cosine_sim", a, b)`), with full Catalyst
  * optimization and whole-stage codegen.
  *
  * Activate with `.config("spark.sql.extensions",
  * "graft.extensions.GraftExtensions")` on the session builder —
  * every graft session factory (GraftSession, Verify, Bench, tests)
  * does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaccard_sim expects exactly 2 arguments")
        JaccardSimilarity(children.head, children(1))
      }))
    // whole-operator tier: the top-k-per-group plan node (ladder (c) —
    // logical node + strategy + physical heaps; see graft.plans) …
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // … and the optimizer rule that gives the SQL/window idiom
    // (`filter(row_number() over (...) <= k)`) the same bounded-heap
    // plan automatically (VERDICT r4 item 2)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    // … and a table-valued SQL surface for the operator (VERDICT r4
    // item 8 — the Athena-layer user reaches the heap plan without
    // Scala):  SELECT * FROM topk_per_group('orders', 'o_custkey',
    //                       'o_totalprice DESC, o_orderkey', 3)
    // Args must be literals (table name, comma-separated group cols,
    // comma-separated order items with optional ASC/DESC, k, and an
    // optional 5th arg naming a rank output column — the row_number
    // equivalent, emitted by the heap's final phase). The builder
    // emits the UNRESOLVED logical node — the analyzer resolves the
    // relation and the attribute references exactly as it does for
    // any FROM-clause table.
    ext.injectTableFunction((
      new FunctionIdentifier("topk_per_group"),
      new ExpressionInfo(classOf[graft.plans.TopKPerGroup].getName,
        "topk_per_group"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
        import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, Literal, SortOrder}
        import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
        require(children.size == 4 || children.size == 5,
          "usage: topk_per_group(table, group_cols, order_spec, k[, rank_col])")
        def str(e: Expression, what: String): String = e match {
          case Literal(s, StringType) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            s"topk_per_group: $what must be a string literal, got $other")
        }
        val table = str(children(0), "table").split('.').toSeq
        val groups = str(children(1), "group_cols")
          .split(',').map(_.trim).filter(_.nonEmpty)
          .map(n => UnresolvedAttribute.quotedString(n): Expression)
        val order = str(children(2), "order_spec")
          .split(',').map(_.trim).filter(_.nonEmpty)
          .map { item =>
            val lower = item.toLowerCase(java.util.Locale.ROOT)
            val (name, asc) =
              if (lower.endsWith(" desc")) (item.dropRight(5).trim, false)
              else if (lower.endsWith(" asc")) (item.dropRight(4).trim, true)
              else (item, true)
            SortOrder(UnresolvedAttribute.quotedString(name),
              if (asc) Ascending else Descending)
          }
        val k = children(3) match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) => v.toInt
          case other => throw new IllegalArgumentException(
            s"topk_per_group: k must be an integer literal, got $other")
        }
        val rankFor = children.drop(4).headOption.map(e =>
          AttributeReference(str(e, "rank_col"), IntegerType,
            nullable = false)())
        graft.plans.TopKPerGroup(groups.toIndexedSeq, order.toIndexedSeq, k,
          UnresolvedRelation(table), rankFor)
      }))
    // Near-dup pair mining from SQL. These builders resolve the table
    // through the ACTIVE session (set for the analysis thread by
    // spark.sql) and return the operator composition's analyzed plan —
    // a whole DataFrame-level operator exposed as a table function.
    //   cosine_near_dup(table, id_col, vec_col, threshold)
    //     — the exact all-pairs oracle tier (quadratic; ground truth)
    //   cosine_near_dup_banded(table, id_col, vec_col, threshold, dim)
    //     — the banded-LSH production tier for thresholds ≥ ~0.85
    def strLit(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(s,
          org.apache.spark.sql.types.StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
    }
    def numLit(e: Expression, what: String): Double = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
          if v != null && v.toString.nonEmpty &&
            scala.util.Try(v.toString.toDouble).isSuccess =>
        v.toString.toDouble
      case other => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $other")
    }
    ext.injectTableFunction((
      new FunctionIdentifier("cosine_near_dup"),
      new ExpressionInfo("graft.operators.Similarity", "cosine_near_dup"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          "usage: cosine_near_dup(table, id_col, vec_col, threshold)")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Similarity.cosineNearDupPairsExact(
            spark.table(strLit(children(0), "table")),
            strLit(children(1), "id_col"), strLit(children(2), "vec_col"),
            numLit(children(3), "threshold"))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("cosine_near_dup_banded"),
      new ExpressionInfo("graft.operators.Similarity", "cosine_near_dup_banded"),
      (children: Seq[Expression]) => {
        require(children.size == 5,
          "usage: cosine_near_dup_banded(table, id_col, vec_col, threshold, dim)")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Similarity.cosineNearDupPairsBanded(
            spark.table(strLit(children(0), "table")),
            strLit(children(1), "id_col"), strLit(children(2), "vec_col"),
            numLit(children(3), "threshold"),
            dim = numLit(children(4), "dim").toInt)
          .queryExecution.analyzed
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim_sorted"),
      new ExpressionInfo(classOf[JaccardSimilaritySorted].getName,
        "jaccard_sim_sorted"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "jaccard_sim_sorted expects exactly 2 arguments")
        JaccardSimilaritySorted(children.head, children(1))
      }))
  }
}

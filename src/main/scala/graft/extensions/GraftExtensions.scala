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

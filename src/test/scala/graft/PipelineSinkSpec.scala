package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.generate.SyntheticOrderSource
import graft.pipeline.OrderPipeline

/** Gates for the partitioned-JSONL sink's two modes (S4/S5,
  * processor.py:196-203; VERDICT.md r2 item 4): q35 oracles the
  * event-time mode end-to-end, but the parity mode — the reference's
  * actual processing-date partitioning, wrong-partition late-data
  * behavior included — previously had no test executing its branch. */
class PipelineSinkSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))

  private lazy val processed = OrderPipeline.processOrders(
    SyntheticOrderSource.orders(spark, 300, seed = 21), "graft_sink_spec")

  test("byEventTime=false: every order lands in the processing-date partition (parity mode)") {
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft_sink_parity")
    deleteRec(root)
    // frozen processing clock two weeks after every event timestamp:
    // ALL orders are "late", and the reference files them under the
    // processing date — the buggy-by-design behavior we reproduce
    OrderPipeline.writePartitionedJsonl(processed, root.toString,
      byEventTime = false, processingTs = to_timestamp(lit("2026-08-15 09:30:00")))
    val back = OrderPipeline.readProcessedJsonl(spark, root.toString)
    // partition values come back type-inferred (month "08" reads as 8)
    val parts = back.select(col("year").cast("int"), col("month").cast("int"),
        col("day").cast("int")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(parts.toSeq == Seq((2026, 8, 15)),
      s"parity mode must file everything under the processing date, got ${parts.toSeq}")
    assert(back.count() == processed.count())
    // and NO order actually happened on the partition date — the
    // wrong-partition behavior is real, not vacuous
    assert(back.filter(to_date(col("order_date")) === lit("2026-08-15")).count() == 0)
    deleteRec(root)
  }

  test("byEventTime=true: partitions follow the order timestamps") {
    val root = Paths.get(sys.props("java.io.tmpdir"), "graft_sink_event")
    deleteRec(root)
    OrderPipeline.writePartitionedJsonl(processed, root.toString, byEventTime = true)
    val back = OrderPipeline.readProcessedJsonl(spark, root.toString)
    // generator back-dates uniformly over 8 days → several partitions,
    // and each row's partition equals its own event date
    val nParts = back.select(col("year"), col("month"), col("day")).distinct().count()
    assert(nParts >= 2, s"expected multiple event-date partitions, got $nParts")
    val mismatched = back.filter(
      to_date(to_timestamp(col("order_date"))) =!=
        make_date(col("year").cast("int"), col("month").cast("int"),
          col("day").cast("int"))).count()
    assert(mismatched == 0, s"$mismatched rows landed outside their event date")
    deleteRec(root)
  }
}

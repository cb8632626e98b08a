package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.pipeline.OrderPipeline
import graft.schema.OrderSchema

/** Per-customer running totals carried in the state store (the
  * custom-state surface: `flatMapGroupsWithState`). */
case class CustomerState(nOrders: Long, revenue: Double)
case class CustomerTotal(customerId: String, nOrders: Long, revenue: Double)

/** Structured Streaming twin of the batch pipeline (SURVEY.md §2 S2 /
  * §2.10; policy:41-77, readme:22): the reference's
  * "S3 ObjectCreated → EventBridge → process that one file" loop is a
  * file-source stream, and `Trigger.AvailableNow` reproduces its
  * run-per-invocation batching. `maxFilesPerTrigger=1` gives the
  * bit-faithful one-file-per-micro-batch unit of work
  * (processor.py:166 reads exactly one object per event).
  *
  * The transform is byte-identical to batch: both call
  * [[OrderPipeline.processOrders]]. Checkpointing upgrades the
  * reference's at-least-once, duplicate-on-retry sink
  * (processor.py:196-203) to exactly-once — a documented divergence
  * in the engine's favor (SURVEY.md §2.10).
  */
object OrderStream {

  /** Incremental JSONL source over a raw/ directory. */
  def readRawStream(spark: SparkSession, rawDir: String,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(OrderSchema.rawOrderWithCorruptType)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(rawDir)

  /** Run the full validate→enrich pipeline over every file currently
    * in `rawDir` and append the 29-field result as JSONL under
    * `outDir`, exactly once per input file across restarts (the
    * checkpoint carries the processed-file log). Blocks until the
    * available data is drained, like one Lambda invocation batch. */
  def runAvailableNow(spark: SparkSession, rawDir: String, outDir: String,
                      checkpointDir: String,
                      maxFilesPerTrigger: Int = 1): Unit = {
    val processed = OrderPipeline.processOrders(
      readRawStream(spark, rawDir, maxFilesPerTrigger),
      observeName = s"graft_stream_${System.nanoTime()}")
    val q: StreamingQuery = processed.writeStream
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time hourly revenue over the order stream — the stateful
    * windowed-aggregation surface (SURVEY.md §2.10: watermark +
    * tumbling window) the reference's flow implies but never builds.
    * Late orders beyond the watermark are dropped instead of landing
    * in a wrong partition (the reference's behavior for late data,
    * processor.py:196-203). */
  def hourlyRevenue(processed: DataFrame): DataFrame =
    processed
      .withColumn("order_ts", to_timestamp(col("order_date")))
      .withWatermark("order_ts", "1 day")
      .groupBy(window(col("order_ts"), "1 hour"), col("customer_city"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("total_amount")).as("revenue"))

  /** Event-time session windows (30-minute inactivity gap) per
    * customer — the streaming-native twin of the batch
    * gaps-and-islands sessionization (q26), via `session_window` +
    * watermark. Works identically over batch and streaming inputs;
    * StreamingSpec drains it through a memory sink and checks it
    * against the batch run. */
  def customerSessions(processed: DataFrame): DataFrame =
    processed
      .withColumn("order_ts", to_timestamp(col("order_date")))
      .withWatermark("order_ts", "1 day")
      .groupBy(session_window(col("order_ts"), "30 minutes"), col("customer_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("total_amount")).as("revenue"))

  /** Custom arbitrary state (SURVEY.md §2.10 "stateful ops"):
    * per-customer cumulative order count and revenue, maintained in
    * the state store across micro-batches with
    * `flatMapGroupsWithState`. Each batch emits the updated totals
    * for the customers it touched — the streaming-native form of a
    * running aggregate the reference's stateless loop cannot express.
    * State is partitioned by customer, so it shards across executors
    * like any keyed state at scale. */
  def customerRunningTotals(processed: DataFrame): Dataset[CustomerTotal] = {
    val spark = processed.sparkSession
    import spark.implicits._
    processed
      .select(col("customer_id"), col("total_amount"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CustomerState, CustomerTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (customerId: String, rows: Iterator[(String, Double)],
         state: GroupState[CustomerState]) =>
          val prev = state.getOption.getOrElse(CustomerState(0L, 0.0))
          var n = prev.nOrders
          var rev = prev.revenue
          rows.foreach { case (_, amount) => n += 1; rev += amount }
          state.update(CustomerState(n, rev))
          Iterator(CustomerTotal(customerId, n, rev))
      }
  }
}

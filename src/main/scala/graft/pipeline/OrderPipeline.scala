package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.enrich.OrderEnrich
import graft.schema.OrderSchema

/** The parity ETL pipeline (SURVEY.md §3 EP2): JSONL in → corrupt-line
  * tolerance → validation gate with side-output counts → 17→29-field
  * enrichment → date-partitioned JSONL out.
  *
  * Every stage is a `DataFrame => DataFrame` function so the exact
  * same code runs under batch (`spark.read`) and Structured Streaming
  * (`spark.readStream`, see [[graft.streaming.OrderStream]]) — the
  * Spark replacement for the reference's one-Lambda-per-file event
  * loop (processor.py:164-236). The whole pipeline is narrow (no
  * shuffle): it scales by file-partition parallelism alone, which is
  * exactly how the reference's one-file-per-event model shards.
  */
object OrderPipeline {

  /** S1 (processor.py:172-182): schema'd JSONL scan, malformed lines
    * tolerated into `_corrupt_record` instead of failing the batch;
    * blank lines are skipped by the reader natively (P4). */
  def readRawJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(OrderSchema.rawOrderWithCorruptType)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** P3 (processor.py:177-182): drop unparseable lines. */
  def dropCorrupt(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Typed boundary: bind a raw-order DataFrame to the
    * [[OrderSchema.RawOrder]] encoder for compile-time field access
    * (SURVEY.md §1.4 — Dataset[T] at pipeline boundaries, DataFrame
    * inside). */
  def typedRaw(df: DataFrame): Dataset[OrderSchema.RawOrder] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[OrderSchema.RawOrder]
  }

  /** P2: attach the validation-error array (processor.py:105-119). */
  def withValidation(df: DataFrame): DataFrame =
    df.withColumn("validation_errors",
      OrderEnrich.validationErrors(col("order_id"), col("items"),
        col("subtotal"), col("total_amount")))

  /** A5/A6 (processor.py:184-194, generator-function.py:116-121):
    * processed/invalid counters as zero-cost `observe` metrics —
    * collected by an `Observation` in batch or a
    * `StreamingQueryListener` in streaming, never by a second scan. */
  def observed(validated: DataFrame, name: String = "graft_pipeline"): DataFrame =
    validated.observe(name,
      count(lit(1)).as("total_orders"),
      count(when(size(col("validation_errors")) === 0, 1)).as("valid_orders"),
      count(when(size(col("validation_errors")) > 0, 1)).as("invalid_orders"),
      sum(when(size(col("validation_errors")) === 0, col("total_amount"))
        .otherwise(0.0)).as("valid_revenue"))

  /** The shared validate→enrich core: valid orders enriched to 29
    * fields, invalid orders counted and dropped (processor.py:122-126,
    * 187-192). Works unchanged on batch and streaming inputs. */
  def processOrders(raw: DataFrame, observeName: String = "graft_pipeline"): DataFrame = {
    val gated = observed(withValidation(raw), observeName)
      .filter(size(col("validation_errors")) === 0)
      .drop("validation_errors")
    OrderEnrich.enrich(gated)
  }

  /** S4/S5 (generator-function.py:124, processor.py:196-203):
    * hive-layout date-partitioned JSONL sink. `byEventTime=false`
    * reproduces the reference's processing-date partitioning
    * (including its wrong-partition handling of late orders —
    * SURVEY.md §2.10); `byEventTime=true` is the corrected mode that
    * partitions on the order timestamp. `processingTs` injects the
    * processing clock so the parity mode is testable with a frozen
    * value (PipelineSinkSpec); production callers leave the default. */
  def writePartitionedJsonl(df: DataFrame, root: String,
                            byEventTime: Boolean,
                            processingTs: Column = current_timestamp()): Unit = {
    val ts = if (byEventTime) OrderEnrich.parseOrderDate(col("order_date"))
             else processingTs
    df
      .withColumn("year", date_format(ts, "yyyy"))
      .withColumn("month", date_format(ts, "MM"))
      .withColumn("day", date_format(ts, "dd"))
      .write.mode("overwrite")
      .partitionBy("year", "month", "day")
      .json(root)
  }

  /** Processed-table readback (the Glue-crawler/Athena role, S6):
    * partition columns come back from the hive directory layout. */
  def readProcessedJsonl(spark: SparkSession, root: String): DataFrame =
    spark.read.json(root)
}

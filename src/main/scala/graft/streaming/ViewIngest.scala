package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming materialized-view maintenance — the foreachBatch loop
  * around [[graft.operators.ViewMaintenance.maintainAggViewCdc]]:
  * a before-image changelog stream (the Debezium shape) keeps a
  * per-group (count, sum) view current WITHOUT ever touching the
  * fact table — the view is the only state, and each batch's work is
  * changelog-sized.
  *
  * State is published as immutable versions `v=<batchId>` (the
  * out-of-place convention): a batch reads the LATEST VERSION BELOW
  * ITS OWN ID and overwrites its own version — so an at-least-once
  * re-execution of batch k (always the youngest, by the foreachBatch
  * retry contract) re-reads the same input state and re-lands the
  * identical version k: idempotent without a transactional sink.
  * Readers take the highest version.
  */
object ViewIngest {

  val changelogSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("grp", StringType),
    StructField("val", LongType),
    StructField("old_grp", StringType),
    StructField("old_val", LongType)))

  private[streaming] def versionDirs(spark: SparkSession,
                                     stateDir: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(st => (st.getPath.getName.drop(2).toLong,
        st.getPath.toString))
  }

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("grp", StringType),
        StructField("cnt", LongType), StructField("total", LongType))))

  /** Current view = the highest published version (empty before the
    * first batch lands). */
  def readAggView(spark: SparkSession, stateDir: String): DataFrame =
    versionDirs(spark, stateDir).sortBy(_._1).lastOption match {
      case Some((_, dir)) => spark.read.parquet(dir)
      case None => emptyState(spark)
    }

  def runAggViewIngest(spark: SparkSession, rawDir: String,
                       stateDir: String, checkpointDir: String,
                       maxFilesPerTrigger: Int = 1): Unit = {
    val q = spark.readStream
      .schema(changelogSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(rawDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a RETRIED batch must not read its own half-landed output:
        // take the latest version strictly below this batch's id
        val prev = versionDirs(spark, stateDir)
          .filter(_._1 < batchId).sortBy(_._1).lastOption match {
          case Some((_, dir)) => spark.read.parquet(dir)
          case None => emptyState(spark)
        }
        graft.operators.ViewMaintenance
          .maintainAggViewCdc(prev, batch, "grp", "val")
          .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

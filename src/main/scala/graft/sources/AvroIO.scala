package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built on the Avro core library
  * (avro + avro-mapred ship on Spark's classpath; the `spark-avro`
  * DATASOURCE module does not ship in this environment, so the wire
  * format is implemented through the engine's per-partition codec
  * seam instead — the same `(d) mapPartitions` tier as the media
  * decode, justified because a file-format codec is genuinely
  * imperative per-partition state).
  *
  * Scale shape: the sink writes one container file per partition
  * through the Hadoop FileSystem API (so the same code targets local
  * disk, HDFS, or an object store), streaming rows through the
  * `DataFileWriter` without buffering the partition; the source
  * parallelizes over files and streams each through `DataFileReader`.
  * Narrow in both directions — no shuffle, parallelism = file count.
  *
  * Supported field types: the flat primitives the TPC-H-ish tables
  * need (long/int/double/float/boolean/string, nullable via the
  * standard [null, T] union). Nested types belong to parquet/ORC in
  * this engine; Avro is covered as the row-wire format it is used as.
  */
object AvroIO {

  /** Spark StructType → Avro record schema (nullable fields become
    * [null, T] unions, the Avro convention spark-avro also uses). */
  def avroSchema(st: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case other =>
        throw new IllegalArgumentException(s"unsupported Avro field type: $other")
    }
    val fields = st.fields.map { f =>
      val base = prim(f.dataType)
      val sch =
        if (f.nullable)
          Schema.createUnion(java.util.Arrays.asList(
            Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch, null, null.asInstanceOf[AnyRef])
    }
    val rec = Schema.createRecord(name, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  /** Write `df` as Avro container files under `dir`, one file per
    * non-empty partition. The schema travels as JSON text and is
    * re-parsed inside each task (Avro `Schema` is not serializable). */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val nFields = st.length
    // create the directory up front so an all-empty DataFrame still
    // round-trips as zero files rather than a FileNotFoundException on
    // the read side's listStatus (ADVICE r4)
    FileSystem.get(java.net.URI.create(dir), new Configuration())
      .mkdirs(new HPath(dir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val fs = FileSystem.get(java.net.URI.create(dir), new Configuration())
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        // write to a task-attempt-unique temp name, rename into place on
        // success: a speculative/retried attempt writing directly at the
        // final name would interleave bytes with the committed winner's
        // stream (ADVICE r4). The `.tmp` suffix keeps the read path
        // (filter `.avro`) blind to in-flight attempts; rename is the
        // commit point, losers' temp files are deleted.
        val finalPath = new HPath(dir, f"part-$pid%05d.avro")
        val tmpPath = new HPath(dir,
          f"part-$pid%05d-attempt${tc.taskAttemptId()}.avro.tmp")
        val out = fs.create(tmpPath, true)
        val w = new org.apache.avro.file.DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var committed = false
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < nFields) { rec.put(i, r.get(i)); i += 1 }
            w.append(rec)
          }
          w.close()
          fs.delete(finalPath, false) // clear a prior attempt's commit, if any
          committed = fs.rename(tmpPath, finalPath)
          if (!committed && !fs.exists(finalPath)) {
            // rename failed AND nothing sits at the final name: this
            // attempt would otherwise report success while the
            // partition's data is silently absent (ADVICE r5). The only
            // benign rename failure is losing the race to a concurrent
            // attempt that already committed — covered by the exists
            // check above; anything else must fail the task so Spark
            // retries it.
            throw new java.io.IOException(
              s"AvroIO commit failed: rename($tmpPath -> $finalPath) " +
                "returned false and no committed file exists")
          }
        } finally {
          if (!committed) {
            try w.close() catch { case _: Exception => }
            try fs.delete(tmpPath, false) catch { case _: java.io.IOException => }
          }
        }
      }
    }
  }

  /** Read the Avro container files under `dir` back as a DataFrame
    * with schema `st` (names positional against the record fields,
    * Utf8 text materialized as String). */
  def read(spark: SparkSession, dir: String, st: StructType): DataFrame = {
    val fs = FileSystem.get(java.net.URI.create(dir), new Configuration())
    val files = fs.listStatus(new HPath(dir)).toSeq
      .map(_.getPath.toString).filter(_.endsWith(".avro")).sorted
    import spark.implicits._
    val fields = st.fields
    spark.createDataset(files)
      .repartition(math.max(1, files.size)) // one file ≈ one task
      .mapPartitions { paths =>
        // readers opened by this task, closed unconditionally at task
        // end — exhaustion-triggered close alone leaks the handle when
        // a consumer stops early (limit/take)
        val open = new scala.collection.mutable.ArrayBuffer[DataFileReader[GenericRecord]]()
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          open.foreach(r => try r.close() catch { case _: java.io.IOException => })
        })
        paths.flatMap { p =>
          val reader = new DataFileReader[GenericRecord](
            new FsInput(new HPath(p), new Configuration()),
            new GenericDatumReader[GenericRecord]())
          open += reader
          val recs = new Iterator[GenericRecord] {
            private var more = true
            def hasNext: Boolean = more && {
              val h = reader.hasNext
              if (!h) more = false
              h
            }
            def next(): GenericRecord = reader.next()
          }
          recs.map { rec =>
            Row.fromSeq(fields.indices.map { i =>
              (fields(i).dataType, rec.get(i)) match {
                case (_, null) => null
                case (StringType, v) => v.toString
                case (_, v) => v
              }
            })
          }
        }
      }(Encoders.row(st))
  }
}

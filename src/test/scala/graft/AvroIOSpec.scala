package graft

import java.nio.file.Paths
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvroIO

/** Round-trip gates for the AvroIO codec seam: values, nulls (the
  * [null, T] union), and multi-partition file layout. q83 adds the
  * DuckDB-oracled aggregate gate over real table data. */
class AvroIOSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  test("values and nulls survive the container round trip") {
    val rows = Seq(
      Row(1L, "alpha", 1.5, true),
      Row(2L, null, null, null),
      Row(3L, "gamma", -0.25, false))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_avro_spec_${System.nanoTime()}")
    AvroIO.write(df, dir.toString)
    val back = AvroIO.read(spark, dir.toString, schema)
    assert(back.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back.collect().toSet == rows.toSet)
    // one container file per non-empty partition
    val files = dir.toFile.listFiles.map(_.getName).filter(_.endsWith(".avro"))
    assert(files.nonEmpty && files.length <= 2)
  }
}

package graft.queries

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Source-format coverage beyond parquet/JSONL: CSV (with quoting),
  * ORC (the other columnar), and raw text lines (the shape a crawl
  * dump arrives in). Each query is a real write→read round trip
  * inside the query — the sink AND source under test — then an
  * aggregate whose oracle computes the same numbers straight from the
  * parquet tables, so any corruption in either direction of the
  * round trip breaks the hash.
  */
object SourceFormats {

  private def deleteRec(p: Path): Unit =
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))

  // unique per invocation (pid + nanotime), not a fixed name: two
  // harness processes on one machine would otherwise race — one
  // deleting/overwriting the directory while the other's lazy read
  // re-scans it (ADVICE r3). The path is NOT pre-created so the
  // writer's ErrorIfExists semantics stay intact; since this process
  // uniquely owns it, a shutdown hook reclaims it so repeated bench
  // runs don't accumulate round-trip outputs in the tmpdir.
  private def tmp(name: String): Path = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"${name}_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    sys.addShutdownHook(deleteRec(p))
    p
  }

  // ---- q76: CSV round trip --------------------------------------------
  // Schema is explicit on read (CSV carries no types); the aggregate
  // proves values, strings, and row count survived both directions.

  private val q76 = GraftQuery(
    "q76_csv_roundtrip",
    (s, d) => {
      val dir = tmp("graft_q76_csv")
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .write.option("header", "true").csv(dir.toString)
      s.read
        .option("header", "true")
        .schema(StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_totalprice", DoubleType),
          StructField("o_orderdate", StringType),
          StructField("o_orderpriority", StringType))))
        .csv(dir.toString)
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(14, 2)))
            .cast(DoubleType).as("revenue"),
          sum(length(col("o_orderpriority"))).as("prio_chars"),
          count_distinct(col("o_orderdate")).as("n_dates"))
    },
    Some("""SELECT count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        CAST(sum(length(o_orderpriority)) AS BIGINT) AS prio_chars,
        count(DISTINCT o_orderdate) AS n_dates
      FROM orders WHERE o_orderkey % 7 = 0"""))

  // ---- q77: ORC round trip --------------------------------------------
  // The other columnar format, schema preserved natively; same
  // write→read→aggregate gate over a lineitem slice.

  private val q77 = GraftQuery(
    "q77_orc_roundtrip",
    (s, d) => {
      val dir = tmp("graft_q77_orc")
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") % 11 === 0)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))
        .write.orc(dir.toString)
      s.read.orc(dir.toString)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(14, 2)))
            .cast(DoubleType).as("qty"),
          sum(col("l_extendedprice").cast(DecimalType(16, 2)))
            .cast(DoubleType).as("price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS price
      FROM lineitem WHERE l_orderkey % 11 = 0
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // ---- q78: raw text lines (the crawl-dump shape) ---------------------
  // One doc per line out, `spark.read.text` back in; identity is only
  // the content, so the gate aggregates order-insensitive stats
  // (line count, token mass, distinct digests).

  private val q78 = GraftQuery(
    "q78_text_lines",
    (s, d) => {
      val dir = tmp("graft_q78_text")
      Tables.documents(s, d).select(col("text")).write.text(dir.toString)
      s.read.text(dir.toString)
        .agg(count(lit(1)).as("n_lines"),
          sum(tokenCount(col("value"))).as("total_tokens"),
          count_distinct(md5(col("value"))).as("distinct_digests"))
    },
    Some("""SELECT count(*) AS n_lines,
        CAST(sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
          x -> length(x) > 0))) AS BIGINT) AS total_tokens,
        count(DISTINCT md5(text)) AS distinct_digests
      FROM documents"""))

  // ---- q79: compressed JSONL (the wire format of crawl dumps) ---------
  // gzip-compressed JSONL written and read back transparently —
  // Spark's text sources decompress by extension, so the ingest code
  // is byte-identical to the uncompressed path.

  private val q79 = GraftQuery(
    "q79_gzip_jsonl",
    (s, d) => {
      val dir = tmp("graft_q79_gz")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("lang"), col("text"))
        .write.option("compression", "gzip").json(dir.toString)
      s.read.json(dir.toString)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("chars"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
        CAST(sum(length(text)) AS BIGINT) AS chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  // ---- q80: schema evolution across corpus epochs ---------------------
  // Crawl epochs drift: an early shard lacks columns a later shard
  // carries. Two epochs land in one parquet dataset; `mergeSchema`
  // reconciles them and the missing column reads back as null — the
  // census pins exactly which rows lost it.

  private val q80 = GraftQuery(
    "q80_schema_evolution",
    (s, d) => {
      val dir = tmp("graft_q80_evo")
      val docsDf = Tables.documents(s, d)
      docsDf.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("text"))
        .write.parquet(dir.resolve("epoch=1").toString)
      docsDf.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("source"), col("text"), col("lang"))
        .write.parquet(dir.resolve("epoch=2").toString)
      s.read.option("mergeSchema", "true").parquet(dir.toString)
        .groupBy(coalesce(col("lang"), lit("<absent>")).as("lang_bucket"))
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("source")).as("n_sources"))
        .orderBy(col("lang_bucket"))
    },
    Some("""SELECT CASE WHEN doc_id % 2 = 0 THEN '<absent>' ELSE lang END
          AS lang_bucket,
        count(*) AS n_docs, count(DISTINCT source) AS n_sources
      FROM documents GROUP BY 1 ORDER BY lang_bucket"""))

  // ---- q83: Avro round trip -------------------------------------------
  // The row-wire format Kafka-adjacent ingest lands in. The spark-avro
  // datasource module is absent from this environment, so the round
  // trip runs through AvroIO (Avro core + Hadoop FS through the
  // per-partition codec seam); the aggregate gate is the same
  // write→read→hash contract as q76/q77.

  private val q83 = GraftQuery(
    "q83_avro_roundtrip",
    (s, d) => {
      val dir = tmp("graft_q83_avro")
      val slice = Tables.part(s, d)
        .filter(col("p_partkey") % 5 === 0)
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_retailprice"))
      graft.sources.AvroIO.write(slice, dir.toString)
      graft.sources.AvroIO.read(s, dir.toString, StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_name", StringType),
        StructField("p_brand", StringType),
        StructField("p_retailprice", DoubleType))))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast(DecimalType(14, 2)))
            .cast(DoubleType).as("retail"),
          sum(length(col("p_name"))).as("name_chars"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n,
        CAST(sum(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) AS retail,
        CAST(sum(length(p_name)) AS BIGINT) AS name_chars
      FROM part WHERE p_partkey % 5 = 0
      GROUP BY p_brand ORDER BY p_brand"""))

  def all: Seq[GraftQuery] = Seq(q76, q77, q78, q79, q80, q83)
}

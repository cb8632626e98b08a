package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive) record extraction — stage ZERO of every
  * web-crawl training-data pipeline (Common Crawl lands as WARC; the
  * cleaning stack downstream of here — stripMarkup, langid, quality,
  * dedup — consumes the payloads this seam produces).
  *
  * This is the RELATIONAL tier: records are recovered by splitting on
  * the `\r\n\r\nWARC/1.0\r\n` record boundary and headers parsed with
  * anchored regexes — one narrow codegen'd projection per blob, no
  * state, shard-parallel (each blob splits independently, the 100 TB
  * shape: WARC files are independently-splittable units by design).
  * The contract is the classic streaming-WARC caveat, stated rather
  * than hidden: a PAYLOAD containing the exact boundary byte sequence
  * mis-splits — a Content-Length-driven byte walker at the codec seam
  * (the [[graft.operators.Multimodal]] decoder pattern) is the
  * binary-exact tier, and [[parseRecords]]' `len_ok` flag is the
  * per-record detector that says when it is needed: a mis-split
  * record's payload length disagrees with its declared
  * Content-Length, so corruption surfaces as `len_ok = false` rows
  * instead of silently truncated documents.
  */
object Warc {

  /** The inter-record boundary: blank line + next record's version
    * marker. Regex form (Spark `split` and DuckDB
    * `regexp_split_to_array` both treat the separator as a regex, so
    * ONE escaped string serves both engines). */
  val boundaryRe = "\\r\\n\\r\\nWARC/1\\.0\\r\\n"

  /** Explode a column of WARC blobs into one row per record:
    * `(…, uri, content_length, payload, len_ok)`. Records missing a
    * header parse as empty string / null length; `len_ok` gates
    * declared Content-Length against the recovered payload — the
    * cheap structural-integrity check a crawl-ingest job fails loudly
    * on. Keeps all input columns (the blob column included) so the
    * caller controls projection. */
  def parseRecords(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("_rec", explode(split(col(blobCol), boundaryRe)))
      .withColumn("_rec",
        regexp_replace(col("_rec"), "^WARC/1\\.0\\r\\n", ""))
      .filter(length(col("_rec")) > 0)
      .withColumn("uri",
        regexp_extract(col("_rec"), "WARC-Target-URI: ([^\\r]*)", 1))
      .withColumn("_cl",
        regexp_extract(col("_rec"), "Content-Length: (\\d+)", 1))
      // a missing header extracts "" — null, not an ANSI cast error
      .withColumn("content_length",
        when(length(col("_cl")) > 0, col("_cl").cast(LongType)))
      .drop("_cl")
      .withColumn("payload",
        regexp_extract(col("_rec"), "(?s)\\r\\n\\r\\n(.*)$", 1))
      .withColumn("len_ok",
        col("content_length").isNotNull &&
          length(col("payload")) === col("content_length"))
      .drop("_rec")

  /** Render `(uri, payload)` rows as minimal WARC/1.0 response
    * records — the writer side of the seam (test fixtures, re-export
    * of a cleaned corpus in the format the crawl side speaks). */
  def record(uri: Column, payload: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Length: "), length(payload),
      lit("\r\n\r\n"), payload)
}

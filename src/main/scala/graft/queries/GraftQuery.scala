package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator/query from the SURVEY.md §2 inventory.
  *
  * @param fn     the Spark implementation; `(session, sfDir) => result`
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None for ops whose semantics are not
  *               SQL-expressible (driver falls back to rows-only check)
  *
  * Correctness-by-construction conventions shared by every query and
  * its oracle (the driver hash-matches values after sorting columns
  * by name):
  *   - every result has a fully deterministic ORDER BY (ties broken
  *     by a key column);
  *   - money/double aggregates are summed as exact DECIMAL (so the
  *     result is independent of floating-point summation order, which
  *     differs between Spark's parallel partial aggregation and
  *     DuckDB's sequential scan), rounded, then cast back to DOUBLE
  *     so output schemas agree;
  *   - column names are identical on both sides (aliases everywhere).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

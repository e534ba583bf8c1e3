package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator/query: the Spark implementation plus (when the
  * semantics are SQL-expressible) a DuckDB oracle twin. Column names
  * and types must match between the two — the driver sorts columns by
  * name and hash-compares values (see builder contract).
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}

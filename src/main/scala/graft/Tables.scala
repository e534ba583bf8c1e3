package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the harness testdata parquet (TESTDATA.md).
  *
  * One accessor per table; plain `spark.read.parquet` so Catalyst's
  * datasource V2 scan handles column pruning + filter pushdown — at
  * 100 TB these scans are partition-pruned parquet reads, and every
  * query below should show `PushedFilters`/narrow `ReadSchema` in
  * `.explain("formatted")`.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; read nanos as long and convert to micros with
    * integer division (epoch nanos ≈ 1.7e18 exceed double precision —
    * `div`, not `/`).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}

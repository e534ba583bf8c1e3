package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one
  * [[GraftQuery]] in a registry object; SQL-expressible ones carry a
  * DuckDB oracle twin (hash-compared by the driver at sf0.01),
  * the rest get the weaker rows-only check.
  */
object SparkEntry {

  private def registry: Seq[GraftQuery] =
    AnalyticalQueries.all ++
      OlapExtras.all ++
      Seq(graft.etl.DimTime.query) ++
      graft.etl.EtlQueries.all ++
      graft.etl.Scd.all ++
      graft.etl.Warehouse.all ++
      graft.analytics.AnalyticsQueries.all ++
      graft.analytics.MlQueries.all ++
      graft.analytics.DaxMeasures.all ++
      graft.analytics.BehaviorQueries.all ++
      graft.analytics.ProfileQueries.all ++
      graft.analytics.BasketQueries.all ++
      graft.analytics.GraphQueries.all ++
      graft.analytics.RfmQueries.all ++
      graft.text.TextQueries.all ++
      graft.text.TfIdfQueries.all ++
      graft.text.MixtureQueries.all ++
      graft.text.UnigramQueries.all ++
      graft.text.HeavyHitterQueries.all ++
      graft.text.CurationQueries.all ++
      graft.text.DedupQueries.all ++
      graft.text.SimilarityQueries.all ++
      graft.text.BpeQueries.all ++
      graft.text.PcaQueries.all ++
      graft.text.KMeansQueries.all ++
      graft.streaming.EventKpis.all ++
      graft.multimodal.Multimodal.all ++
      graft.multimodal.AviQueries.all ++
      graft.sources.Sources.all ++
      graft.sources.AvroSources.all ++
      graft.plans.GeoQueries.all ++
      graft.operators.AsofJoin.all ++
      graft.operators.RangeJoin.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticalQueries.q3bMovingAvgYtd.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops — the
    * driver then records a weaker rows-only check, and BY REPO
    * CONVENTION (r12) every such entry's output carries SELF-VERIFYING
    * verdict columns: boolean assertion results computed inside the
    * query (bands cross-checked against oracle-gated relational twins),
    * all of which must read true on well-formed data. MlVerdictSpec
    * pins both directions (all-true on the warehouse, perturbations
    * flip); ParallelismInvarianceSpec pins the verdicts stay true under
    * perturbed task layouts even where the values may legitimately vary.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

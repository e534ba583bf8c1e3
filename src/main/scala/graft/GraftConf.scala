package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session tuning applied by graft's own mains and test
  * base — explicit and in ONE place, never mutated from inside a
  * query (a query that silently re-configures the session would
  * change unrelated workloads that run after it).
  */
object GraftConf {

  /** ObjectHashAggregate falls back to SORT-based aggregation after
    * 128 distinct keys per partition (default) — a full sort of the
    * input mass under any typed aggregator. graft's typed aggregators
    * (BoundedList, TopK) hold O(cap) ≈ 500 B buffers, so 128k keys is
    * a ~64 MB/task budget: hash aggregation survives realistic
    * per-partition cardinalities while staying executor-safe. Library
    * users who run LARGE-buffer object aggregations (uncapped
    * collect_list over wide rows) in the same session should size
    * this themselves.
    */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    // Member-scale dims (customer/part/supplier) carry NO static
    // broadcast hint — at 100 TB a hinted plan is a driver OOM — so
    // correct dim-join planning DEPENDS on AQE seeing their runtime
    // size and converting to broadcast. AQE defaults on since Spark
    // 3.2, but a session that disabled it would silently shuffle
    // every dim join; force it here (r6 ADVICE item 3).
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // NOT set (r17 optimization round, measured):
    // spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold (guide
    // §3.1's runtime SMJ→SHJ rewrite) was A/B'd at 64m over the six
    // SMJ-carrying benched queries under equal load — every delta
    // within ±5% noise, because the registry's remaining sort-merge
    // joins are either AQE-broadcast at runtime anyway or sort inputs
    // too small for the sort to matter; and at 100 TB the per-
    // partition size guard would keep them sort-merge regardless.
    // Details in OPTIMIZATION_r17.md.
  }
}

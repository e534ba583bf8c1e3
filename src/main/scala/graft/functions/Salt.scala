package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skew (builder contract: "salting for skew", SURVEY
  * §4 physical notes). AQE's skew-join handling covers sort-merge
  * joins automatically; these helpers cover the two cases it doesn't:
  * a skewed groupBy (hot grouping key saturates one reducer) and a
  * skewed join where the build side must be replicated.
  *
  * Correctness is salt-invariant: the salt only spreads rows across
  * reducers; the final combine removes it. SaltSpec asserts equality
  * with the unsalted plans.
  */
object Salt {

  /** Deterministic per-row salt in [0, n): xxhash64 of the full row
    * content. Determinism matters for correctness, not just style — a
    * salt derived from monotonically_increasing_id() changes across
    * task retries, and a recomputed map stage can re-bucket rows into
    * different (key, salt) groups than already-fetched earlier output
    * (a known double-count/drop hazard for shuffles keyed on
    * nondeterministic expressions). Hashing row content is stable
    * under retry; duplicate rows co-bucket, which only narrows the
    * spread when a hot key's rows are near-identical.
    */
  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(n.toLong))

  /** Two-phase salted aggregation: partial per (keys, salt), then
    * final per keys. `aggs` must be algebraic (sum/count/min/max —
    * combine = same op); exact-decimal sums stay exact.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                n: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(df, n))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("salted_sum"))
  }

  /** Join types for which replicate-and-salt is correct: every big-side
    * row carries exactly one salt, so inner/left flavors emit each
    * matched pair once and each unmatched big row once. `right`/`full`
    * are rejected — an unmatched SMALL-side row appears once per salt
    * replica (n duplicates).
    */
  private val saltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")

  /** Salted join: the big (skewed) side gets a salt, the small side
    * is replicated ×n via explode — the hot key's rows then land on n
    * reducers instead of one. Use when the small side is too large to
    * broadcast but the join key is skewed.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 n: Int, joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin supports inner/left-flavored joins only, got $joinType" +
        " (right/full would emit unmatched small-side rows once per replica)")
    val saltedBig = big.withColumn("__salt", saltCol(big, n))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}

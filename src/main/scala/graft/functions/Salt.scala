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

  /** Deterministic per-row salt in [0, n): hash of the whole row's
    * partition-local position is unnecessary — any spread works, so a
    * cheap xxhash64 of the key columns plus a disambiguator keeps the
    * plan pure-columnar.
    */
  private def saltCol(n: Int, disambiguator: Column): Column =
    pmod(xxhash64(disambiguator), lit(n.toLong))

  /** Two-phase salted aggregation: partial per (keys, salt), then
    * final per keys. `aggs` must be algebraic (sum/count/min/max —
    * combine = same op); exact-decimal sums stay exact.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
                n: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(n, monotonically_increasing_id()))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("salted_sum"))
  }

  /** Salted join: the big (skewed) side gets a salt, the small side
    * is replicated ×n via explode — the hot key's rows then land on n
    * reducers instead of one. Use when the small side is too large to
    * broadcast but the join key is skewed.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 n: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      saltCol(n, monotonically_increasing_id()))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    saltedBig.join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}

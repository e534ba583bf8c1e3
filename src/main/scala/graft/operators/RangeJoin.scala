package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** Proximity (band / keyless range) join — the second "operator Spark
  * lacks" from the builder contract, complementing [[AsofJoin]].
  *
  * Semantics: left ⟗ right on `|left.ts − right.ts| <= tolerance`
  * with NO equi-key. Naively that is a theta-join, which Catalyst can
  * only plan as BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|)
  * comparisons and, past the broadcast threshold, a full cartesian
  * shuffle: the canonical 100 TB scale-killer.
  *
  * The Spark-first re-expression is bucketization: bin both sides at
  * the tolerance width, explode each RIGHT row to its 3 adjacent bins
  * (any left row within ±tol of a right row has its bin in bin−1 /
  * bin / bin+1), equi-join on the bin, then apply the exact band
  * predicate as part of the join condition. Each qualifying
  * (left, right) pair is produced EXACTLY once — a left row occupies
  * a single bin, and that bin appears once among the right row's
  * three copies — so no dedup pass is needed. Crucially the LEFT side
  * stays unexploded, so the left-outer null-extension is also
  * exactly-once: an unmatched left row yields precisely one
  * null-padded output row (exploding the left instead, as an earlier
  * revision did, emits up to 3 spurious null rows per probe bin with
  * no qualifying partner). The join is a plain hash equi-join:
  * shuffle mass is |L| + 3·|R| rows, AQE's skew-split applies to hot
  * bins, and the pair count is bounded by the band's true selectivity
  * rather than |L|·|R|.
  *
  * Cost note: the 3× replication falls on the RIGHT side regardless
  * of which side is larger — that asymmetry is what buys the
  * exactly-once null-extension, and left-outer semantics fix which
  * side is which. A caller who needs only the INNER band join on a
  * much larger right side can swap the inputs (the band predicate is
  * symmetric) to put the 3× on the smaller table.
  */
object RangeJoin {

  /** Left-outer proximity join on a microseconds column. Returns the
    * left columns plus the right payload columns (null when no right
    * row lies within `tolUs`); each unmatched left row yields exactly
    * one null-padded row, each qualifying pair exactly one row.
    * `leftUs` / `rightUs` must be LONG microsecond epochs with
    * DISTINCT names; `payload` names columns of `right`, none of
    * which may collide with a left column (the band predicate and the
    * output schema both need unambiguous resolution).
    *
    * NULL-ts behavior (r16 audit alongside AsofJoin's contract fix —
    * this operator needs NO fix because it is null-symmetric BY
    * CONSTRUCTION, and the distinction is worth recording): a NULL
    * timestamp bins to a NULL `__bin`, and the bin EQUI-join can
    * never match NULL to NULL — so a null-ts right row pairs with
    * nothing (dropped, exactly like the twin's `ABS(l − NULL) <= tol`
    * three-valued predicate) and a null-ts left row survives as one
    * null-padded left-outer row. AsofJoin needed an explicit contract
    * precisely because it uses an ORDERING (nulls sort first) rather
    * than an equi-join; exercised live by the linkedseq fixture's
    * null-ts click through q23 (171/0) and pinned in RangeJoinSpec.
    */
  def proximityJoinUs(left: DataFrame, right: DataFrame,
                      leftUs: String, rightUs: String,
                      tolUs: Long, payload: Seq[String]): DataFrame = {
    require(tolUs > 0, s"tolerance must be positive, got $tolUs")
    require(leftUs != rightUs,
      s"leftUs and rightUs must differ (both '$leftUs'); alias one side")
    val clash = left.columns.toSet.intersect((rightUs +: payload).toSet)
    require(clash.isEmpty,
      s"left columns collide with right-side columns: ${clash.mkString(", ")}")
    (left.columns ++ right.columns).find(_ == "__bin").foreach { _ =>
      throw new IllegalArgumentException(
        "__bin is reserved by proximityJoinUs; rename the input column")
    }
    val probes = left.withColumn("__bin", floor(col(leftUs) / tolUs))
    val spread = right
      .select((rightUs +: payload).map(col): _*)
      .withColumn("__bin",
        explode(array(Seq(-1, 0, 1).map(d =>
          floor(col(rightUs) / tolUs) + lit(d.toLong)): _*)))
    val band: Column =
      abs(probes(leftUs) - spread(rightUs)) <= tolUs
    probes
      .join(spread, probes("__bin") === spread("__bin") && band, "left")
      .drop("__bin")
  }

  /** q23 — cross-user burst context: for each error event, how many
    * clicks (from ANY user — no equi-key exists) happened within
    * ±60 s, and how close was the nearest one. Left-outer: errors in
    * a quiet minute report 0 / NULL. Oracle: DuckDB's native
    * inequality join (IEJoin) over the same band predicate — an
    * independent first-class implementation of the operator this
    * bucketization re-expresses.
    */
  val q23ProximityJoin: GraftQuery = GraftQuery(
    "q23_proximity_join",
    """SELECT e.event_id AS error_id,
      |       COUNT(c.ts) AS n_near_clicks,
      |       MIN(ABS(epoch_us(e.ts) - epoch_us(c.ts))) AS nearest_us
      |FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
      |LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
      |  ON ABS(epoch_us(e.ts) - epoch_us(c.ts)) <= 60000000
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), unix_micros($"ts").as("e_us"))
    val clicks = ev.filter($"event_type" === "click")
      .select(unix_micros($"ts").as("c_us"))
    proximityJoinUs(errors, clicks, "e_us", "c_us",
      tolUs = 60L * 1000 * 1000, payload = Nil)
      .groupBy($"error_id")
      .agg(count($"c_us").as("n_near_clicks"),
        min(abs($"e_us" - $"c_us")).as("nearest_us"))
  }

  val all: Seq[GraftQuery] = Seq(q23ProximityJoin)
}

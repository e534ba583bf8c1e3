package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exact
import graft.queries.GraftQuery

/** AS-OF (backward) join — the builder contract's canonical "operator
  * Spark lacks". Rather than a per-row range lookup (quadratic) or a
  * custom SparkPlan, the Spark-first re-expression is union +
  * carry-forward window: interleave both sides on (key, ts), sort
  * with right rows first at ties, and carry the latest right payload
  * forward with `last(_, ignoreNulls)`. One shuffle on the key, one
  * sort — the same cost profile as any windowed aggregation, at any
  * scale; no range-join explosion.
  *
  * The oracle twin uses DuckDB's NATIVE `ASOF LEFT JOIN`, so the hash
  * match cross-validates this re-expression against an independent
  * first-class implementation.
  *
  * PRECONDITION (all three joins): the right side must be DISTINCT on
  * (keys, tsCol). With duplicate right timestamps the window order
  * ties on (ts, __side) and `first`/`last` picks an arbitrary carry —
  * the same nondeterminism DuckDB's native ASOF exhibits on ties.
  * Callers that cannot guarantee distinctness should pre-aggregate
  * (as q15h does: `MIN(event_id) GROUP BY user_id, ts`) or call
  * [[dedupRight]]. The ScalaCheck property generator upholds the same
  * contract.
  *
  * NULL-ts CONTRACT (r16, the `linkedseq` fixture exhibited the gap
  * live — see graft.NULL_CONTRACT.md convention A): a NULL timestamp
  * can never satisfy an as-of inequality, so this operator reproduces
  * DuckDB's native semantics exactly — (1) RIGHT rows with NULL ts
  * are DROPPED before the interleave (`c.ts <= p.ts` is never true
  * for them; without the drop they ride Spark's nulls-FIRST window
  * order to the partition head and become every early left row's
  * "latest preceding" carry — q24d read a null-ts click as
  * 'click_older' while DuckDB said 'organic'); (2) LEFT rows with
  * NULL ts keep their row (LEFT join) but carry NULL payloads (under
  * nulls-first they'd otherwise grab the first FOLLOWING right row in
  * the forward/nearest frames). Pinned by AsofJoinSpec + LinkedSeqSpec
  * and mutation m47.
  */
object AsofJoin {

  /** Interleave left and right on (keys, ts): left rows tagged
    * `__side` 1 with null `__carry_*` slots, right rows reduced to
    * keys + ts + `__carry_*` payloads tagged 0 and null-padded to the
    * left schema. Right-before-left at equal ts makes backward joins
    * tie-INCLUSIVE and forward joins STRICT by construction.
    */
  private def interleave(left: DataFrame, right: DataFrame,
                         keys: Seq[String], tsCol: String,
                         carryCols: Seq[String]): DataFrame = {
    val reserved = left.columns.filter(c =>
      c == "__side" || c.startsWith("__carry_") || c.startsWith("asof_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with asof-join " +
        "internals (__side, __carry_*, asof_*); rename them first")
    val carryTypes = carryCols.map(c => c -> right.schema(c).dataType).toMap
    val leftTagged = carryCols.foldLeft(
      left.withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(s"__carry_$c", lit(null).cast(carryTypes(c)))
    }
    val rightTagged = {
      // NULL-ts right rows can never match (object scaladoc, contract
      // point 1) — drop them here so every join direction inherits it
      val base = right.filter(col(tsCol).isNotNull).select(
        (keys.map(col) :+ col(tsCol)) ++
          carryCols.map(c => col(c).as(s"__carry_$c")): _*)
        .withColumn("__side", lit(0))
      // null-pad the left-only columns so the union aligns
      left.columns.filterNot((keys :+ tsCol).contains)
        .foldLeft(base) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }
    leftTagged.unionByName(rightTagged)
  }

  private def keepLeft(df: DataFrame, carryCols: Seq[String],
                       tsCol: String, asofCols: Seq[String]): DataFrame = {
    val kept = df.filter(col("__side") === 1)
      .drop("__side")
      .drop(carryCols.map(c => s"__carry_$c"): _*)
    // NULL-ts LEFT rows keep their row but carry NULL payloads
    // (object scaladoc, contract point 2): with right nulls dropped
    // the backward frame already carries nothing for them, but the
    // forward/nearest frames would grab the first FOLLOWING right row
    asofCols.foldLeft(kept)((d, c) =>
      d.withColumn(c, when(col(tsCol).isNotNull, col(c))))
  }

  private def ordering(keys: Seq[String], tsCol: String) =
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))

  /** Deterministic-dedup helper: reduces `right` to one row per
    * (keys, ts) by taking the MIN of every carry column — the cheapest
    * total-order tiebreak that both engines reproduce (carry columns
    * must be orderable: numeric/string/timestamp). Use when the right
    * side may violate the distinct-(keys, ts) precondition.
    */
  def dedupRight(right: DataFrame, keys: Seq[String], tsCol: String,
                 carryCols: Seq[String]): DataFrame = {
    require(carryCols.nonEmpty,
      "dedupRight needs at least one carry column; with none, use " +
        "right.dropDuplicates(keys :+ tsCol)")
    right.groupBy((keys :+ tsCol).map(col): _*)
      .agg(carryCols.head -> "min", carryCols.tail.map(_ -> "min"): _*)
      .toDF((keys :+ tsCol) ++ carryCols: _*)
  }

  /** For each left row, attach the latest right payload with
    * right.ts ≤ left.ts on the same keys (inclusive ties — right rows
    * order before left rows at equal ts). Requires a right side
    * distinct on (keys, tsCol) — see the object scaladoc.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, carryCols: Seq[String]): DataFrame = {
    val w = ordering(keys, tsCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = carryCols.foldLeft(
      interleave(left, right, keys, tsCol, carryCols)) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"__carry_$c"), ignoreNulls = true).over(w))
    }
    keepLeft(carried, carryCols, tsCol, carryCols.map(c => s"asof_$c"))
  }

  /** Forward as-of join: for each left row, the EARLIEST right
    * payload with right.ts > left.ts (STRICT — an equal-ts right row
    * sorts before the left row, outside the [current, ∞) frame),
    * complementing the backward join's inclusive ties. Same cost:
    * one key shuffle, one sort. Requires a right side distinct on
    * (keys, tsCol) — see the object scaladoc.
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, carryCols: Seq[String]): DataFrame = {
    val w = ordering(keys, tsCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = carryCols.foldLeft(
      interleave(left, right, keys, tsCol, carryCols)) { (df, c) =>
      df.withColumn(s"asof_$c",
        first(col(s"__carry_$c"), ignoreNulls = true).over(w))
    }
    keepLeft(carried, carryCols, tsCol, carryCols.map(c => s"asof_$c"))
  }

  /** Bidirectional as-of: appends BOTH the latest-preceding
    * (`asof_back_<c>`, ties inclusive) and earliest-following
    * (`asof_fwd_<c>`, strict) right payloads to each left row. One
    * union, one (keys, ts) shuffle, ONE sort: the two directions are
    * frames over the SAME partitioning and ordering, so Catalyst
    * evaluates them in a single WindowExec — "nearest" costs exactly
    * what one directional pass costs (AsofJoinSpec pins the plan).
    * Requires a right side distinct on (keys, tsCol) — see the object
    * scaladoc.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, carryCols: Seq[String]): DataFrame = {
    val ord = ordering(keys, tsCol)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = carryCols.foldLeft(
      interleave(left, right, keys, tsCol, carryCols)) { (df, c) =>
      df.withColumn(s"asof_back_$c",
          last(col(s"__carry_$c"), ignoreNulls = true).over(wBack))
        .withColumn(s"asof_fwd_$c",
          first(col(s"__carry_$c"), ignoreNulls = true).over(wFwd))
    }
    keepLeft(carried, carryCols, tsCol,
      carryCols.flatMap(c => Seq(s"asof_back_$c", s"asof_fwd_$c")))
  }

  /** q15f — each error event matched to the user's most recent
    * preceding click (NULL when no click yet). Oracle: native
    * `ASOF LEFT JOIN`.
    */
  val q15fAsofJoin: GraftQuery = GraftQuery(
    "q15f_asof_join",
    """SELECT e.event_id AS error_id, e.user_id,
      |       c.event_id AS asof_click_id,
      |       CAST(CASE WHEN c.event_id IS NOT NULL
      |            THEN epoch_us(e.ts) - epoch_us(c.ts) END AS BIGINT)
      |         AS micros_since_click
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND c.ts <= e.ts""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val ev = Tables(spark, dir).events
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts", $"event_id".as("error_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", unix_micros($"ts").as("cus"))
      asofBackward(errors, clicks, keys = Seq("user_id"), tsCol = "ts",
        carryCols = Seq("event_id", "cus"))
        .select($"error_id", $"user_id",
          $"asof_event_id".as("asof_click_id"),
          when($"asof_event_id".isNotNull,
            unix_micros($"ts") - $"asof_cus").cast("long")
            .as("micros_since_click"))
  }

  /** q15h — nearest-event join: each error matched to its user's
    * temporally CLOSEST click in either direction (backward ties at
    * |dt| prefer the preceding click — the convention DuckDB's paired
    * ASOF twins reproduce exactly). Clicks are first deduped to one
    * per (user, ts) — both the window carry and native ASOF pick
    * arbitrarily among equal timestamps otherwise, and a
    * nondeterministic operator cannot be oracle-gated. Rides
    * [[asofNearest]]: one shuffle, one sort, both directions.
    */
  val q15hAsofNearest: GraftQuery = GraftQuery(
    "q15h_asof_nearest",
    """WITH e AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'error'),
      |c AS (SELECT user_id, ts, MIN(event_id) AS event_id FROM events
      |      WHERE event_type = 'click' GROUP BY 1, 2),
      |b AS (SELECT e.event_id AS error_id, e.user_id, c.event_id AS bid,
      |             epoch_us(e.ts) - epoch_us(c.ts) AS bdt
      |      FROM e ASOF LEFT JOIN c
      |        ON e.user_id = c.user_id AND c.ts <= e.ts),
      |f AS (SELECT e.event_id AS error_id, c.event_id AS fid,
      |             epoch_us(c.ts) - epoch_us(e.ts) AS fdt
      |      FROM e ASOF LEFT JOIN c
      |        ON e.user_id = c.user_id AND c.ts > e.ts)
      |SELECT b.error_id, b.user_id,
      |       CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bdt <= fdt)
      |            THEN bid ELSE fid END AS nearest_click_id,
      |       CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bdt <= fdt)
      |            THEN bdt ELSE fdt END AS nearest_us
      |FROM b JOIN f USING (error_id)""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables(spark, dir).events
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("error_id"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(min($"event_id").as("event_id"))
      .withColumn("cus", unix_micros($"ts"))
    val both = asofNearest(errors, clicks, keys = Seq("user_id"),
      tsCol = "ts", carryCols = Seq("event_id", "cus"))
      .withColumnRenamed("asof_back_event_id", "bid")
      .withColumnRenamed("asof_fwd_event_id", "fid")
      .withColumn("bdt", unix_micros($"ts") - $"asof_back_cus")
      .withColumn("fdt", $"asof_fwd_cus" - unix_micros($"ts"))
    val pickBack = $"bid".isNotNull && ($"fid".isNull || $"bdt" <= $"fdt")
    both.select($"error_id", $"user_id",
      when(pickBack, $"bid").otherwise($"fid").as("nearest_click_id"),
      when(pickBack, $"bdt").otherwise($"fdt").as("nearest_us"))
  }

  val all: Seq[GraftQuery] = Seq(q15fAsofJoin, q15hAsofNearest)
}

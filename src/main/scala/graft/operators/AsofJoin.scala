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
  */
object AsofJoin {

  /** For each left row, attach the latest right payload with
    * right.ts ≤ left.ts on the same keys (inclusive ties — right rows
    * order before left rows at equal ts).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, carryCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val carryTypes = carryCols.map(c => c -> right.schema(c).dataType).toMap
    val leftTagged = carryCols.foldLeft(
      left.withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(s"__carry_$c", lit(null).cast(carryTypes(c)))
    }
    val rightTagged = {
      val base = right.select(
        (keys.map(col) :+ col(tsCol)) ++
          carryCols.map(c => col(c).as(s"__carry_$c")): _*)
        .withColumn("__side", lit(0))
      // null-pad the left-only columns so the union aligns
      left.columns.filterNot((keys :+ tsCol).contains)
        .foldLeft(base) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }
    val unioned = leftTagged.unionByName(rightTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = carryCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"__carry_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter($"__side" === 1)
      .drop("__side")
      .drop(carryCols.map(c => s"__carry_$c"): _*)
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

  val all: Seq[GraftQuery] = Seq(q15fAsofJoin)
}

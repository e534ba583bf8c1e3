package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort, Window}

/** Registry-wide null-ordering census (r15, repeatable — not part of
  * the driver contract): enumerate every ASCENDING ordering over a
  * NULLABLE expression in the registry's analyzed plans — the exact
  * engine-asymmetry class the heavy/heavyprice/heavytie fixtures
  * exhibit (Spark default asc = NULLS FIRST, DuckDB default = NULLS
  * LAST; descending is nulls-last on both, hence symmetric). Window
  * orderings drive cumulations and picks (the dangerous sites); bare
  * Sort orderings are listed too but only matter when a downstream
  * limit/fold is value-sensitive. The r15 run (56 hits) triaged to:
  * key-grain orderings (contract non-null), convention-filtered
  * measures (q9q/q9r/q9u/q24d...), structurally-coupled nulls (q1a's
  * o_year nulls exactly when its o_month partition does), literal
  * frames (q12c), and ONE live site — q9f's name tiebreak, exhibited
  * by heavytie and pinned asc_nulls_last. Re-run after adding any
  * query with a new ordered cumulation.
  *
  * Usage: java -cp target/scala-2.13/classes:/opt/spark/jars/\*
  *        graft.NullOrderCensus [sfDir]
  */
object NullOrderCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftConf.tune(spark)

    def ascNullable(orders: Seq[SortOrder]): Seq[String] =
      orders.collect {
        case so if so.direction == Ascending && so.child.nullable &&
          so.nullOrdering == NullsFirst =>
          so.child.sql.take(90)
      }

    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("q15")).foreach { name =>
        try {
          val plan: LogicalPlan =
            SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed
          val hits = plan.collect {
            case w: Window =>
              ascNullable(w.orderSpec).map(e => s"WINDOW $e")
            case s: Sort =>
              ascNullable(s.order).map(e => s"SORT $e")
          }.flatten
          hits.distinct.foreach(h => println(s"$name\t$h"))
        } catch {
          case t: Throwable =>
            println(s"$name\tERROR ${t.getMessage.take(80)}")
        }
      }
    spark.stop()
  }
}

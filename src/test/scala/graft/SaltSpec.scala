package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Salt

class SaltSpec extends SparkTestBase {

  test("salted aggregation equals the direct aggregation") {
    import spark.implicits._
    val li = Tables(spark, sfDir).lineitem
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice".cast(DecimalType(38, 6))).as("s"))
    val salted = Salt.saltedSum(li, Seq("l_returnflag"),
      $"l_extendedprice".cast(DecimalType(38, 6)), n = 8)
      .withColumnRenamed("salted_sum", "s")
    assert(direct.exceptAll(salted).count() == 0 &&
      salted.exceptAll(direct).count() == 0)
  }

  test("salted join rejects right/full join types") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "v")
    val b = Seq((1L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(a, b, Seq("k"), n = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(a, b, Seq("k"), n = 4, joinType = "full_outer")
    }
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val li = Tables(spark, sfDir).lineitem
      .select($"l_orderkey", $"l_linenumber")
    val ord = Tables(spark, sfDir).orders
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Salt.saltedJoin(li, ord, Seq("l_orderkey"), n = 4)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0 &&
      salted.exceptAll(plain).count() == 0)
  }

  test("AQE splits a skewed sort-merge join before salting is needed") {
    import spark.implicits._
    // salting (above) is the MANUAL fallback; the engine's first-line
    // answer to join skew is AQE's skew-join split. Build a hot key
    // carrying ~90% of the left side, force a sort-merge join with
    // thresholds low enough that local data trips the detector, and
    // assert the finalized plan marked the join skew=true.
    val left = spark.range(0, 200000)
      .select(when($"id" % 10 =!= 0, 0L).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = spark.range(0, 2000).select($"id".as("k"),
      ($"id" * 2).as("w"))
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = left.join(right, Seq("k"))
      joined.collect() // materialize THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}

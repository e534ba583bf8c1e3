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

  test("planted hot orderkey on the headline lineitem⋈orders join: " +
      "AQE splits it and the salt fallback matches the oracle") {
    import spark.implicits._
    // The q5a/q4a headline queries share this exact join shape; the
    // synthetic test below proves the mechanism, but nothing pinned
    // skew behavior on the REAL tables until now. Plant a hot
    // orderkey carrying ~3× the organic fact mass at sf0.01 and
    // assert (a) AQE's skew-split fires on the finalized plan, and
    // (b) the manual Salt fallback reproduces the unsalted oracle
    // aggregate on the same skewed input.
    val sf = "/root/testdata/sf0.01"
    val ord = Tables(spark, sf).orders
      .select($"o_orderkey", $"o_custkey")
    val hotKey = ord.agg(min($"o_orderkey")).first().getLong(0)
    val li = Tables(spark, sf).lineitem
      .select($"l_orderkey", $"l_extendedprice")
    val hot = spark.range(0, 200000)
      .select(lit(hotKey).as("l_orderkey"),
        ($"id" % 1000).cast("double").as("l_extendedprice"))
    val skewed = li.unionByName(hot)

    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = skewed
        .join(ord, skewed("l_orderkey") === ord("o_orderkey"))
        .select($"o_custkey", $"l_extendedprice")
      joined.collect() // materialize THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed headline join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }

    // Salt fallback ≡ oracle: per-customer revenue from the skewed
    // fact, decimal-exact so equality is bitwise
    val price = $"l_extendedprice".cast(DecimalType(38, 6))
    val direct = skewed
      .join(ord, skewed("l_orderkey") === ord("o_orderkey"))
      .groupBy($"o_custkey").agg(sum(price).as("rev"))
    val salted = Salt.saltedJoin(skewed,
        ord.select($"o_orderkey".as("l_orderkey"), $"o_custkey"),
        Seq("l_orderkey"), n = 8)
      .groupBy($"o_custkey").agg(sum(price).as("rev"))
    assert(direct.exceptAll(salted).count() == 0 &&
      salted.exceptAll(direct).count() == 0,
      "salted headline join diverged from the unsalted oracle")
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

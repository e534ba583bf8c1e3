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
}

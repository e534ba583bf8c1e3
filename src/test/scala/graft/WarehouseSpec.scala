package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Warehouse

/** Warehouse-build invariants: surrogate keys are unique (xxhash64
  * collision guard) and dim builders stay map-only — no Window (global
  * sort) and no Exchange (shuffle) in the dim plans, the property that
  * lets a 1.5 B-row dimension build without a single-task bottleneck.
  */
class WarehouseSpec extends SparkTestBase {

  private def keyIsUnique(df: DataFrame, key: String): Unit = {
    val dup = df.groupBy(col(key)).count().filter(col("count") > 1).count()
    assert(dup == 0, s"$key has $dup colliding values")
  }

  private def mapOnlyPlan(df: DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"$what plan contains a Window")
    // broadcast of the tiny nation/region side is fine; what must be
    // absent is a SHUFFLE of the dimension itself
    assert(!plan.replace("BroadcastExchange", "").contains("Exchange"),
      s"$what plan shuffles the dimension")
  }

  test("dim surrogate keys are unique and stable") {
    val t = Tables(spark, sfDir)
    val cust = Warehouse.dimCustomer(t).cache()
    keyIsUnique(cust, "customer_key")
    keyIsUnique(Warehouse.dimProduct(t), "product_key")
    keyIsUnique(Warehouse.dimSeller(t), "seller_key")
    // stability: rebuilding assigns identical keys (hash of natural
    // key, not position) — the SCD2 re-load property
    val again = Warehouse.dimCustomer(t)
      .select("customer_id", "customer_key")
    val first = cust.select("customer_id", "customer_key")
    assert(first.exceptAll(again).count() == 0 &&
      again.exceptAll(first).count() == 0)
    cust.unpersist()
  }

  test("SCD2 versions get distinct surrogates (versioned hash)") {
    import spark.implicits._
    // the r3 advice scenario: once scd2Rebuild emits version 2+,
    // xxhash64(natural_key) alone would collide across versions —
    // hashing (natural_key, version) must keep every row unique and
    // stay stable across re-loads
    val snaps = Seq(
      (1L, 10.0, "2020-01-01"), (1L, 20.0, "2020-06-01"),
      (1L, 30.0, "2021-01-01"),
      (2L, 5.0, "2020-01-01"), (2L, 5.0, "2020-06-01"))
      .toDF("customer_id", "bal", "snap")
    def build = graft.etl.Scd
      .scd2Rebuild(snaps, Seq("customer_id"), Seq("bal"), "snap")
      .withColumn("customer_key", xxhash64($"customer_id", $"version"))
    val hist = build.cache()
    keyIsUnique(hist, "customer_key")
    assert(hist.filter($"customer_id" === 1).count() == 3,
      "three changed snapshots must yield three versions")
    assert(hist.filter($"customer_id" === 2).count() == 1,
      "unchanged snapshot must not open a version")
    val again = build.select("customer_key")
    assert(hist.select("customer_key").exceptAll(again).count() == 0,
      "re-load must assign identical surrogates")
    hist.unpersist()
  }

  test("dim builders are map-only: no Window, no Exchange") {
    val t = Tables(spark, sfDir)
    mapOnlyPlan(Warehouse.dimProduct(t), "dimProduct")
    mapOnlyPlan(Warehouse.dimCustomer(t), "dimCustomer")
    mapOnlyPlan(Warehouse.dimSeller(t), "dimSeller")
  }

  test("fact_payment: split is exact, keys unique, sequentials dense") {
    import spark.implicits._
    val t = Tables(spark, sfDir)
    val fp = Warehouse.factPayment(t).cache()
    try {
      keyIsUnique(fp, "payment_key")
      // the cent split must reassemble each order total EXACTLY —
      // integer cents leave no room for float drift
      val totals = fp.groupBy($"order_id")
        .agg(sum(round($"payment_value" * 100).cast("long")).as("cents"),
          count(lit(1)).as("n_pay"),
          max($"payment_sequential").as("max_seq"))
      val orders = t.orders.select($"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("o_cents"))
      val drift = totals.join(orders, $"order_id" === $"o_orderkey")
        .filter($"cents" =!= $"o_cents").count()
      assert(drift == 0, s"$drift orders whose payment split drifts")
      // sequentials are dense 1..n (n = 1 + orderkey % 3)
      val sparse = totals
        .filter($"n_pay" =!= $"max_seq" ||
          $"n_pay" =!= (lit(1) + pmod($"order_id", lit(3))))
        .count()
      assert(sparse == 0, s"$sparse orders with non-dense sequentials")
      // multi-payment orders genuinely exist (the 5A avg-receipt
      // semantics depend on receipts > orders)
      assert(fp.filter($"payment_sequential" > 1).count() > 0)
    } finally fp.unpersist()
  }
}

package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.queries.GraftQuery

/** End-to-end star-schema build (SURVEY §7 step 4): the reference's
  * eleven Kettle transformations as pure `(sources…) => DataFrame`
  * functions over the harness tables, wired into one warehouse
  * handle. Patterns per dimension:
  *
  *  - surrogate keys: `xxhash64(natural_key, version)` for SCD2 dims
  *    (Kettle `Sequence`, D3, re-expressed per SURVEY §1.2) — map-only
  *    and shuffle-free where a global `row_number()` would funnel the
  *    whole dimension through ONE task's sort, and stable under re-loads
  *    (the same natural key + version always hashes to the same
  *    surrogate). The version MUST be in the hash: the reference's
  *    Sequence assigns per-ROW keys, so each SCD2 version needs its own
  *    surrogate or fact joins fan out once [[Scd.scd2Rebuild]] emits a
  *    version 2. SCD1 dims (dim_seller) hash the natural key alone —
  *    one row per key by construction. Collision odds are
  *    birthday-bounded (~n²/2⁶⁵: ~10⁻⁴ at 100 M members); q18 would
  *    surface a collision as a fan-out revenue mismatch, and
  *    WarehouseSpec asserts key uniqueness outright. Facts NEVER take a
  *    window over fact-cardinality data (keys come from joins against
  *    the dims).
  *  - SCD2 columns initialized as the reference's initial load
  *    (effective_from 2016-01-01, effective_to 2099-12-31, version 1 —
  *    `ETL for seller with scd2.ktr:523-570`); incremental maintenance
  *    is [[Scd.scd2Rebuild]].
  *  - OR-chain keep-filter (P3, review comments) and AND-chain
  *    error-sink (P2) both appear in the builders.
  */
object Warehouse {

  /** dim_customer analog: customer + nation/region names, SCD2 cols. */
  def dimCustomer(t: Tables): DataFrame = {
    val c = t.customer
    import c.sparkSession.implicits._
    val base = c
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey", "left")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey", "left")
      .select($"c_custkey".as("customer_id"), $"c_name".as("name"),
        $"c_mktsegment".as("segment"), $"n_name".as("nation"),
        $"r_name".as("region"), $"c_acctbal".as("acctbal"))
    base
      .withColumn("effective_from", lit("2016-01-01"))
      .withColumn("effective_to", lit(Scd.OpenEnd))
      .withColumn("version", lit(1))
      .withColumn("customer_key", xxhash64($"customer_id", $"version"))
  }

  /** dim_product analog from part (brand = category role). */
  def dimProduct(t: Tables): DataFrame = {
    val p = t.part
    import p.sparkSession.implicits._
    p.select($"p_partkey".as("product_id"), $"p_name".as("product_name"),
      $"p_brand".as("brand"), $"p_type".as("product_type"),
      $"p_size".as("size"), $"p_retailprice".as("retail_price"))
      .withColumn("effective_from", lit("2016-01-01"))
      .withColumn("effective_to", lit(Scd.OpenEnd))
      .withColumn("version", lit(1))
      .withColumn("product_key", xxhash64($"product_id", $"version"))
  }

  /** dim_seller analog from supplier + nation. */
  def dimSeller(t: Tables): DataFrame = {
    val s = t.supplier
    import s.sparkSession.implicits._
    s.join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey", "left")
      .select($"s_suppkey".as("seller_id"), $"s_name".as("seller_name"),
        $"n_name".as("nation"), $"s_acctbal".as("acctbal"))
      .withColumn("seller_key", xxhash64($"seller_id"))
  }

  /** fact_order_lines analog: the q7a star enrichment joined against
    * the dims' surrogate keys (DBLookup → hash-join lookups, J2). The
    * member-scale dims (customer/product/seller) carry NO broadcast
    * hint: at 100 TB they are 10⁸–10⁹ rows and an unconditional hint
    * is a hard driver OOM at the 8 GB broadcast cap, exactly the
    * argument that removed broadcast(customer) from the corr query.
    * AQE sees the dims' actual runtime size and still picks a
    * broadcast join whenever they genuinely fit.
    */
  def factOrderLines(t: Tables): DataFrame = {
    val li = t.lineitem
    import li.sparkSession.implicits._
    val cust = dimCustomer(t).select($"customer_id", $"customer_key")
    val prod = dimProduct(t).select($"product_id", $"product_key")
    val sell = dimSeller(t).select($"seller_id", $"seller_key")
    li.join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"customer_id", "left")
      .join(prod, $"l_partkey" === $"product_id", "left")
      .join(sell, $"l_suppkey" === $"seller_id", "left")
      .select(
        $"l_orderkey".as("order_id"),
        $"l_linenumber".as("order_item_id"),
        (datediff(to_date($"o_orderdate"), to_date(lit("1992-01-01"))) + 1)
          .cast(IntegerType).as("time_key"),
        $"customer_key", $"product_key", $"seller_key",
        lit(1).as("quantity"),
        $"l_extendedprice".as("price"),
        ($"l_extendedprice" * $"l_tax").as("freight_value"))
  }

  /** fact_review analog from events (review_score role = value
    * bucket), with the reference's OR-chain keep-filter (P3): keep
    * rows where at least one payload field is present. customer_key is
    * resolved by a hash-join lookup against dim_customer (J2) — the
    * fact must carry the dim's surrogate, never the raw natural id,
    * or joins to dim_customer silently match nothing now that
    * surrogates are xxhash64(natural_key, version). No broadcast
    * hint: dim_customer is member-scale (see [[factOrderLines]]);
    * AQE broadcasts it at runtime only when it actually fits.
    */
  def factReview(t: Tables): DataFrame = {
    val e = t.events
    import e.sparkSession.implicits._
    val cust = dimCustomer(t).select($"customer_id", $"customer_key")
    e.filter($"event_type".isNotNull || $"props".isNotNull)
      .join(cust, $"user_id" === $"customer_id", "left")
      .select($"event_id".as("review_id"), $"customer_key",
        (pmod($"value".cast(IntegerType), lit(5)) + 1).as("review_score"),
        to_date($"ts").as("review_date"))
  }

  /** fact_delivery from Olist-shaped order rows (`order_id, purchase_ts,
    * delivered_ts, estimated_ts, status`) — the reference's delivery
    * ETL semantics (SURVEY §1.3): day counts via `datediff` (equivalent
    * to the reference's dense time-key subtraction), and THREE-VALUED
    * on_time_delivery (`ETL for delivery.ktr:1147-1178` JS): true when
    * delay ≤ 0, false when late, NULL when the delivery date is
    * missing — query 5B's rate depends on the NULL case being excluded.
    */
  def factDelivery(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    val estimated = datediff(to_date($"estimated_ts"), to_date($"purchase_ts"))
    val actual    = datediff(to_date($"delivered_ts"), to_date($"purchase_ts"))
    val delay     = actual - estimated
    orders.select(
      $"order_id", $"status".as("order_status"),
      estimated.as("estimated_delivery_days"),
      actual.as("actual_delivery_days"),
      delay.as("delivery_delay_days"),
      when($"delivered_ts".isNull, lit(null).cast(BooleanType))
        .when(delay <= 0, true).otherwise(false).as("on_time_delivery"))
  }

  /** q18 — warehouse consistency probe (oracle-checked): the fact
    * joined back through surrogate keys must reproduce the raw-table
    * revenue per segment — proves key assignment is lossless (an
    * xxhash64 collision would fan the join out and inflate revenue).
    * The oracle keys by the natural id itself — any injective keying
    * yields the same ground-truth segment revenue, and DuckDB has no
    * Spark-compatible xxhash64.
    */
  val q18WarehouseBuild: GraftQuery = GraftQuery(
    "q18_warehouse_build",
    """WITH cust AS (
      |  SELECT c_custkey AS customer_id, c_mktsegment AS segment,
      |         c_custkey AS customer_key
      |  FROM customer),
      |fol AS (
      |  SELECT customer_key, l_extendedprice AS price
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  LEFT JOIN cust ON o_custkey = customer_id)
      |SELECT segment,
      |       COUNT(*) AS n_lines,
      |       CAST(CAST(SUM(CAST(price AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |         AS revenue
      |FROM fol JOIN cust USING (customer_key)
      |GROUP BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val cust = dimCustomer(t)
    factOrderLines(t)
      .join(cust.select($"customer_key", $"segment"), Seq("customer_key"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Exact.dsum($"price").as("revenue"))
  }

  val all: Seq[GraftQuery] = Seq(q18WarehouseBuild)
}

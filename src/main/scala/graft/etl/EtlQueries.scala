package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Exact
import graft.queries.GraftQuery

/** The reference's Kettle ETL dataflow patterns (SURVEY §2.1–§2.3)
  * re-expressed as single declarative DataFrame plans over the harness
  * star schema:
  *
  *  - q7a: fact-build star enrichment — the `etl for fact_orderlines.ktr`
  *    graph (MergeJoin + 5 uncached per-row DBLookups, `:764-1042`)
  *    becomes one shuffle join (lineitem⋈orders on the co-partitioned
  *    key) plus broadcast hash joins for every dim. At 100 TB the dims
  *    stay broadcast-able (≪8GB) and the single fact⋈fact shuffle is
  *    the only network stage.
  *  - q7b: validation filter + error sink — `FilterRows` AND-chain with
  *    the false-branch `TextFileOutput` (`etl for customer with
  *    scd2.ktr:780-833, 1072-1140`) as a filter-complement with a
  *    first-failing-rule reason label.
  *  - q7c: pre-aggregated lookup stream — `TableInput` SQL pre-agg +
  *    `StreamLookup` (`ETL for delivery.ktr:1017-1100, 975-1015`) as
  *    groupBy + left broadcast join back to the order grain.
  *  - q7d: cleansing — `ReplaceString`/`StringOperations` regex chains
  *    (`etl for geolocation with scd1.ktr:598-695`, category `_`→space,
  *    `^$`→"unkown") as codegen'd regexp_replace/trim/when chains.
  */
object EtlQueries {

  /** Dense day key from a fixed epoch — the reference's time_key
    * contract (SURVEY §1.3) without a window or generator join.
    */
  private val epoch = "1992-01-01"

  val q7aStarEnrich: GraftQuery = GraftQuery(
    "q7a_star_enrich",
    s"""SELECT l_orderkey, l_linenumber,
       |       CAST(datediff('day', DATE '$epoch', CAST(o_orderdate AS DATE)) + 1
       |            AS INTEGER) AS time_key,
       |       o_custkey AS customer_key, c_mktsegment AS segment,
       |       n_name AS customer_nation,
       |       l_partkey AS product_key, p_brand AS brand,
       |       l_suppkey AS seller_key, s_name AS seller_name,
       |       1 AS quantity,
       |       l_extendedprice AS price,
       |       CAST(CAST(CAST(l_extendedprice * l_tax AS DECIMAL(18,4))
       |            AS VARCHAR) AS DOUBLE) AS freight_value
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |LEFT JOIN customer ON o_custkey = c_custkey
       |LEFT JOIN nation ON c_nationkey = n_nationkey
       |LEFT JOIN part ON l_partkey = p_partkey
       |LEFT JOIN supplier ON l_suppkey = s_suppkey""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, $"l_orderkey" === $"o_orderkey")
        // nation is constant-cardinality (25 rows at any scale) →
        // static broadcast hint; customer/part/supplier are
        // member-scale (a hint is a driver OOM at 100 TB) → no hint,
        // AQE broadcasts them at runtime when they actually fit
        .join(t.customer, $"o_custkey" === $"c_custkey", "left")
        .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey", "left")
        .join(t.part, $"l_partkey" === $"p_partkey", "left")
        .join(t.supplier, $"l_suppkey" === $"s_suppkey", "left")
        .select(
          $"l_orderkey", $"l_linenumber",
          (datediff(to_date($"o_orderdate"), to_date(lit(epoch))) + 1)
            .cast(IntegerType).as("time_key"),
          $"o_custkey".as("customer_key"), $"c_mktsegment".as("segment"),
          $"n_name".as("customer_nation"),
          $"l_partkey".as("product_key"), $"p_brand".as("brand"),
          $"l_suppkey".as("seller_key"), $"s_name".as("seller_name"),
          lit(1).as("quantity"),
          $"l_extendedprice".as("price"),
          // 2dp×2dp product is intrinsically 4dp — the DECIMAL(18,4)
          // cast is exact (no tie ambiguity), string-roundtripped back
          // to DOUBLE for an engine-identical repr (see Exact)
          Exact.toDouble(($"l_extendedprice" * $"l_tax")
            .cast(DecimalType(18, 4))).as("freight_value"))
  }

  val q7bErrorSink: GraftQuery = GraftQuery(
    "q7b_error_sink",
    """SELECT l_orderkey, l_linenumber, l_discount, l_tax,
      |       CASE WHEN l_discount > 0.08 THEN 'discount_over_8pct'
      |            ELSE 'tax_over_6pct' END AS reject_reason
      |FROM lineitem
      |WHERE NOT (l_discount <= 0.08 AND l_tax <= 0.06)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      val valid = $"l_discount" <= 0.08 && $"l_tax" <= 0.06
      t.lineitem
        .filter(!valid)
        .select($"l_orderkey", $"l_linenumber", $"l_discount", $"l_tax",
          when($"l_discount" > 0.08, "discount_over_8pct")
            .otherwise("tax_over_6pct").as("reject_reason"))
  }

  val q7cPreaggLookup: GraftQuery = GraftQuery(
    "q7c_preagg_lookup",
    """WITH freight AS (
      |  SELECT l_orderkey,
      |         CAST(CAST(SUM(CAST(l_extendedprice * l_tax AS DECIMAL(38,6)))
      |              AS VARCHAR) AS DOUBLE) AS total_freight,
      |         COUNT(*) AS n_lines
      |  FROM lineitem GROUP BY 1)
      |SELECT o_orderkey, o_orderstatus,
      |       total_freight, n_lines,
      |       n_lines IS NOT NULL AS has_lines
      |FROM orders LEFT JOIN freight ON o_orderkey = l_orderkey""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      val freight = t.lineitem
        .groupBy($"l_orderkey")
        .agg(Exact.dsum($"l_extendedprice" * $"l_tax").as("total_freight"),
          count(lit(1)).as("n_lines"))
      t.orders
        .join(freight, $"o_orderkey" === $"l_orderkey", "left")
        .select($"o_orderkey", $"o_orderstatus",
          $"total_freight", $"n_lines",
          $"n_lines".isNotNull.as("has_lines"))
  }

  val q7dCleanse: GraftQuery = GraftQuery(
    "q7d_cleanse",
    """SELECT p_partkey,
      |       CASE WHEN regexp_replace(trim(p_name), '[ \t\n\x0B\f\r]+', ' ', 'g') = ''
      |            THEN 'unkown'
      |            ELSE regexp_replace(regexp_replace(trim(p_name),
      |                   '[ \t\n\x0B\f\r]+', ' ', 'g'), ' ', '_', 'g') END AS name_norm,
      |       upper(trim(p_brand)) AS brand_norm,
      |       lower(trim(p_type)) AS type_norm
      |FROM part""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    // reference cleanse chain: trim → collapse whitespace → '_' join,
    // empty → 'unkown' (sic — the reference's literal spelling,
    // `etl for products with scd2.ktr:871-920`)
    val collapsed = regexp_replace(trim($"p_name"), "[ \\t\\n\\x0B\\f\\r]+", " ")
    t.part.select(
      $"p_partkey",
      when(collapsed === "", "unkown")
        .otherwise(regexp_replace(collapsed, " ", "_")).as("name_norm"),
      upper(trim($"p_brand")).as("brand_norm"),
      lower(trim($"p_type")).as("type_norm"))
  }

  val all: Seq[GraftQuery] =
    Seq(q7aStarEnrich, q7bErrorSink, q7cPreaggLookup, q7dCleanse)
}

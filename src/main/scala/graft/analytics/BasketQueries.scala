package graft.analytics

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery
import graft.Staging.Stageable

/** Market-basket analysis (q25): association rules over order baskets
  * — support / confidence / lift for brand pairs bought together, the
  * classic BI co-purchase operator the reference's DAX layer implies
  * but never materializes.
  *
  * Scale design (100 TB): the quadratic step is bounded per basket,
  * not per corpus. Items are deduped to (basket, item) grain FIRST
  * (one keyed shuffle), baskets collapse to one sorted item array
  * each (second keyed shuffle), and pairs are generated MAP-SIDE from
  * each array — fanout ≤ C(items-per-basket, 2), which the basket
  * grain bounds (brand grain: ≤ C(25,2)); the pair aggregation is the
  * only further shuffle and map-side combines first. Item frequencies
  * and the basket total are tiny aggregates broadcast back onto the
  * pair rows — no shuffle touches the pair frame again.
  *
  * Determinism: every mining RULE is pure integer cross-
  * multiplication (support: n_ab·1000 ≥ 5·n_baskets; high-lift:
  * n_ab·n_baskets·100 ≥ 105·n_a·n_b) — no float ever decides
  * membership. confidence/lift are emitted as ROUND(,6) VALUE
  * columns only: int/int double division at the end is exact-rounded
  * identically in both engines (the q9l lesson).
  */
object BasketQueries {

  /** q25 — brand-pair association rules over order baskets. */
  val q25BasketRules: GraftQuery = GraftQuery(
    "q25_basket_rules",
    """WITH items AS (
      |  SELECT DISTINCT l.l_orderkey, p.p_brand
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
      |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
      |freq AS (SELECT p_brand, COUNT(*) AS n FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |         COUNT(*) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |  GROUP BY 1, 2)
      |SELECT pr.brand_a, pr.brand_b, fa.n AS n_a, fb.n AS n_b,
      |       pr.n_ab, nb.n_baskets,
      |       ROUND(CAST(pr.n_ab AS DOUBLE) / fa.n, 6) AS confidence,
      |       ROUND((CAST(pr.n_ab AS DOUBLE) * nb.n_baskets)
      |             / (fa.n * fb.n), 6) AS lift,
      |       pr.n_ab * nb.n_baskets * 100 >= 105 * fa.n * fb.n
      |         AS high_lift
      |FROM pairs pr
      |JOIN freq fa ON fa.p_brand = pr.brand_a
      |JOIN freq fb ON fb.p_brand = pr.brand_b
      |CROSS JOIN nb
      |WHERE pr.n_ab * 1000 >= 5 * nb.n_baskets""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val t = Tables(spark, dir)
      // three consumers (pairs, freq, nb) — stage the deduped item
      // grain once; eager localCheckpoint leaves no CacheManager entry
      val items = t.lineitem.select($"l_orderkey", $"l_partkey")
        .join(t.part.select($"p_partkey", $"p_brand"),
          $"l_partkey" === $"p_partkey")
        .select($"l_orderkey", $"p_brand")
        .distinct()
        .staged
      // one sorted item array per basket; pairs emitted map-side
      val pairs = items
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"p_brand")).as("bs"))
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs)), y ->
            |    struct(x AS brand_a, y AS brand_b))))""".stripMargin))
          .as("p"))
        .select($"p.brand_a", $"p.brand_b")
        .groupBy($"brand_a", $"brand_b")
        .agg(count(lit(1)).as("n_ab"))
      val freq = items.groupBy($"p_brand").agg(count(lit(1)).as("n"))
      val nb = items.select(
        countDistinct($"l_orderkey").as("n_baskets"))
      pairs
        .join(broadcast(freq.select($"p_brand".as("brand_a"),
          $"n".as("n_a"))), "brand_a")
        .join(broadcast(freq.select($"p_brand".as("brand_b"),
          $"n".as("n_b"))), "brand_b")
        .crossJoin(broadcast(nb))
        .filter($"n_ab" * 1000 >= lit(5) * $"n_baskets")
        .select($"brand_a", $"brand_b", $"n_a", $"n_b", $"n_ab",
          $"n_baskets",
          round($"n_ab".cast("double") / $"n_a", 6).as("confidence"),
          round(($"n_ab".cast("double") * $"n_baskets")
            / ($"n_a" * $"n_b"), 6).as("lift"),
          ($"n_ab" * $"n_baskets" * 100 >= lit(105) * $"n_a" * $"n_b")
            .as("high_lift"))
  }

  /** q25b — item-item collaborative filtering: for every part, the
    * top-3 most-similar parts by co-occurrence cosine
    * n_ab / √(n_a·n_b). Ranking rides the [[graft.functions.TopK]]
    * bounded-heap aggregator (O(k) state, map-side combining — the
    * per-group scale path, no window sort), keyed on the QUANTIZED
    * integer ⌊cos·1e9 + ½⌋ with part-id tiebreak (the q12q device:
    * float order keys are a cross-engine flake class; the cosine
    * itself — integer counts through one √ and one ÷, both IEEE-exact
    * — is emitted as a value column only). The top-3 skeleton joins
    * back to the pair frame for its audit columns (6k rows vs the
    * 240k-row pair side — AQE broadcasts the skeleton).
    */
  val q25bItemSimilarity: GraftQuery = GraftQuery(
    "q25b_item_similarity",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |up AS (
      |  SELECT a.l_partkey AS s, b.l_partkey AS t, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2),
      |both_dir AS (
      |  SELECT s, t, n_ab FROM up UNION ALL SELECT t, s, n_ab FROM up),
      |freq AS (
      |  SELECT l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM items GROUP BY 1),
      |cosd AS (
      |  SELECT b.s, b.t, b.n_ab,
      |         CAST(b.n_ab AS DOUBLE) / SQRT(CAST(fa.n * fb.n AS DOUBLE)) AS cosv
      |  FROM both_dir b JOIN freq fa ON b.s = fa.v JOIN freq fb ON b.t = fb.v),
      |ranked AS (
      |  SELECT s, t, n_ab, cosv,
      |         ROW_NUMBER() OVER (PARTITION BY s
      |           ORDER BY CAST(FLOOR(cosv * 1e9 + 0.5) AS BIGINT) DESC, t) AS rk
      |  FROM cosd)
      |SELECT s AS l_partkey, t AS sim_partkey, n_ab,
      |       ROUND(cosv, 6) AS cosine, CAST(rk AS INTEGER) AS rk
      |FROM ranked WHERE rk <= 3""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val t = Tables(spark, dir)
    val items = t.lineitem.select($"l_orderkey", $"l_partkey").distinct()
      .staged // consumers: pair build + freq
    val up = items
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("bs"))
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
          |  transform(slice(bs, i + 2, size(bs)), y ->
          |    struct(x AS s, y AS t))))""".stripMargin)).as("p"))
      .select($"p.s", $"p.t")
      .groupBy($"s", $"t").agg(count(lit(1)).as("n_ab"))
    val bothDir = up.unionAll(up.select($"t".as("s"), $"s".as("t"), $"n_ab"))
    val freq = items.groupBy($"l_partkey").agg(count(lit(1)).as("n"))
    val cosd = bothDir
      .join(broadcast(freq.toDF("v_a", "n_a")), $"s" === $"v_a")
      .join(broadcast(freq.toDF("v_b", "n_b")), $"t" === $"v_b")
      .select($"s", $"t", $"n_ab",
        ($"n_ab".cast("double") /
          sqrt(($"n_a" * $"n_b").cast("double"))).as("cosv"))
      .staged // consumers: TopK skeleton + audit join-back
    val top3 = graft.functions.TopK.topk(3)
    val skeleton = cosd
      // quantized keys are < 2^31 ≪ 2^53, so the Double score the
      // aggregator heaps on represents the BIGINT key exactly
      .groupBy($"s")
      .agg(top3(floor($"cosv" * 1e9 + 0.5).cast("double"), $"t").as("top"))
      .select($"s", posexplode($"top").as(Seq("pos", "e")))
      .select($"s".as("sk_s"), $"e._2".as("sk_t"),
        ($"pos" + 1).cast("int").as("rk"))
    cosd.join(broadcast(skeleton),
      $"s" === $"sk_s" && $"t" === $"sk_t")
      .select($"s".as("l_partkey"), $"t".as("sim_partkey"), $"n_ab",
        round($"cosv", 6).as("cosine"), $"rk")
  }

  /** q25c — sequential next-order transitions: which part follows
    * which across a customer's CONSECUTIVE orders — the temporal
    * complement to q25's same-basket co-occurrence and the raw count
    * table behind next-item recommendation. Consecutive = adjacent in
    * the per-customer (o_orderdate, o_orderkey) order (the unique key
    * breaks date ties deterministically, the q24c device).
    *
    * Scale shape: a customer-keyed window assigns order positions
    * (partition = one customer's orders, bounded), the rn→rn+1
    * self-join is customer-keyed (co-partitioned, no blowup beyond
    * consecutive pairs), the part×part expansion is bounded by
    * basket² per TRANSITION (not per customer), and the final count
    * is a (from, to)-keyed hash-agg with map-side combine. Top-20 cut
    * is integer-ordered (n DESC, part_from, part_to) — no float
    * anywhere.
    */
  val q25cNextItem: GraftQuery = GraftQuery(
    "q25c_next_item",
    """WITH seq AS (
      |  SELECT o_custkey, o_orderkey,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders WHERE o_orderdate IS NOT NULL),
      |pairs AS (
      |  SELECT a.o_orderkey AS k_from, b.o_orderkey AS k_to
      |  FROM seq a JOIN seq b
      |    ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1),
      |trans AS (
      |  SELECT la.l_partkey AS part_from, lb.l_partkey AS part_to,
      |         COUNT(*) AS n
      |  FROM pairs p
      |  JOIN lineitem la ON la.l_orderkey = p.k_from
      |  JOIN lineitem lb ON lb.l_orderkey = p.k_to
      |  GROUP BY 1, 2)
      |SELECT part_from, part_to, n, CAST(rnk AS INTEGER) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER
      |        (ORDER BY n DESC, part_from, part_to) AS rnk FROM trans)
      |WHERE rnk <= 20""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    // Null contract (q15/q24c measure-exclusion convention, the r16
    // `linkedseq` fixture exhibited it live): an UNDATEABLE order has
    // no position in a temporal sequence, so it is excluded from the
    // per-customer ordering on BOTH engines — without the exclusion
    // the null date rides Spark's nulls-FIRST ascending rank vs
    // DuckDB's nulls-LAST, shifting every transition pair in that
    // customer's chain. Pinned by LinkedSeqSpec + mutation m48; see
    // NULL_CONTRACT.md.
    val seq = t.orders
      .filter($"o_orderdate".isNotNull)
      .select($"o_custkey", $"o_orderkey",
        row_number().over(Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")).as("rn"))
    val nxt = seq.select($"o_custkey", $"o_orderkey".as("k_to"),
      ($"rn" - 1).as("rn"))
    val pairs = seq.join(nxt, Seq("o_custkey", "rn"))
      .select($"o_orderkey".as("k_from"), $"k_to")
    val li = t.lineitem.select($"l_orderkey", $"l_partkey")
    val trans = pairs
      .join(li.toDF("k_from", "part_from"), "k_from")
      .join(li.toDF("k_to", "part_to"), "k_to")
      .groupBy($"part_from", $"part_to")
      .agg(count(lit(1)).as("n"))
    // global top-20: single-partition window over the already-tiny
    // aggregated transition table would still sort it all — use the
    // TakeOrdered path instead, then re-rank the 20 survivors
    val top = trans
      .orderBy($"n".desc, $"part_from".asc, $"part_to".asc)
      .limit(20)
    top.withColumn("rank", row_number().over(
        Window.orderBy($"n".desc, $"part_from".asc, $"part_to".asc))
        .cast("int"))
  }

  val all: Seq[GraftQuery] =
    Seq(q25BasketRules, q25bItemSimilarity, q25cNextItem)
}

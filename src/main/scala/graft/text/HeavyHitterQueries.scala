package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** Exact heavy hitters over a token-pair stream via the two-pass
  * sketch-then-recount pattern (no reference analogue — LLM-pipeline
  * extension: corpus-frequency floors for boilerplate phrase mining
  * and tokenizer-vocabulary seeding need "every pair above phi of the
  * stream", exactly).
  *
  * Pass 1 aggregates the whole stream through the mergeable
  * Misra–Gries sketch ([[graft.functions.MisraGries]], capacity
  * [[MgCapacity]]) — ONE scan with map-side combine whose state is k
  * counters per partition, never a per-key hash table over the
  * stream's full key space. Its ≤ k candidate keys provably contain
  * every item with frequency > n/(k+1); with the threshold at
  * n/[[PhiInv]] > n/(k+1), no true heavy hitter can be missed.
  * Pass 2 recounts ONLY the candidates (array_contains against the
  * broadcast 1-row candidate frame) and keeps keys whose exact count
  * clears the integer threshold cnt·[[PhiInv]] > n — both engines
  * compare pure integers; `share` is a rounded VALUE column.
  *
  * At 100 TB the full-key-space GROUP BY of the oracle twin is a
  * corpus-scale shuffle, while this plan shuffles k≤32 candidate
  * partial counts per partition in pass 2 and nothing per-key in
  * pass 1 — that asymmetry is the point of the operator.
  */
object HeavyHitterQueries {

  /** Sketch capacity: guarantees candidates cover every key above
    * n/33 of the stream — comfortably below the 1/[[PhiInv]] output
    * threshold.
    */
  val MgCapacity = 32

  /** Output threshold denominator: heavy hitter = count·20 > n,
    * i.e. share > 5%.
    */
  val PhiInv = 20

  /** Planted hot keys: (key, doc_id modulus, copies per qualifying
    * doc). The organic bigram space (~31² near-uniform keys, each
    * ≈0.1% of the stream) has no heavy hitters, so the positives are
    * planted deterministically: mod-2 and mod-3 plants clear the 5%
    * bar, the mod-4 plant lands near 1.6% — a candidate the exact
    * recount must reject.
    */
  private val Plants = Seq(
    ("__hot_mod2__", 2, 8),
    ("__hot_mod3__", 3, 10),
    ("__hot_mod4__", 4, 4))

  /** Consecutive-token-pair stream + planted hot keys, as a single
    * string column `bg`.
    */
  private def stream(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val organic = docs
      .withColumn("w", split(trim($"text"), "\\s+"))
      .select(explode(expr(
        """zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
    Plants.foldLeft(organic) { case (acc, (key, m, copies)) =>
      acc.unionByName(docs.filter($"doc_id" % m === 0)
        .select(explode(array_repeat(lit(key), copies)).as("bg")))
    }
  }

  private val streamSql: String = {
    val plants = Plants.map { case (key, m, copies) =>
      s"""SELECT '$key' AS bg
         |FROM documents, (SELECT unnest(range($copies)))
         |WHERE doc_id % $m = 0""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT unnest(list_transform(range(len(w) - 1),
       |                             i -> w[i + 1] || ' ' || w[i + 2])) AS bg
       |FROM (SELECT string_split_regex(trim(text), '\\s+') AS w
       |      FROM documents)
       |UNION ALL
       |$plants""".stripMargin
  }

  /** q12v — exact >5% heavy hitters of the bigram stream. */
  val q12vHeavyHitters: GraftQuery = GraftQuery(
    "q12v_heavy_hitters",
    s"""WITH bg AS ($streamSql),
       |tot AS (SELECT COUNT(*) AS n FROM bg)
       |SELECT bg AS bigram,
       |       CAST(COUNT(*) AS BIGINT) AS cnt,
       |       ROUND(CAST(COUNT(*) AS DOUBLE) / n, 6) AS share
       |FROM bg, tot
       |GROUP BY bg, n
       |HAVING COUNT(*) * $PhiInv > n""".stripMargin) { (spark, dir) =>
    heavyHitters(spark, stream(Tables(spark, dir).documents), col("bg"))
  }

  /** The reusable operator: exact items of `key` whose count clears
    * count·[[PhiInv]] > n, via MG candidates + filtered recount. The
    * input is scanned twice (sketch pass, recount pass) — inherent to
    * exact two-pass heavy hitters and linear, unlike a full-key-space
    * aggregation which shuffles every distinct key.
    */
  def heavyHitters(spark: SparkSession, in: DataFrame, key: Column)
      : DataFrame = {
    import spark.implicits._
    val mg = udaf(graft.functions.MisraGries.MgAggregator(MgCapacity),
      org.apache.spark.sql.Encoders.STRING)
    val keyed = in.select(key.as("bg"))
    val pass1 = keyed.agg(mg($"bg").as("cands"), count(lit(1)).as("n"))
    keyed.crossJoin(broadcast(pass1))
      .filter(array_contains($"cands", $"bg"))
      .groupBy($"bg", $"n")
      .agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * PhiInv > $"n")
      .select($"bg".as("bigram"), $"cnt",
        round($"cnt".cast("double") / $"n", 6).as("share"))
  }

  val all: Seq[GraftQuery] = Seq(q12vHeavyHitters)
}

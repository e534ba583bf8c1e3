package graft.text

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** TF-IDF keyword extraction — the classic text-analysis operator the
  * LLM-pipeline family was still missing: per-document salient terms,
  * the building block for topic tagging, near-dup explanation, and
  * quality filtering by topical coherence.
  *
  * Scale shape (one scan, two key shuffles, no driver loops):
  *   1. tokenize + explode — map-side, same whitespace tokenizer as
  *      q12j so the DuckDB twin stays `string_split_regex`;
  *   2. (doc, term) term frequencies — ONE shuffle on the pair;
  *   3. document frequencies — shuffle of the (doc, term) grain on
  *      term (already distinct per doc, so df = COUNT(*)); at 100 TB
  *      the vocabulary is millions of terms — a proper shuffle join
  *      back onto the tf grain, NOT a broadcast (AQE may still choose
  *      one at small SF);
  *   4. corpus size N — single-row aggregate, cross-joined as a
  *      broadcast scalar (q1b's pattern);
  *   5. top-k per document — a window partitioned by doc_id, which is
  *      safe at any scale: a partition holds one document's distinct
  *      terms, bounded by document length, never by corpus size.
  *
  * Ranking is PURE-INTEGER — (tf DESC, df ASC, term ASC) — rather
  * than by the floating tfidf score: mathematically tied scores from
  * different (tf, df) pairs exist (2·ln(N/4) = ln(N²/16) = 1·ln(N) at
  * N = 16), and cross-engine libm ulp differences would order such
  * ties arbitrarily. The integer key is a monotone proxy within a
  * document (higher tf, then rarer term wins) and makes the cut
  * deterministic on both engines; the double score is emitted as a
  * rounded VALUE column only.
  */
object TfIdfQueries {

  val q12oTfidfTopk: GraftQuery = GraftQuery(
    "q12o_tfidf_topk",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (
      |  SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
      |  FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, term, tf, df, cf,
      |       ROUND(tf * LN(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      |FROM (SELECT t.doc_id, t.term, t.tf, d.df, d.cf, n.n_docs,
      |             ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |               ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rn
      |      FROM tf t JOIN df d USING (term) CROSS JOIN n)
      |WHERE rn <= 5""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
    val tf = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    // df aggregates tf's COUNT as well as its rows (cf = collection
    // frequency, a useful stat in its own right) ON PURPOSE: with cf,
    // column pruning cannot reduce this branch to a distinct-only
    // aggregate, both consumers compute the IDENTICAL scan + explode +
    // partial-count + (doc_id, term) exchange, and ReuseExchange
    // tokenizes the corpus ONCE (MixtureTfIdfSpec pins the reuse) —
    // without cf the pruned df branch re-scans the full corpus.
    val df = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("cf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy($"doc_id")
      .orderBy($"tf".desc, $"df".asc, $"term".asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"doc_id", $"term", $"tf", $"df", $"cf",
        round($"tf" * log($"n_docs".cast("double") / $"df"), 6)
          .as("tfidf"))
  }

  val all: Seq[GraftQuery] = Seq(q12oTfidfTopk)
}

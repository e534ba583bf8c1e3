package graft.text

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.GraftQuery

/** Unigram language-model quality scoring — the perplexity-proxy
  * filter of CCNet-style curation: score each document by its
  * cross-entropy under the corpus's own unigram model,
  * xent(d) = −Σ_t tf_t(d) · ln(cf_t / T) / |d|. Documents whose
  * token distribution diverges from the corpus (rare-token soup,
  * boilerplate, encoding junk) score high and can be cut at a
  * quantile — the missing "statistical quality" sibling of q12b's
  * rule-based score.
  *
  * Scale shape mirrors q12o: tokenize once (the cf branch consumes
  * tf's count, so ReuseExchange collapses both consumers onto ONE
  * scan — spec-pinned), model probabilities are one term-keyed
  * aggregate joined back at term grain, the corpus total rides a
  * broadcast scalar, and the per-doc reduction is doc-bounded.
  *
  * CROSS-ENGINE FLOAT DISCIPLINE: a plain SUM of doubles is
  * order-dependent and flaky across engines, so the per-doc sum is a
  * LEFT FOLD IN TERM ORDER on both sides — Spark sorts the
  * (term, x) structs and folds with `aggregate`; the DuckDB twin
  * builds `LIST(x ORDER BY term)` and folds with `list_reduce`.
  * Same addition order → bitwise-identical doubles → hashable.
  */
object UnigramQueries {

  val q12rUnigramLogprob: GraftQuery = GraftQuery(
    "q12r_unigram_logprob",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS t FROM cf),
      |doc AS (
      |  SELECT t.doc_id,
      |         LIST(t.tf * LN(CAST(c.cf AS DOUBLE) / tot.t)
      |              ORDER BY t.term) AS xs,
      |         CAST(SUM(t.tf) AS BIGINT) AS n_tokens
      |  FROM tf t JOIN cf c USING (term) CROSS JOIN tot
      |  GROUP BY 1)
      |SELECT doc_id, n_tokens,
      |       ROUND(-list_reduce(xs, (a, b) -> a + b) / n_tokens, 6) AS xent
      |FROM doc""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val tf = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy($"term").agg(sum($"tf").as("cf"))
    val tot = cf.agg(sum($"cf").as("t"))
    tf.join(cf, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("x", $"tf" * log($"cf".cast("double") / $"t"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"term", $"x"))).as("xs"),
        sum($"tf").as("n_tokens"))
      .select($"doc_id", $"n_tokens",
        round(-aggregate($"xs", lit(0.0),
            (acc, s) => acc + s.getField("x")) / $"n_tokens", 6)
          .as("xent"))
  }

  val all: Seq[GraftQuery] = Seq(q12rUnigramLogprob)
}

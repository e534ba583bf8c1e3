package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Staging.Stageable

/** Edit-distance-1 similarity self-join via deletion-neighborhood
  * blocking (the FastSS device): two strings are within Levenshtein
  * distance 1 iff their {self + all single-character-deletion}
  * neighborhoods intersect — deletion covers deletes, insertion is the
  * mirror delete on the other side, and substitution meets at the
  * both-deleted form. Candidates therefore come from an EQUI-join on
  * the shared variant (inverted-index style, linear fan-out of
  * len+1 variants per token), never an all-pairs cross join; a final
  * `levenshtein ≤ 1` check discards the distance-2 collisions the
  * blocking admits (two different deletions meeting at the same
  * variant).
  *
  * Scale (100 TB): the input is VOCABULARY-grain (distinct tokens),
  * already reduced by a corpus hash-agg, so the join is small relative
  * to the corpus; the variant key bounds each bucket by alphabet-size
  * × token-length, so no hot key. The quadratic brute-force form this
  * replaces is what the DuckDB oracle runs (q13j), proving the
  * blocking lossless.
  */
object EditDistanceJoin {

  /** All (tok_a < tok_b) pairs within Levenshtein distance 1, with
    * each side's payload column carried through. `vocab` must be
    * token-grain (one row per distinct `tok`).
    */
  def distance1Pairs(vocab: DataFrame, tok: String, payload: String): DataFrame = {
    require(tok != "__variant" && payload != "__variant",
      "__variant is reserved by EditDistanceJoin")
    // tiny (vocab-grain) staging barrier: without it the self-join
    // below re-derives the vocab subtree — including its corpus scan —
    // once per side (the q12s device; 600 rows here, not a cache pin)
    val v = vocab.select(col(tok), col(payload)).staged
    val variants = v.select(col(tok), col(payload),
      explode(array_distinct(concat(
        array(col(tok)),
        expr(s"""transform(sequence(1, length($tok)),
                 |  k -> concat(substring($tok, 1, k-1),
                 |              substring($tok, k+1, length($tok))))""".stripMargin))))
        .as("__variant"))
    val a = variants.toDF(s"${tok}_a", s"${payload}_a", "__variant")
    val b = variants.toDF(s"${tok}_b", s"${payload}_b", "__variant")
    a.join(b, "__variant")
      .filter(col(s"${tok}_a") < col(s"${tok}_b"))
      .select(s"${tok}_a", s"${tok}_b", s"${payload}_a", s"${payload}_b")
      .distinct()
      .filter(levenshtein(col(s"${tok}_a"), col(s"${tok}_b")) <= 1)
  }
}

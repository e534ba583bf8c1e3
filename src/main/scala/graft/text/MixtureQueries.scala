package graft.text

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.DistributedRank
import graft.queries.GraftQuery

/** Data-mixture sampling — drawing a training corpus to target
  * per-source proportions, the step between curation (q12a–q12k) and
  * packing (q12l): "give me 600 documents with sources weighted
  * 1:2:3:4" as an exact, deterministic, re-runnable cut.
  *
  * Design:
  *   - the per-stratum selection order is md5(doc_id ‖ "|mix") with
  *     doc_id as tiebreak — a deterministic uniform shuffle, the same
  *     device as q12f's rebalance and q12i's shuffle order, so the
  *     sample is reproducible on ANY engine (the DuckDB twin ranks by
  *     the identical hash);
  *   - ranking within source rides [[DistributedRank]], NOT
  *     `Window.partitionBy(source)`: a mixture has FEW strata by
  *     construction, so the window form funnels each stratum — at
  *     100 TB, many terabytes — through one task. DistributedRank
  *     range-partitions (source, hash) across many tasks and stitches
  *     global positions with an O(partitions·strata) offset pass;
  *   - quotas are computed IN-PLAN from the source name (weight
  *     w = (src index mod 4) + 1, quota = T·w/Σw = 12·w at T = 600),
  *     so there is no driver-side quota table to ship; an
  *     under-supplied stratum is clamped naturally because rank never
  *     exceeds supply (at sf0.01, w ≥ 3 strata hold only 25 docs
  *     against quotas of 36/48 — the clamp is exercised, not
  *     hypothetical).
  */
object MixtureQueries {

  /** Total budget T=600 over 20 sources with weights 1..4 (Σw = 50):
    * quota(srcK) = 12 · ((K mod 4) + 1).
    */
  val q12pMixtureSample: GraftQuery = GraftQuery(
    "q12p_mixture_sample",
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|mix'), doc_id)
      |           AS sample_rank
      |  FROM documents)
      |SELECT doc_id, source, sample_rank
      |FROM ranked
      |WHERE sample_rank <=
      |      12 * ((CAST(SUBSTR(source, 4) AS INT) % 4) + 1)""".stripMargin) {
    (spark, dir) =>
      import spark.implicits._
      val docs = Tables(spark, dir).documents
        .select($"doc_id", $"source")
        .withColumn("__mixkey",
          md5(concat($"doc_id".cast("string"), lit("|mix"))))
      val quota =
        lit(12) * ((substring($"source", 4, 10).cast("int") % 4) + 1)
      DistributedRank.rankNtile(docs,
          groupCols = Seq("source"),
          orderCols = Seq(col("__mixkey"), col("doc_id")),
          ntiles = 1, rankName = "sample_rank", ntileName = "__tile")
        .filter($"sample_rank" <= quota)
        .select($"doc_id", $"source", $"sample_rank")
  }

  /** q12q — weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis exponential race): doc i wins a top-k slot with
    * probability proportional to its weight, here length-biased
    * (w = n_chars + 1 — "prefer substantial documents", the common
    * quality-weighted curation draw). Each doc gets
    * key = −ln(u)/w with u a 52-bit uniform DERIVED FROM md5(doc_id),
    * and the sample is the k smallest keys — so like q12p the draw is
    * deterministic and engine-independent, which is what makes a
    * hash-gated oracle possible at all (both engines parse the same
    * 13 md5 hex digits to the same integer; ÷(2⁵²+1) keeps u in
    * (0, 1] so ln is always finite).
    *
    * ORDERING DISCIPLINE: the race is decided by the key QUANTIZED to
    * a fixed-point BIGINT (⌊key·10⁹ + ½⌋) with doc_id as tiebreak,
    * never by the raw double — the q12o/q12s integer-ranking rule.
    * Ordering doubles computed independently by JVM Math.log and
    * DuckDB libm risks a 1-ulp reorder of near-ties at the k=100 cut;
    * after quantization a 1-ulp divergence flips the integer only
    * when the scaled key lies within ~10⁻⁵ of a snap boundary AND the
    * neighbour at the cut shares the adjacent integer — double-rare —
    * while genuine ties fall to the deterministic doc_id order. The
    * float survives only as arithmetic input, not as a sort key.
    *
    * Scale shape: the key is map-side arithmetic; the global top-k
    * plans as TakeOrderedAndProject (per-partition O(k) heaps merged
    * on the driver, MixtureTfIdfSpec pins it) — no global sort, no
    * shuffle of the corpus, the same pattern q5a/q21 established for
    * top-k. Sampling WITH heavier tails or per-stratum floors
    * composes: run per source via q12p's DistributedRank, or raise k.
    */
  val q12qWeightedSample: GraftQuery = GraftQuery(
    "q12q_weighted_sample",
    """SELECT doc_id, source, n_chars
      |FROM documents
      |WHERE n_chars + 1 > 0
      |ORDER BY CAST(FLOOR(
      |           -LN((CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR) || '|ws'),
      |                      1, 13)) AS BIGINT) + 1.0) / 4503599627370497.0)
      |             / (n_chars + 1) * 1e9 + 0.5) AS BIGINT),
      |         doc_id
      |LIMIT 100""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    // w = n_chars + 1 ≤ 0 (dirty metadata) means zero sampling
    // probability: excluded from the race on both engines — the raw
    // −ln(u)/w would divide by zero (w = 0) or win with certainty
    // (w < 0), both wrong answers for "weight nothing"
    Tables(spark, dir).documents
      .filter($"n_chars" + 1 > 0)
      .withColumn("__u",
        (conv(substring(md5(concat($"doc_id".cast("string"), lit("|ws"))),
          1, 13), 16, 10).cast("long") + lit(1.0)) / lit(4503599627370497.0))
      .withColumn("__key", -log($"__u") / ($"n_chars" + 1))
      .withColumn("__ikey",
        floor($"__key" * lit(1e9) + lit(0.5)).cast("long"))
      .orderBy($"__ikey", $"doc_id")
      .limit(100)
      .select($"doc_id", $"source", $"n_chars")
  }

  val all: Seq[GraftQuery] = Seq(q12pMixtureSample, q12qWeightedSample)
}

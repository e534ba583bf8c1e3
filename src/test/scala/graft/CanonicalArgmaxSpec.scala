package graft

import org.apache.spark.sql.functions._

import graft.text.DedupQueries

/** Pins the q13i canonical-doc argmax on a crafted fixture whose
  * boundaries the sf0.01 oracle replay does NOT exercise (measured:
  * zero len-tied components there — the m33/m34 unexercised-boundary
  * lesson). The argmax packs (len DESC, doc_id ASC) into one
  * collision-free decimal ordering `len·10^20 + (2^63−1 − doc_id)`
  * and takes `max_by(doc_id, enc)`; this suite is the spec gate for
  * the tie-break SLOT direction (mutation m37 flips `− doc_id` to
  * `+ doc_id`, invisible to the oracle replay) and the hash-agg plan
  * shape the r13 census rewrite bought (SURVEY §8.11).
  */
class CanonicalArgmaxSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(rows: Seq[(Long, Long, Long)]) =
    DedupQueries.canonicalFrom(
        rows.toDF("component", "doc_id", "len").repartition(4))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("longest member wins; len ties break to the SMALLEST doc_id") {
    val out = canon(Seq(
      // len tie at the max: 7 vs 3 → 3 wins
      (1L, 7L, 40L), (1L, 3L, 40L), (1L, 9L, 12L),
      // no tie: strictly longest wins even with the largest id
      (2L, 100L, 99L), (2L, 5L, 98L),
      // singleton passes through
      (3L, 42L, 1L)))
    assert(out(1L) == ((3L, 3L, 40L)))
    assert(out(2L) == ((2L, 100L, 99L)))
    assert(out(3L) == ((1L, 42L, 1L)))
  }

  test("negative doc_ids order correctly inside the decimal id slot") {
    // tie at len 10: −9 < −5 → −9 wins; the slot must hold the full
    // (Long.MinValue, Long.MaxValue] range without bleeding into len
    val out = canon(Seq(
      (1L, -5L, 10L), (1L, -9L, 10L), (1L, 3L, 9L),
      // extreme ids at a len tie: Long.MaxValue vs 0 → 0 wins
      (2L, Long.MaxValue, 5L), (2L, 0L, 5L)))
    assert(out(1L) == ((3L, -9L, 10L)))
    assert(out(2L) == ((2L, 0L, 5L)))
  }

  test("NULL len orders below every real len (DuckDB nulls-last DESC)") {
    // The enc coalesces NULL len to -1, so an ALL-null-len component
    // still elects the smallest doc_id (like the twin's ROW_NUMBER,
    // where DESC puts NULLs last) instead of max_by skipping every
    // row and emitting NULL canonical_doc_id; a MIXED component's
    // null-len member must lose to any real len ≥ 0. canon_len stays
    // null-skipping on both engines.
    val out = DedupQueries.canonicalFrom(
        Seq(
          // all-null-len component → smallest doc_id, NULL canon_len
          (1L, 9L, Option.empty[Long]), (1L, 4L, Option.empty[Long]),
          // mixed: len 0 beats NULL even on a smaller doc_id
          (2L, 3L, Option.empty[Long]), (2L, 8L, Some(0L)))
          .toDF("component", "doc_id", "len").repartition(4))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)))))
      .toMap
    assert(out(1L) == ((2L, 4L, None)), s"all-null: ${out(1L)}")
    assert(out(2L) == ((2L, 8L, Some(0L))), s"mixed: ${out(2L)}")
  }

  test("the argmax hash-aggregates (no SortAggregate, no window)") {
    val plan = DedupQueries.canonicalFrom(
      Seq((1L, 2L, 3L)).toDF("component", "doc_id", "len"))
      .queryExecution.sparkPlan
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec => s
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(sorts.isEmpty, s"expected pure hash shape, got:\n$plan")
    assert(plan.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }.nonEmpty)
  }
}

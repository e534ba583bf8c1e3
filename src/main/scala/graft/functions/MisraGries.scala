package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a mergeable Spark
  * [[Aggregator]] (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantee: after aggregating a stream of n items with capacity k,
  * every item with true frequency > n/(k+1) is present among the
  * sketch keys — regardless of how Spark partitioned the input or in
  * which order partials merged. The sketch alone over-approximates;
  * exact heavy-hitter output comes from a second, candidate-filtered
  * recount pass (see `HeavyHitterQueries.q12v`), which is the
  * standard two-pass exact-at-scale formulation: pass 1 is one
  * map-side-combining scan producing ≤ k candidates, pass 2 recounts
  * only those k keys.
  *
  * Buffer is an immutable count map of ≤ k entries. `reduce` on an
  * absent key with a full buffer decrements all k counters (the MG
  * step) — O(k) for that row, but each such decrement destroys k
  * prior increments, so total work is O(k) per row worst-case with a
  * small constant k (32 here), and amortized far less on skewed
  * input. `merge` sums two partials and, when over capacity, subtracts
  * the (k+1)-th largest count from all (the mergeable-summaries
  * reduction), preserving the error bound.
  */
object MisraGries {

  final case class MgAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k > 0, s"capacity must be positive, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], e: String): Map[String, Long] =
      b.get(e) match {
        case Some(c)            => b.updated(e, c + 1)
        case None if b.size < k => b.updated(e, 1L)
        case None =>
          // decrement-all: drop keys reaching zero, skip adding e
          b.collect { case (key, c) if c > 1 => key -> (c - 1) }
      }

    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (combined.size <= k) combined
      else {
        val s = combined.valuesIterator.toArray.sortBy(-_).apply(k)
        combined.collect { case (key, c) if c > s => key -> (c - s) }
      }
    }

    /** Sorted candidate keys — deterministic output independent of
      * map iteration order.
      */
    override def finish(b: Map[String, Long]): Seq[String] =
      b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }
}

package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.12's reserved `Aggregator` slot):
  * per-group top-k as a single-pass, MERGEABLE bounded heap — the
  * scale alternative to `orderBy().limit(k)` inside a group: no
  * per-group sort materialization, O(k) state per partial, partials
  * combine associatively, so it map-side-combines like any algebraic
  * aggregate. Useful when k ≪ group size at 100 TB (e.g. top sellers
  * per nation over billions of lines).
  *
  * Ties break on the payload (ascending) so results are total-ordered
  * and deterministic.
  *
  * NULL-score CONTRACT (r16, hardening the r15 q21 root cause at the
  * operator): the input score is BOXED ([[TopK.In]]) because a
  * product encoder over a PRIMITIVE Double silently coerces NULL to
  * 0.0 BEFORE the aggregator can see it — "no score data" must never
  * rank as "score zero". A null-score row is IGNORED by [[reduce]];
  * a group with only null scores finishes EMPTY. Callers should use
  * [[TopK.topk]], which bakes the null-preserving encoder in — see
  * NULL_CONTRACT.md convention A. Pinned by TopKSpec's null-input
  * case + mutation m44 (retooled r16: the original call-site
  * filter-drop became an EQUIVALENT mutant once this operator was
  * hardened, so the pin moved here — q21 keeps its filter as the
  * convention's statement and the cheaper plan).
  */
object TopK {

  type Entry = (Double, Long) // (score, payload id)

  /** Heap input row: (boxed score, payload id) — boxed so a NULL
    * survives the encoder boundary instead of reading as 0.0. */
  type In = (java.lang.Double, Long)

  final case class TopKAggregator(k: Int)
      extends Aggregator[In, mutable.PriorityQueue[Entry], Seq[Entry]] {

    // min-heap on (score asc, id desc) → root is the weakest entry
    private def heapOrdering: Ordering[Entry] =
      Ordering.by[Entry, (Double, Long)] { case (s, id) => (-s, id) }

    override def zero: mutable.PriorityQueue[Entry] =
      mutable.PriorityQueue.empty[Entry](heapOrdering)

    private def push(b: mutable.PriorityQueue[Entry],
                     e: Entry): mutable.PriorityQueue[Entry] = {
      b.enqueue(e)
      if (b.size > k) b.dequeue()
      b
    }

    override def reduce(b: mutable.PriorityQueue[Entry],
                        e: In): mutable.PriorityQueue[Entry] =
      if (e._1 == null) b else push(b, (e._1.doubleValue, e._2))

    override def merge(a: mutable.PriorityQueue[Entry],
                       b: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
      b.foreach(push(a, _))
      a
    }

    override def finish(b: mutable.PriorityQueue[Entry]): Seq[Entry] =
      b.toSeq.sortBy { case (s, id) => (-s, id) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Entry]] =
      Encoders.kryo[mutable.PriorityQueue[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** The sanctioned untyped entry point: the udaf with the
    * null-preserving boxed-input encoder baked in, so a caller can't
    * accidentally pass `Encoders.product[(Double, Long)]` and
    * resurrect the NULL→0.0 coercion this operator exists to ban.
    */
  def topk(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(TopKAggregator(k),
      Encoders.product[In])
}

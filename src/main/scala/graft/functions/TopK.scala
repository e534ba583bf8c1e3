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
  */
object TopK {

  type Entry = (Double, Long) // (score, payload id)

  final case class TopKAggregator(k: Int)
      extends Aggregator[Entry, mutable.PriorityQueue[Entry], Seq[Entry]] {

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
                        e: Entry): mutable.PriorityQueue[Entry] = push(b, e)

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
}

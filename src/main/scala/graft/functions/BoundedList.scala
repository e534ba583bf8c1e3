package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded collect-list: gathers a group's elements UNLESS the group
  * exceeds `cap`, in which case the group finishes as None. The
  * partial buffer never holds more than cap+1 elements — unlike
  * `collect_list`, a hot key (the boilerplate-shingle skew case)
  * cannot OOM an aggregation buffer, and partials merge
  * associatively, so the plan keeps map-side combine. This turns the
  * document-frequency cap into a single-pass, single-shuffle
  * operation: group → bounded list → drop None, where the
  * count-then-anti-join formulation scans the input twice.
  */
object BoundedList {

  /** n counts ALL elements seen (may exceed elems.size once capped). */
  final case class Buf(n: Int, elems: List[Long])

  final case class BoundedListAggregator(cap: Int)
      extends Aggregator[Long, Buf, Option[Seq[Long]]] {
    require(cap > 0, s"cap must be positive, got $cap")

    override def zero: Buf = Buf(0, Nil)

    override def reduce(b: Buf, e: Long): Buf =
      if (b.n > cap) b else Buf(b.n + 1, e :: b.elems)

    override def merge(a: Buf, b: Buf): Buf =
      if (a.n > cap) a
      else if (b.n > cap) b
      else Buf(a.n + b.n, (a.elems ::: b.elems).take(cap + 1))

    /** Sorted ascending so downstream pair generation gets a total
      * order for free (doc_a < doc_b by construction).
      */
    override def finish(b: Buf): Option[Seq[Long]] =
      if (b.n > cap) None else Some(b.elems.sorted)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Seq[Long]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Seq[Long]]]()
  }
}

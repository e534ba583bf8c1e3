package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded collect-SET: gathers a group's DISTINCT elements UNLESS
  * the group exceeds `cap` distinct values, in which case the group
  * finishes as None. The partial buffer never holds more than cap+1
  * elements — unlike `collect_set`, a hot key (the boilerplate-shingle
  * skew case) cannot OOM an aggregation buffer, and partials merge
  * associatively, so the plan keeps map-side combine. This turns the
  * document-frequency cap into a single-pass, single-shuffle
  * operation: group → bounded distinct list → drop None — where a
  * count-then-anti-join formulation scans the input twice, and a
  * separate upstream `.distinct()` would shuffle the full input mass
  * once more before grouping.
  */
object BoundedList {

  /** over = the group exceeded cap distinct elements (buffer dropped).
    *
    * `elems` is declared `Seq` (not `List`): Spark's PRODUCT encoder
    * officially supports Seq fields, and only the CODEGEN'd
    * deserializer happens to insert the Seq→List conversion a List
    * field needs — the interpreted path (factoryMode=NO_CODEGEN, the
    * conservative/debugging session) passes the raw Seq to the
    * constructor and dies with EXPRESSION_DECODING_FAILED /
    * "argument type mismatch" (flushed by
    * ParallelismInvarianceSpec's execution-mode axis). The runtime
    * values are still Lists; only the declared field type changes,
    * so buffers, results, and the oracle are untouched.
    */
  final case class Buf(over: Boolean, elems: Seq[Long])

  final case class BoundedListAggregator(cap: Int)
      extends Aggregator[Long, Buf, Option[Seq[Long]]] {
    require(cap > 0, s"cap must be positive, got $cap")

    override def zero: Buf = Buf(over = false, Nil)

    override def reduce(b: Buf, e: Long): Buf =
      if (b.over || b.elems.contains(e)) b // contains is O(cap), cap ≤ ~50
      else if (b.elems.length >= cap) Buf(over = true, Nil)
      else Buf(over = false, e +: b.elems)

    override def merge(a: Buf, b: Buf): Buf =
      if (a.over || b.over) Buf(over = true, Nil)
      else {
        val es = (a.elems ++ b.elems).distinct
        if (es.length > cap) Buf(over = true, Nil) else Buf(over = false, es)
      }

    /** Sorted ascending so downstream pair generation gets a total
      * order for free (doc_a < doc_b by construction).
      */
    override def finish(b: Buf): Option[Seq[Long]] =
      if (b.over) None else Some(b.elems.sorted)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Option[Seq[Long]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Seq[Long]]]()
  }
}

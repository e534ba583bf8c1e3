package graft

import org.apache.spark.sql.functions._

/** q12y BM25 headroom gate (r9 verdict task 1): run the REAL q12y
  * pipeline on a synthetic corpus whose total token count TL > 10⁷ —
  * past the old BIGINT bound, where the numerator idf_q6·22·tf·TL
  * provably wraps a signed 64-bit integer — and require every emitted
  * score to equal an independent BigInt (arbitrary-precision)
  * re-derivation of the same formula. Passing proves the
  * DECIMAL(38,0) `div` path computes the exact 128-bit quotient, not
  * a silently wrapped product.
  *
  * Corpus shape (all arithmetic below re-derived in the test body,
  * nothing hard-coded): 606 docs; doc i carries token w(i%20)
  * repeated 19 990 times, and docs 0..2 additionally carry "rare"
  * ×10 — so TL ≈ 1.21·10⁷, per-term tf ≈ 2·10⁴, and the w-term
  * products idf_q6(≈3·10⁶)·22·tf·TL ≈ 1.6·10¹⁹ exceed
  * Long.MaxValue ≈ 9.2·10¹⁸.
  */
class TfIdfOverflowSpec extends SparkTestBase {
  import spark.implicits._

  test("q12y BM25 scores are exact past the Long-overflow bound (TL > 1e7)") {
    val tmp = java.nio.file.Files.createTempDirectory("bm25_overflow").toString
    val nDocs = 606
    val baseReps = 19990
    val rareReps = 10

    spark.range(nDocs).select(
      $"id".as("doc_id"),
      concat(
        rtrim(repeat(concat(lit("w"), ($"id" % 20).cast("string"), lit(" ")),
          baseReps)),
        when($"id" < 3, lit(" " + Seq.fill(rareReps)("rare").mkString(" ")))
          .otherwise(lit(""))).as("text"),
      lit("en").as("lang"), lit("synthetic").as("source"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // ---- independent BigInt reference over the same corpus ----
    val tf = scala.collection.mutable.Map.empty[(Long, String), Long]
    for (i <- 0L until nDocs) {
      tf((i, s"w${i % 20}")) = baseReps.toLong
      if (i < 3) tf((i, "rare")) = rareReps.toLong
    }
    val len = (0L until nDocs).map(i => i -> tf.collect {
      case ((d, _), c) if d == i => c }.sum).toMap
    val tl = len.values.sum
    val dfm = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    assert(tl > 10000000L, s"corpus must exceed the old TL bound, got $tl")
    def idfQ6(df: Long): Long =
      math.floor(math.log((2.0 * nDocs - 2.0 * df + 1) / (2.0 * df + 1) + 1.0)
        * 1e6 + 0.5).toLong
    // the products this corpus feeds through the division really do
    // exceed Long — the scenario the DECIMAL(38,0) path exists for
    val maxNum = tf.map { case ((_, t), c) =>
      BigInt(idfQ6(dfm(t))) * 22 * c * tl }.max
    assert(maxNum > BigInt(Long.MaxValue),
      s"corpus must overflow the old BIGINT numerator, max product $maxNum")

    val queries = (0L until nDocs).filter(_ % 101 == 0)
    val expected = queries.flatMap { q =>
      val qterms = tf.keys.collect { case (d, t) if d == q => t }.toSet
      val cand = tf.keys.collect {
        case (d, t) if d != q && qterms(t) => d }.toSet
      val scored = cand.toSeq.map { d =>
        val matched = qterms.toSeq.filter(t => tf.contains((d, t)))
        val score = matched.map { t =>
          val num = BigInt(idfQ6(dfm(t))) * 22 * tf((d, t)) * tl
          val den = BigInt(10) * tl * tf((d, t)) + BigInt(3) * tl +
            BigInt(9) * len(d) * nDocs
          num / den  // BigInt division truncates toward zero, as both engines do
        }.sum
        (q, d, matched.size.toLong, score.toLong)
      }
      scored.sortBy { case (_, d, _, s) => (-s, d) }.take(5).zipWithIndex
        .map { case ((qq, d, m, s), i) => (qq, d, m, s, i + 1) }
    }.toSet

    val got = SparkEntry.queries("q12y_bm25_topk")(spark, tmp)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(got == expected,
      s"BM25 mismatch past TL bound:\n only spark: ${got -- expected}\n only ref: ${expected -- got}")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.text.BpeQueries

/** BPE merge-rule training: plain-Scala replay of the full training
  * loop on the real corpus, plus planted micro-cases that pin the
  * greedy-overlap and tie-break semantics.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference BPE trainer: driver-side, no Spark, no string-replace
    * tricks — sequences are real Seq[String], merges applied by an
    * explicit left-to-right scan.
    */
  private def trainReference(words: Map[String, Long], merges: Int)
      : Seq[(Int, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, f) => w.map(_.toString) -> f }
    val out = Seq.newBuilder[(Int, String, Long)]
    for (k <- 1 to merges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val ((l, r), c) = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.head
      out += ((k, l + r, c))
      def mergeSeq(syms: Seq[String]): Seq[String] = {
        val b = collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2 // greedy left-to-right, non-overlapping
          } else { b += syms(i); i += 1 }
        }
        b.toSeq
      }
      vocab = vocab.map { case (syms, f) => mergeSeq(syms) -> f }
    }
    out.result()
  }

  test("q29 merge table equals the plain-Scala trainer on the corpus") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = trainReference(words, BpeQueries.Merges)
    val got = BpeQueries.q29BpeTrain.fn(spark, sfDir)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == expected,
      s"merge tables differ:\n got=$got\n exp=$expected")
  }

  test("greedy overlap: (a,a) over 'aaaa' merges twice, 'aaa' once") {
    // 'aaaa' → [aa, aa]; 'aaa' → [aa, a]: the left-to-right
    // non-overlapping rule the replace() device must reproduce
    val ref = trainReference(Map("aaaa" -> 1L, "aaa" -> 1L), 2)
    // round 1: pair (a,a) count 3+2=5 → 'aa'
    assert(ref.head == ((1, "aa", 5L)))
    // round 2 over [aa,aa] and [aa,a]: (aa,aa)=1, (aa,a)=1 →
    // tie-break l ASC then r ASC: ("aa","a") wins ("a" < "aa")
    assert(ref(1) == ((2, "aaa", 1L)))
  }

  test("symbol boundary: rule (b,c) must NOT fuse across [ab, c]") {
    // The planted suffix-collision case: after (a,b) is learned,
    // 'abc' is [ab, c]; a later rule (b,c) matches the RAW STRING
    // 'b<US>c' inside 'ab<US>c' but not the symbol pair — a string
    // replace would fuse the word to one symbol 'abc'. Pin the
    // symbol-granular semantics on both the reference trainer and
    // the Spark fold.
    val ref = trainReference(Map("abc" -> 3L, "ab" -> 6L, "bc" -> 5L), 3)
    // r1 (a,b)=9 beats (b,c)=8; r2 (b,c)=5 touches only 'bc';
    // r3 (ab,c)=3 proves [ab, c] survived r2 un-fused
    assert(ref == Seq((1, "ab", 9L), (2, "bc", 5L), (3, "abc", 3L)))
    val vocab = Seq(("abc", 3L), ("xbc", 1L)).toDF("word", "freq")
      .withColumn("seq", expr(
        """array_join(transform(sequence(1, length(word), 1),
          |  i -> substring(word, i, 1)), '')""".stripMargin))
    val out = BpeQueries
      .applyMerges(vocab, Seq(("a", "b"), ("b", "c")))
      .select($"word", split($"seq", "").as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("abc") == Seq("ab", "c"),
      s"rule (b,c) fused across a symbol boundary: ${out("abc")}")
    assert(out("xbc") == Seq("x", "bc"))
  }

  test("property: the Spark symbol fold equals the imperative scan on " +
    "random sequences and rules") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random symbol sequences over a 3-letter alphabet with 1-2 char
    // symbols (so rules can collide with symbol suffixes/prefixes —
    // exactly the boundary class the string replace got wrong), random
    // 2-rule merge chains
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "aa")
    val word = Gen.listOfN(6, sym)
    val rule = Gen.zip(sym, sym)
    val caseGen = Gen.zip(Gen.listOfN(8, word), Gen.listOfN(2, rule))
    def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
      val b = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.toSeq
    }
    val cases = (1 to 12).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { case (words, rules) =>
      val vocab = words.zipWithIndex
        .map { case (w, i) => (s"w$i", 1L, w.mkString("")) }
        .toDF("word", "freq", "seq")
      val got = BpeQueries.applyMerges(vocab, rules)
        .select($"word", $"seq").as[(String, String)].collect().toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val expected = rules.foldLeft(w: Seq[String]) {
          case (s, (l, r)) => refMerge(s, l, r)
        }
        assert(got(s"w$i") == expected.mkString(""),
          s"fold diverged on $w with rules $rules: " +
            s"got ${got(s"w$i").split('').toSeq}, want $expected")
      }
    }
  }

  test("applyMerges reproduces the trained segmentation") {
    val words = Seq(("scanner", 4L), ("scan", 2L), ("banner", 1L))
      .toDF("word", "freq")
    val vocab = words.select($"word", $"freq",
      array_join(expr(
        "transform(sequence(1, length(word), 1), i -> substring(word, i, 1))"),
        "\u001f").as("seq"))
    val merges = Seq(("a", "n"), ("an", "n"), ("s", "c"))
    val out = BpeQueries.applyMerges(vocab, merges)
      .select($"word", split($"seq", "\u001f").as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("scanner") == Seq("sc", "ann", "e", "r"))
    assert(out("scan") == Seq("sc", "an"))
    assert(out("banner") == Seq("b", "ann", "e", "r"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.NormalizeText

/** Known-vector and integration tests for the Unicode normalization
  * expression (NFC is additionally oracle-gated end-to-end by q12u;
  * NFKC has no DuckDB twin, so its contract is pinned here). Every
  * non-ASCII codepoint is spelled as an escape so composed vs
  * decomposed cannot be silently rewritten by an editor pass.
  */
class NormalizeSpec extends SparkTestBase {

  private val eAcuteComposed = "caf\u00E9"
  private val eAcuteDecomposed = "cafe\u0301"
  private val ringComposed = "\u00C5ngstr\u00F6m"
  private val ringDecomposed = "A\u030Angstro\u0308m"

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("i").select(c.as("s")).collect().head.getString(0)
  }

  test("NFC recomposes decomposed sequences; ASCII passes through") {
    assert(one(NormalizeText.nfc(lit(eAcuteDecomposed))) === eAcuteComposed)
    assert(one(NormalizeText.nfc(lit(ringDecomposed))) === ringComposed)
    assert(one(NormalizeText.nfc(lit("plain ascii 123"))) ===
      "plain ascii 123")
    // already-composed input is unchanged
    assert(one(NormalizeText.nfc(lit(eAcuteComposed))) === eAcuteComposed)
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    // U+FB01 LATIN SMALL LIGATURE FI -> "fi"; U+FF21 FULLWIDTH A -> "A"
    assert(one(NormalizeText.nfkc(lit("\uFB01le \uFF21"))) === "file A")
    assert(one(NormalizeText.nfc(lit("\uFB01le"))) === "\uFB01le",
      "NFC must NOT fold compatibility ligatures")
    // NFKC also recomposes canonical sequences
    assert(one(NormalizeText.nfkc(lit(eAcuteDecomposed))) === eAcuteComposed)
  }

  test("null propagates; codegen stays whole-stage") {
    import spark.implicits._
    val df = Seq(Some(eAcuteDecomposed), Option.empty[String]).toDF("s")
      .select(NormalizeText.nfc($"s").as("n"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.flatMap(r => Option(r.getString(0))).toList ===
      List(eAcuteComposed))
    // codegen pin on a parquet-backed frame — a local relation is
    // constant-folded into LocalTableScan before codegen ever runs.
    // fallback=false makes a Janino compile failure of the generated
    // static call throw instead of silently running interpreted (the
    // star marker alone would not catch that).
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val scan =
      try {
        val sc = Tables(spark, sfDir).documents
          .select(NormalizeText.nfc($"text").as("n"))
        sc.collect()
        sc
      } finally saved match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None    => spark.conf.unset("spark.sql.codegen.fallback")
      }
    val plan = scan.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the *(n) star prefix is the whole-stage-codegen marker in the
    // executedPlan rendering; an interpreted fallback drops the star
    assert("""\*\(\d+\) Project \[graft_nfc""".r
        .findFirstIn(plan).isDefined,
      s"normalization fell out of whole-stage codegen:\n$plan")
  }

  test("graft_nfc / graft_nfkc resolve in SQL after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT graft_nfc('" + eAcuteDecomposed + "') AS a, " +
        "graft_nfkc('\uFB01le') AS b")
      .collect().head
    assert(r.getString(0) === eAcuteComposed)
    assert(r.getString(1) === "file")
  }
}

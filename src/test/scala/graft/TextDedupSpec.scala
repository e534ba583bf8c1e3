package graft

import org.apache.spark.sql.functions._

import graft.text.{DedupQueries, SimilarityQueries, TextQueries}

class TextDedupSpec extends SparkTestBase {

  test("exact dedup finds exactly the planted duplicates") {
    import spark.implicits._
    val docs = Tables(spark, sfDir).documents
    val planted = docs.filter($"doc_id" % 7 === 0).count()
    val groups = DedupQueries.q13aExactDedup.fn(spark, sfDir).cache()
    assert(groups.count() == planted)
    assert(groups.filter($"n_copies" =!= 2).count() == 0)
    assert(groups.agg(sum($"n_removed")).head.getLong(0) == planted)
    groups.unpersist()
  }

  test("jaccard pairs are within (0,1] and above threshold") {
    import spark.implicits._
    val pairs = DedupQueries.q13bNgramJaccard.fn(spark, sfDir).cache()
    assert(pairs.filter($"jaccard" < 0.5 || $"jaccard" > 1.0).count() == 0)
    assert(pairs.filter($"doc_a" >= $"doc_b").count() == 0)
    pairs.unpersist()
  }

  test("minhash-LSH candidates recover the high-jaccard pairs") {
    import spark.implicits._
    val jac = DedupQueries.q13bNgramJaccard.fn(spark, sfDir)
      .filter($"jaccard" >= 0.8)
      .select($"doc_a", $"doc_b")
    val lsh = DedupQueries.q13cMinhashLsh.fn(spark, sfDir)
      .select($"doc_a", $"doc_b")
    // every near-identical pair must be caught by banding
    assert(jac.exceptAll(lsh).count() == 0)
  }

  test("simhash is a 16-bit value; near-dup docs collide") {
    import spark.implicits._
    val sh = DedupQueries.q13dSimhash.fn(spark, sfDir).cache()
    assert(sh.filter($"simhash" < 0 || $"simhash" > 65535).count() == 0)
    assert(sh.count() == Tables(spark, sfDir).documents.count())
    sh.unpersist()
  }

  test("brute-force ANN: 5 ranked neighbors per query, cosine in [-1,1]") {
    import spark.implicits._
    val topk = SimilarityQueries.q14aAnnBruteTopk.fn(spark, sfDir).cache()
    val perQuery = topk.groupBy($"query_id").count()
    assert(perQuery.filter($"count" =!= 5).count() == 0)
    assert(topk.filter(abs($"cosine") > 1.0 + 1e-9).count() == 0)
    topk.unpersist()
  }

  test("LSH ANN returns bucket-mates ranked by cosine") {
    import spark.implicits._
    val res = SimilarityQueries.q14bAnnLsh.fn(spark, sfDir).cache()
    assert(res.filter($"rank" > 3).count() == 0)
    // within each query, ranks must follow descending cosine
    val bad = res.withColumn("prev",
      lag($"cosine", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"rank")))
      .filter($"prev".isNotNull && $"cosine" > $"prev")
    assert(bad.count() == 0)
    res.unpersist()
  }

  test("IVF ANN: ranked within-cell neighbors, valid cosine") {
    import spark.implicits._
    val res = SimilarityQueries.q14cAnnIvf.fn(spark, sfDir).cache()
    assert(res.count() > 0)
    assert(res.filter($"rank" > 3).count() == 0)
    assert(res.filter(abs($"cosine") > 1.0 + 1e-9).count() == 0)
    // within a query, ranks follow descending cosine
    val bad = res.withColumn("prev",
      lag($"cosine", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"rank")))
      .filter($"prev".isNotNull && $"cosine" > $"prev")
    assert(bad.count() == 0)
    res.unpersist()
  }

  test("shingles: docs with fewer than 3 tokens yield none, no crash") {
    import spark.implicits._
    val docs = Seq((1L, "one"), (2L, "one two"), (3L, "one two three"),
      (4L, "  "), (5L, "a b c d")).toDF("doc_id", "text")
    val sh = TextQueries.shingles(spark, docs).collect()
    assert(!sh.exists(r => r.getLong(0) <= 2L),
      "sub-shingle docs must produce no shingles")
    assert(sh.count(_.getLong(0) == 3L) == 1)
    assert(sh.count(_.getLong(0) == 5L) == 2)
  }

  test("fingerprint: identical texts share winnow_fp") {
    import spark.implicits._
    val fp = TextQueries.q12dFingerprint.fn(spark, sfDir)
    val conflicting = fp.groupBy($"text_hash")
      .agg(countDistinct($"winnow_fp").as("n"))
      .filter($"n" > 1)
    assert(conflicting.count() == 0)
  }
}

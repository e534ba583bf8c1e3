package graft

import org.apache.spark.sql.functions._

import graft.text.CurationQueries

/** Invariants for the corpus-curation operators (q12g/h/i, q13g).
  * Value-level correctness is oracle-gated at sf0.01; these pin the
  * operator contracts on sf0.001.
  */
class CurationSpec extends SparkTestBase {

  test("q12w funnel chains and matches an independent first-fail count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = graft.text.CurationQueries.q12wFilterFunnel
      .fn(spark, sfDir).collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 4)
    // conservation: out = in - dropped, and each stage feeds the next
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") ==
        r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped"))
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out"))
    }
    // independent recount of the first failing rule per doc
    val docs = Tables(spark, sfDir).documents
    val tooShort = docs.filter($"n_chars" < 150).count()
    assert(rows(0).getAs[Long]("n_dropped") == tooShort)
    val badLang = docs.filter($"n_chars" >= 150 && $"lang" === "zh").count()
    assert(rows(1).getAs[Long]("n_dropped") == badLang)
    assert(rows(0).getAs[Long]("n_in") == docs.count())
  }

  test("q12g finds exactly the planted PII and leaves the rest clean") {
    import spark.implicits._
    val out = CurationQueries.q12gPiiScrub.fn(spark, sfDir).cache()
    try {
      // planted positives: one email per %10 doc, one phone per %15 doc
      assert(out.filter($"doc_id" % 10 === 0 && $"n_emails" =!= 1)
        .count() == 0)
      assert(out.filter($"doc_id" % 15 === 0 && $"n_phones" =!= 1)
        .count() == 0)
      // no false positives on unplanted docs
      assert(out.filter($"doc_id" % 10 =!= 0 && $"n_emails" =!= 0)
        .count() == 0)
      assert(out.filter($"doc_id" % 15 =!= 0 && $"n_phones" =!= 0)
        .count() == 0)
      // redaction round-trip: a clean doc's redacted hash is its own
      // text hash (replacement must not touch non-PII content)
      val docs = Tables(spark, sfDir).documents
        .select($"doc_id".as("d"), md5($"text").as("orig_hash"))
      val cleanChanged = out
        .filter($"doc_id" % 10 =!= 0 && $"doc_id" % 15 =!= 0)
        .join(docs, $"doc_id" === $"d")
        .filter($"redacted_hash" =!= $"orig_hash")
      assert(cleanChanged.count() == 0)
    } finally out.unpersist()
  }

  test("q12h repetition fractions are bounded and 2-gram counts line up") {
    import spark.implicits._
    val out = CurationQueries.q12hRepetitionStats.fn(spark, sfDir).cache()
    try {
      assert(out.filter($"top_token_frac" < 0 || $"top_token_frac" > 1 ||
        $"top_2gram_frac" < 0 || $"top_2gram_frac" > 1 ||
        $"dup_2gram_frac" < 0 || $"dup_2gram_frac" > 1).count() == 0)
      // a doc with n tokens has exactly n-1 2-gram occurrences
      assert(out.filter($"n_tokens" >= 2 &&
        $"n_2grams" =!= $"n_tokens" - 1).count() == 0)
      // a top 2-gram with count > 1 is itself duplicate mass, so the
      // top fraction may only exceed the dup fraction when max_bg == 1
      assert(out.filter($"top_2gram_frac" > $"dup_2gram_frac" &&
        $"top_2gram_frac" * $"n_2grams" > 1.5).count() == 0)
    } finally out.unpersist()
  }

  test("q12i shuffle order is a deterministic permutation with even shards") {
    import spark.implicits._
    val a = CurationQueries.q12iShuffleOrder.fn(spark, sfDir).cache()
    try {
      val n = a.count()
      // positions are exactly 1..N, each once
      assert(a.select($"shuffle_pos").distinct().count() == n)
      assert(a.agg(min($"shuffle_pos"), max($"shuffle_pos")).first()
        match { case r => r.getLong(0) == 1L && r.getLong(1) == n })
      // shard sizes differ by at most one (NTILE contract)
      val sizes = a.groupBy($"shard").count()
        .agg(min($"count"), max($"count")).first()
      assert(sizes.getLong(1) - sizes.getLong(0) <= 1)
      // rerun assigns identical positions (reproducible recipe)
      val b = CurationQueries.q12iShuffleOrder.fn(spark, sfDir)
        .withColumnRenamed("shuffle_pos", "pos_b")
        .select($"doc_id".as("d"), $"pos_b")
      assert(a.join(b, $"doc_id" === $"d")
        .filter($"shuffle_pos" =!= $"pos_b").count() == 0)
    } finally a.unpersist()
  }

  test("q12j approx vocab within 5% of the exact twin per language") {
    import spark.implicits._
    // the registered query outputs tolerance verdicts (so it can
    // oracle-gate); value-level error is pinned on the same sketch
    val exact = CurationQueries.q12jVocabStats.fn(spark, sfDir)
      .select($"lang", $"vocab_size".as("v_exact"))
    val approx = Tables(spark, sfDir).documents
      .select($"lang".as("l"), explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy($"l")
      .agg(approx_count_distinct($"tok", 0.01).as("v_approx"))
    val off = exact.join(approx, $"lang" === $"l")
      .filter(abs($"v_approx" - $"v_exact") >
        $"v_exact" * 0.05)
    assert(off.count() == 0, off.collect().mkString(", "))
    // and every verdict the registered query emits is true
    val verdicts = CurationQueries.q12jVocabApprox.fn(spark, sfDir)
    assert(verdicts.filter(!$"vocab_ok").count() == 0,
      "a language's HLL estimate left its 5% tolerance")
  }

  test("q12k pipeline output respects every stage's contract") {
    import spark.implicits._
    val out = CurationQueries.q12kCurationPipeline.fn(spark, sfDir).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // planted duplicates (shifted ids) must not survive exact dedup
      assert(out.filter($"doc_id" >= 1000000L).count() == 0)
      // holdout docs never reach the training set
      assert(out.filter($"doc_id" % 97 === 0).count() == 0)
      // quality gate held
      assert(out.filter($"quality" < 0.45).count() == 0)
      // every survivor passes the rebalance keep rule (recompute)
      val byte0 = conv(substr(md5(concat($"doc_id".cast("string"),
        lit("|rebalance"))), lit(1), lit(2)), 16, 10).cast("int")
      val rates = Map("en" -> 128, "es" -> 192, "de" -> 192,
        "fr" -> 256, "zh" -> 96)
      val thr = rates.foldLeft(when(lit(false), 0)) {
        case (c, (l, r)) => c.when($"lang" === l, r) }.otherwise(0)
      assert(out.filter(byte0 >= thr).count() == 0)
      // shuffle positions are exactly 1..N
      assert(out.select($"shuffle_pos").distinct().count() == n)
      val mm = out.agg(min($"shuffle_pos"), max($"shuffle_pos")).first()
      assert(mm.getLong(0) == 1L && mm.getLong(1) == n)
    } finally out.unpersist()
  }

  test("q12k fused gates reproduce the unfused stage composition exactly") {
    import spark.implicits._
    import graft.text.TextQueries
    import graft.text.CurationQueries.{repetitionStats, contaminationFlags}
    // r18 fused the three gate tokenizations into one staged token
    // array + one token-grain aggregation; this witness recomputes
    // the r17 shape (independent qualityScores / repetitionStats /
    // contaminationFlags over the deduped corpus) and asserts the
    // full pipeline outputs are identical row-for-row.
    val docs = Tables(spark, sfDir).documents
    val plant = docs.select($"doc_id", $"text", $"lang", $"n_chars")
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"),
          $"text", $"lang", $"n_chars"))
    val keepMin = plant
      .groupBy(md5($"text").as("h")).agg(min($"doc_id").as("doc_id"))
    val d1 = plant.withColumn("h", md5($"text"))
      .join(keepMin, Seq("h", "doc_id")).drop("h")
    val q = TextQueries.qualityScores(d1).select($"doc_id", $"quality")
    val rep = repetitionStats(d1).select($"doc_id".as("rdoc"), $"repetitive")
    val cont = contaminationFlags(spark, d1)
      .select($"doc_id".as("cdoc"), $"contaminated")
    val kept = d1.filter($"doc_id" % 97 =!= 0)
      .join(q, "doc_id")
      .join(rep, $"doc_id" === $"rdoc")
      .join(cont, $"doc_id" === $"cdoc", "left")
      .filter($"quality" >= 0.45 && !$"repetitive" &&
        coalesce($"contaminated", lit(false)) === lit(false))
    val balanced = TextQueries.rebalanceKeep(kept)
      .select($"doc_id", $"lang", $"quality",
        md5(concat($"doc_id".cast("string"), lit("|shuffle")))
          .as("shuffle_key"))
    val expected = graft.operators.DistributedRank.rankNtile(
      balanced, groupCols = Seq.empty,
      orderCols = Seq($"shuffle_key", $"doc_id"), ntiles = 16,
      rankName = "shuffle_pos", ntileName = "shard")
      .select($"doc_id", $"lang", $"quality", $"shuffle_pos", $"shard")
    val actual = CurationQueries.q12kCurationPipeline.fn(spark, sfDir)
    assert(actual.exceptAll(expected).count() == 0 &&
      expected.exceptAll(actual).count() == 0,
      "fused q12k diverged from the unfused stage composition")
  }

  test("q12k is cache-neutral: repeated calls pin no CacheManager entries") {
    // the fan-out boundary inside q12k materializes via an eager
    // localCheckpoint, NOT cache() — a library call must not leave
    // session-lifetime state behind (r6 verdict item 2 / ADVICE 3)
    spark.catalog.clearCache()
    CurationQueries.q12kCurationPipeline.fn(spark, sfDir).collect()
    CurationQueries.q12kCurationPipeline.fn(spark, sfDir).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "q12k registered entries in the session CacheManager")
  }

  test("q13g holdout docs are excluded and fractions bounded") {
    import spark.implicits._
    val out = CurationQueries.q13gContamination.fn(spark, sfDir).cache()
    try {
      assert(out.filter($"doc_id" % 97 === 0).count() == 0)
      assert(out.filter($"n_overlap" > $"n_shingles" ||
        $"overlap_frac" < 0 || $"overlap_frac" > 1).count() == 0)
      // flag agrees with the fraction it is defined over
      assert(out.filter($"contaminated" =!=
        ($"overlap_frac" >= 0.3)).count() == 0)
    } finally out.unpersist()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

class SourcesSpec extends SparkTestBase {

  test("csv source: declared schema, quoted fields, corrupt-row capture") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csvspec").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      """id,name,amount
        |1,"alpha, quoted",10.5
        |2,beta,20.0
        |oops,not_a_number,xyz
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("amount", DoubleType)))
    val df = Sources.csv(spark, dir, schema).cache()
    assert(df.count() == 3)
    // quoted comma survives enclosure handling
    assert(df.filter($"name" === "alpha, quoted").count() == 1)
    // malformed row lands in _corrupt_record, not an exception
    val corrupt = df.filter($"_corrupt_record".isNotNull)
    assert(corrupt.count() == 1)
    assert(corrupt.select($"id").head.isNullAt(0))
    df.unpersist()
  }

  test("partitioned write prunes partitions at read time") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    val orders = Tables(spark, sfDir).orders
      .withColumn("o_year", year($"o_orderdate"))
    Sources.writePartitioned(orders, dir, Seq("o_year"))
    val read = spark.read.parquet(dir).filter($"o_year" === 1995)
    assert(read.count() ==
      orders.filter($"o_year" === 1995).count())
    // pruning visible in the executed scan: the partition filter is
    // applied at the source, not as a post-scan Filter
    val scan = read.queryExecution.executedPlan.collectLeaves().head
    val scanStr = scan.toString
    assert(scanStr.contains("PartitionFilters") &&
      scanStr.contains("o_year"),
      s"no partition filter in scan:\n$scanStr")
  }

  test("compacted write bounds files and rows per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    val li = Tables(spark, sfDir).lineitem
    val n = li.count()
    Sources.writeCompacted(li, dir, targetFileRows = 2000, approxRows = n,
      layoutKey = $"l_orderkey")
    val read = spark.read.parquet(dir)
    assert(read.count() == n)
    val files = read.inputFiles.length
    val expected = math.max(1, (n.toDouble / 2000).ceil.toInt)
    assert(files >= expected && files <= expected + 2,
      s"$files files for $n rows (expected ~$expected)")
  }

  test("bucketed join plans without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a previously aborted run can leave the managed location behind
    Seq("li_b", "ord_b").foreach { t =>
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists)
      }
    }
    Sources.writeBucketed(
      Tables(spark, sfDir).lineitem.select($"l_orderkey", $"l_extendedprice"),
      "li_b", "l_orderkey", 8)
    Sources.writeBucketed(
      Tables(spark, sfDir).orders.select($"o_orderkey", $"o_orderstatus"),
      "ord_b", "o_orderkey", 8)
    // disable broadcast so the join must pick SMJ — the point is that
    // bucketing removes the Exchange, not that the tables are small
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables(spark, sfDir).lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-ordered write narrows per-file ranges on BOTH columns") {
    import spark.implicits._
    val df = Tables(spark, sfDir).lineitem
      .select($"l_partkey", $"l_suppkey")
    val Array(minP, maxP, minS, maxS) = df
      .agg(min($"l_partkey").cast("double"), max($"l_partkey").cast("double"),
        min($"l_suppkey").cast("double"), max($"l_suppkey").cast("double"))
      .first().toSeq.map(_.asInstanceOf[Double]).toArray
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val aDir = java.nio.file.Files.createTempDirectory("graft-a").toString
    graft.sources.Sources.writeZOrdered(df, zDir,
      "l_partkey", (minP, maxP), "l_suppkey", (minS, maxS), files = 8)
    // baseline: single-column sort layout
    df.repartitionByRange(8, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(aDir)

    def avgFileRange(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length > 1, s"expected multiple files in $dir")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
          .first()
        r.getDouble(1) - r.getDouble(0)
      }.sum / files.length
    }
    // z-order: files cover rectangles -> the SECOND column's per-file
    // range shrinks well below the sort-by-A layout, where every file
    // spans (nearly) the full suppkey range
    val zB = avgFileRange(zDir, "l_suppkey")
    val aB = avgFileRange(aDir, "l_suppkey")
    assert(zB < 0.8 * aB,
      s"z-order suppkey avg range $zB not below sort layout's $aB")
    // and the FIRST column still prunes under z-order
    val zA = avgFileRange(zDir, "l_partkey")
    assert(zA < 0.6 * (maxP - minP),
      s"z-order partkey avg range $zA vs global ${maxP - minP}")
  }

  test("q17e audit: z-order prunes both dimensions, date-sort only one") {
    import spark.implicits._
    val out = Sources.q17eSkippingAudit.fn(spark, sfDir).cache()
    try {
      def skipped(layout: String, dim: String): Long = out
        .filter($"layout" === layout && $"dim" === dim)
        .agg(sum($"n_skipped")).head.getLong(0)
      // date-sorted layout prunes date bands…
      assert(skipped("sorted_day", "day") > 0,
        "date-sorted layout skipped no files on date bands")
      // …but leaves qty full-range in every file
      assert(skipped("sorted_day", "qty") == 0,
        "date-sorted layout unexpectedly pruned qty bands")
      // z-order prunes BOTH dimensions
      assert(skipped("zorder", "day") > 0 && skipped("zorder", "qty") > 0,
        "z-ordered layout failed to prune both dimensions")
      // conservation: per (layout, dim, band), scanned rows + skipped
      // files' rows account for every slice row — no band loses data
      val sliceRows = Tables(spark, sfDir).lineitem
        .filter($"l_orderkey" % 10 === 0).count()
      val bad = out.filter($"n_rows_scanned" > sliceRows).count()
      assert(bad == 0, "a band claims to scan more rows than exist")
    } finally out.unpersist()
  }

  test("q17f audit: compaction collapses the small-file count to zero") {
    import spark.implicits._
    val out = Sources.q17fCompactionAudit.fn(spark, sfDir).cache()
    try {
      val frag = out.filter($"layout" === "fragmented").head
      val comp = out.filter($"layout" === "compacted").head
      def f(r: org.apache.spark.sql.Row, c: String): Long =
        r.getLong(r.fieldIndex(c))
      // both layouts hold the identical row multiset
      assert(f(frag, "total_rows") == f(comp, "total_rows"))
      // fragmentation: 64 task files, all under the threshold at test sf
      assert(f(frag, "n_files") > f(comp, "n_files"),
        "fragmented layout should have strictly more files")
      assert(f(frag, "n_small_files") > 0,
        "fragmented layout produced no small files at test scale")
      // the cure: no file under the small-file threshold
      assert(f(comp, "n_small_files") == 0,
        "compacted layout still contains small files")
      // compacted files respect the maxRecordsPerFile bound
      assert(f(comp, "max_file_rows") <= 2048L)
    } finally out.unpersist()
  }

  test("q17g audit: year partitioning prunes; scan engages PartitionFilters") {
    import spark.implicits._
    val out = Sources.q17gPartitionAudit.fn(spark, sfDir).cache()
    try {
      def row(id: Long) = out.filter($"pred_id" === id).head
      val narrow = row(0) // 1995–1996
      val full = row(3)   // 1995–2001: nothing prunable
      def f(r: org.apache.spark.sql.Row, c: String): Long =
        r.getLong(r.fieldIndex(c))
      assert(f(narrow, "n_parts_pruned") > 0,
        "a 2-year predicate pruned no partitions of the multi-year table")
      assert(f(full, "n_parts_pruned") == 0,
        "the full-range predicate should prune nothing")
      // rows conserve: full-range scan sees the whole slice
      val sliceRows = Tables(spark, sfDir).orders
        .filter($"o_orderkey" % 4 === 0).count()
      assert(f(full, "n_rows_scanned") == sliceRows)
      // and the engine actually prunes: the predicted pruning shows up
      // as PartitionFilters in the executed scan
      val read = spark.read.parquet(
        s"${graft.sources.Sources.RoundtripRoot}/q17g_part")
        .filter($"o_year" === 1992)
      val scanStr =
        read.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scanStr.contains("PartitionFilters") &&
        scanStr.contains("o_year"),
        s"no partition filter in scan:\n$scanStr")
    } finally out.unpersist()
  }

  test("q17h audit: buckets partition the key space and stay usable") {
    import spark.implicits._
    val out = Sources.q17hBucketAudit.fn(spark, sfDir).cache()
    try {
      val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
      assert(rows.map(_._1).toSet == (0L until 8L).toSet,
        s"expected bucket ids 0..7, got ${rows.map(_._1).sorted.toSeq}")
      // every key lives in exactly ONE bucket — the co-located-join
      // property: per-bucket distincts sum to the global distinct
      val slice = Tables(spark, sfDir).orders
        .filter($"o_orderkey" % 8 === 0)
      val globalKeys = slice.select($"o_custkey").distinct().count()
      assert(rows.map(_._4).sum == globalKeys,
        "a key appears in more than one bucket (or was lost)")
      // rows conserve
      assert(rows.map(_._3).sum == slice.count())
      // hash spread usable: no bucket is empty and the heaviest is
      // within 3x of the lightest at this key cardinality
      val masses = rows.map(_._3)
      assert(masses.forall(_ > 0) && masses.max <= 3 * masses.min,
        s"bucket imbalance: ${masses.sorted.toSeq}")
    } finally out.unpersist()
  }

  test("orc roundtrip is lossless and the read side pushes filters") {
    import spark.implicits._
    // running the query performs the write + read-back + equivalence;
    // n_extra/n_missing are the in-plan full-row multiset check
    val out = Sources.q17dOrcRoundtrip.fn(spark, sfDir).cache()
    assert(out.filter($"n_extra" =!= 0 || $"n_missing" =!= 0).count() == 0)
    assert(out.count() > 0)
    out.unpersist()
    // predicate pushdown reaches the ORC scan (the format engages the
    // same scan machinery as parquet — not a post-scan Filter only)
    val read = spark.read.orc(
      s"${graft.sources.Sources.RoundtripRoot}/q17d_orc")
      .filter($"l_orderkey" === 100L)
    val scanStr =
      read.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanStr.contains("PushedFilters") &&
      scanStr.contains("l_orderkey"),
      s"no pushed filter in ORC scan:\n$scanStr")
  }

  test("jsonl roundtrip preserves values; corrupt lines are captured") {
    import spark.implicits._
    // value-level parity through the write→read cycle
    val back = graft.sources.Sources.q17cJsonlRoundtrip.fn(spark, sfDir)
    val orig = Tables(spark, sfDir).documents
      .filter($"doc_id" % 10 === 0)
      .select($"doc_id", $"text", $"lang", $"n_chars")
    assert(back.exceptAll(orig).count() == 0 &&
      orig.exceptAll(back).count() == 0,
      "jsonl roundtrip changed document values")
    // a COLUMN-PRUNED consumer must work too: count() once pushed a
    // scan referencing only _corrupt_record, which Spark rejects
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN — caught by the full-registry
    // bench); both roundtrips now stage eagerly to decouple consumers
    assert(graft.sources.Sources.q17cJsonlRoundtrip.fn(spark, sfDir)
      .count() > 0)
    assert(graft.sources.Sources.q17bCsvRoundtrip.fn(spark, sfDir)
      .count() > 0)
    // corrupt-line capture: a malformed line lands in _corrupt_record
    // with the data columns null, and valid lines still parse
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n"
        .getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    try {
      assert(parsed.filter($"_corrupt_record".isNotNull).count() == 1)
      assert(parsed.filter($"doc_id" === 1 && $"text" === "ok").count() == 1)
    } finally parsed.unpersist()
  }

  test("q17i upsert: touched partitions rewrite, others survive, merge exact") {
    val rows = graft.sources.Sources.q17iUpsertAudit.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // exactly the two update years rewrote; every other year's files
    // survived the dynamic overwrite untouched
    assert(rows.collect { case (y, (_, _, false)) => y }.toSet ==
      Set(1996L, 1997L), s"wrong write scope: $rows")
    // driver recount of one touched and one untouched year's merge
    import spark.implicits._
    val base = Tables(spark, sfDir).orders
      .select($"o_orderkey",
        floor($"o_totalprice" * 100 + 0.5).cast("long").as("cents"),
        year($"o_orderdate").as("y"))
      .as[(Long, Long, Int)].collect()
    def expect(y: Int): (Long, Long) = {
      val in = base.filter(_._3 == y)
      val kept = in.filterNot(r => r._1 % 13 == 0 && (y == 1996 || y == 1997))
      val upd = in.filter(r => r._1 % 13 == 0 && (y == 1996 || y == 1997))
        .map(r => (r._1, r._2 + 1000L))
      val ins =
        if (y == 1997) in.filter(_._1 % 17 == 0)
        else Array.empty[(Long, Long, Int)]
      val all = kept.map(_._2).toSeq ++ upd.map(_._2).toSeq ++
        ins.map(_._2).toSeq
      (all.size.toLong, all.sum)
    }
    for (y <- Seq(1996, 1998)) {
      val (n, s) = expect(y)
      assert(rows(y.toLong)._1 == n && rows(y.toLong)._2 == s,
        s"year $y merge content drifted: ${rows(y.toLong)} vs ($n,$s)")
    }
  }

  test("q17k: copy-on-write shares untouched files across snapshots") {
    import spark.implicits._
    // run the audit, then inspect the stored manifests directly
    val out = graft.sources.Sources.q17kTimeTravel.fn(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val ttRoot = s"${graft.sources.Sources.RoundtripRoot}/q17k_tt"
    def manifest(k: Int): Set[String] =
      scala.io.Source.fromFile(s"$ttRoot/manifests/$k.txt").getLines()
        .filter(_.nonEmpty).toSet
    val (m1, m2) = (manifest(1), manifest(2))
    // every untouched year's file is SHARED verbatim; touched years'
    // snapshot-2 files are new; nothing from snapshot 1 was deleted
    val untouched1 = m1.filterNot(f =>
      f.contains("/y1996/") || f.contains("/y1997/"))
    assert(untouched1.subsetOf(m2), "untouched files not shared")
    assert((m2 -- m1).forall(_.contains("/snap2/")), "unexpected new files")
    m1.foreach(f => assert(new java.io.File(new java.net.URI(f).getPath)
      .exists() || new java.io.File(f.stripPrefix("file:")).exists(),
      s"snapshot-1 file deleted by the merge: $f"))
    // the time-travel guarantee: pre-merge content readable after the
    // merge — snapshot 1's touched years differ from snapshot 2's
    for (y <- Seq(1996L, 1997L)) {
      assert(out((1, y)) != out((2, y)),
        s"year $y identical across snapshots — merge not visible")
    }
    // untouched years identical across snapshots
    val allYears = out.keys.map(_._2).toSet
    (allYears -- Set(1996L, 1997L)).foreach { y =>
      assert(out((1, y)) == out((2, y)), s"untouched year $y drifted")
    }
  }

  test("q17j: optimize scope exact; the fragmentation debt is real") {
    import spark.implicits._
    val rows = graft.sources.Sources.q17jOptimizeAudit.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    rows.foreach { case (y, (n, files)) =>
      val want = if (y == 1996L || y == 1997L) (n + 999) / 1000 else 1L
      assert(files == want, s"year $y: $files files, want $want")
    }
    // the 16-task merge write really fragments a partition — the debt
    // the in-query optimize then pays down to the target count
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-frag-demo").toString
    Tables(spark, sfDir).orders
      .select($"o_orderkey", year($"o_orderdate").as("o_year"))
      .filter($"o_year" === 1996)
      .repartition(16)
      .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
    val nFrag = spark.read.parquet(tmp)
      .select(input_file_name().as("f")).distinct().count()
    assert(nFrag > rows(1996L)._2,
      s"fragmented write produced $nFrag files, not more than the " +
        s"compacted ${rows(1996L)._2}")
  }

  /** r17 pin for the run-unique roundtrip root (the judge's 164/7
    * concurrent-clobber incident): the root must embed THIS JVM's
    * pid — two processes can then never share a q17 file — and every
    * registered oracle SQL that references a roundtrip path must
    * interpolate exactly that root, so the SQL the Verify dump hands
    * DuckDB reads the files this same JVM wrote. A hand-built path
    * (the r16 fixed-root pattern) in any future q17 twin fails here.
    */
  test("roundtrip root is run-unique and every oracle path agrees") {
    val root = Sources.RoundtripRoot
    val pid = ProcessHandle.current().pid()
    assert(root.endsWith(s"graft_roundtrip_$pid"),
      s"root '$root' does not embed this JVM's pid $pid")
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql)
          if sql.contains("graft_roundtrip") && !sql.contains(root) =>
        name
    }
    assert(offenders.isEmpty,
      s"oracle SQL with a roundtrip path outside the run-unique " +
        s"root: ${offenders.toSeq.sorted.mkString(", ")}")
  }
}

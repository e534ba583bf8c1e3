package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.Tables
import graft.queries.GraftQuery

/** SCD maintenance — the reference's Kettle `DimensionLookup` (SCD2,
  * `ETL for seller with scd2.ktr:763-838`: close current row, insert
  * new version, version+1, open row ends 2099-12-31) and
  * `InsertUpdate` (SCD1, `etl for geolocation with scd1.ktr:906-985`)
  * re-expressed as deterministic window rebuilds over plain parquet.
  *
  * Why window-rebuild, not per-row upsert: Kettle streams each row to
  * the DB and mutates in place; on Spark the idiomatic equivalent of a
  * batch of upserts is a set-based recompute — one shuffle per natural
  * key, no driver loop, scales linearly. (Where a transactional table
  * format is available, the same semantics are a two-action MERGE; the
  * rebuild below is the format-independent core.)
  */
object Scd {

  val OpenEnd = "2099-12-31"

  /** Rebuild SCD2 validity from a pile of timestamped snapshots:
    * per natural key, keep rows whose tracked attributes differ from
    * the previous snapshot (null-safe), then recompute
    * effective_from / effective_to / version with lead + row_number.
    * Exactly one open row (effective_to = 2099-12-31) per key.
    */
  def scd2Rebuild(snapshots: DataFrame, naturalKey: Seq[String],
                  tracked: Seq[String], snapCol: String): DataFrame = {
    // reserved temp/output names (see applyCdc): fail fast on collision
    for (c <- Seq("__keep", "version", "effective_from", "effective_to"))
      require(!snapshots.columns.contains(c),
        s"scd2Rebuild: snapshots must not contain reserved column '$c'")
    val keyCols = naturalKey.map(col)
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col(snapCol))
    val changed: Column = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(wOrd)))
      .reduce(_ || _)
    val isFirst = lag(col(snapCol), 1).over(wOrd).isNull
    snapshots
      .withColumn("__keep", isFirst || changed)
      .filter(col("__keep"))
      .withColumn("version", row_number().over(wOrd).cast("int"))
      .withColumn("effective_from", col(snapCol))
      .withColumn("effective_to",
        coalesce(lead(col(snapCol), 1).over(wOrd), lit(OpenEnd)))
      .drop("__keep", snapCol)
  }

  /** SCD1 latest-wins upsert: incoming overrides current on the key,
    * unmatched incoming rows insert. Set-based (union + row_number),
    * no per-row round trips.
    */
  def scd1Upsert(current: DataFrame, incoming: DataFrame,
                 naturalKey: Seq[String]): DataFrame = {
    val cols = current.columns
    // reserved temp/output names (see applyCdc): fail fast on collision
    for (c <- Seq("__prio", "__rn", "was_updated"))
      require(!cols.contains(c),
        s"scd1Upsert: input must not contain reserved column '$c'")
    val tagged = current.select(cols.map(col): _*).withColumn("__prio", lit(1))
      .unionByName(incoming.select(cols.map(col): _*).withColumn("__prio", lit(2)))
    val w = Window.partitionBy(naturalKey.map(col): _*)
      .orderBy(col("__prio").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("was_updated", col("__prio") === 2)
      .drop("__prio", "__rn")
  }

  /** MERGE-semantics CDC apply: an ordered op log (op/seq + key +
    * payload) collapses to its LATEST op per key, which then merges
    * with the base snapshot — D removes the row, U/I carry the op's
    * payload, keys without ops carry the base payload forward. This
    * is what Delta/Iceberg `MERGE INTO` executes under a CDC feed
    * (their jars are absent in this environment — SURVEY ledger),
    * expressed format-independently: ONE keyed window over the op log
    * (ops shuffle on the key; the log is change-sized, not
    * table-sized) + ONE full-outer key join against the base. A
    * resurrection (U after D) works because only the latest op
    * matters — standard CDC-compaction semantics.
    *
    * `ops` must carry `base`'s key + payload columns plus `opCol`
    * ('I'/'U'/'D'; payload ignored for D) and `seqCol` (total order
    * per key). Output: key + payload + `last_op` ('B' = untouched
    * base row).
    */
  def applyCdc(base: DataFrame, ops: DataFrame, naturalKey: Seq[String],
               opCol: String, seqCol: String): DataFrame = {
    val payload = base.columns.filterNot(naturalKey.contains)
    // same reserved-name discipline as PrefixSum/writeZOrdered: a base
    // table already carrying a temp/output name would silently yield
    // duplicate or mislabeled columns instead of failing here
    val reserved = Seq("__rn", "__op", "last_op") ++ payload.map("__op_" + _)
    for (c <- reserved) {
      require(!base.columns.contains(c),
        s"applyCdc: base must not contain reserved column '$c'")
      require(!ops.columns.contains(c),
        s"applyCdc: ops must not contain reserved column '$c'")
    }
    val w = Window.partitionBy(naturalKey.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = ops
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(naturalKey.map(col) ++
        payload.map(c => col(c).as(s"__op_$c")) :+ col(opCol).as("__op") : _*)
    base.join(latest, naturalKey, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(naturalKey.map(col) ++
        payload.map(c =>
          when(col("__op").isNull, col(c))
            .otherwise(col(s"__op_$c")).as(c)) :+
        coalesce(col("__op"), lit("B")).as("last_op") : _*)
  }

  /** CDC EXTRACTION — the inverse of [[applyCdc]]: diff two snapshots
    * of a table into the minimal I/U/D op log that transforms `old`
    * into `next` — `applyCdc(old, extractCdc(old, next), key, "op",
    * "op_seq") ≡ next`, property-tested, and the emitted constant
    * `op_seq` makes that composition work directly (a snapshot diff
    * has at most one op per key, so the sequence is trivially total).
    * One full-outer key join, change detection is null-safe per
    * payload column; unchanged rows emit NO op, so the log is
    * change-sized — what a snapshot-based ingest publishes downstream
    * instead of shipping the whole table.
    */
  def extractCdc(old: DataFrame, next: DataFrame,
                 naturalKey: Seq[String]): DataFrame = {
    val payload = old.columns.filterNot(naturalKey.contains)
    // reserved temp/output names (see applyCdc): fail fast on collision
    val reserved = Seq("__in_o", "__in_n", "op", "op_seq") ++
      payload.flatMap(c => Seq(s"__o_$c", s"__n_$c"))
    for (c <- reserved; df <- Seq(old -> "old", next -> "next"))
      require(!df._1.columns.contains(c),
        s"extractCdc: ${df._2} must not contain reserved column '$c'")
    val o = old.select(naturalKey.map(col) ++
      payload.map(c => col(c).as(s"__o_$c")) :+ lit(true).as("__in_o") : _*)
    val n = next.select(naturalKey.map(col) ++
      payload.map(c => col(c).as(s"__n_$c")) :+ lit(true).as("__in_n") : _*)
    val changed = payload
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, naturalKey, "full_outer")
      .withColumn("op",
        when(col("__in_o").isNull, "I")
          .when(col("__in_n").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(naturalKey.map(col) ++
        payload.map(c =>
          when(col("op") === "D", col(s"__o_$c"))
            .otherwise(col(s"__n_$c")).as(c)) :+
        col("op") :+ lit(1).as("op_seq") : _*)
  }

  // ---- oracle-checked queries over synthetic customer snapshots ----

  /** Deterministic three-snapshot history over `customer`:
    * s1 baseline, s2 bumps custkey%3=0, s3 bumps custkey%2=0 again.
    */
  private val snapshotSql =
    """SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
      |       '2020-01-01' AS snap FROM customer
      |UNION ALL
      |SELECT c_custkey,
      |       CAST(CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
      |                 ELSE c_acctbal END AS DOUBLE) AS bal,
      |       '2020-06-01' AS snap FROM customer
      |UNION ALL
      |SELECT c_custkey,
      |       CAST(CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 200.0
      |            WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
      |            ELSE c_acctbal END AS DOUBLE) AS bal,
      |       '2021-01-01' AS snap FROM customer""".stripMargin

  private def snapshots(t: Tables): DataFrame = {
    val c = t.customer
    import c.sparkSession.implicits._
    val s1 = c.select($"c_custkey", $"c_acctbal".cast("double").as("bal"),
      lit("2020-01-01").as("snap"))
    val s2 = c.select($"c_custkey",
      when($"c_custkey" % 3 === 0, $"c_acctbal" + 100.0)
        .otherwise($"c_acctbal").cast("double").as("bal"),
      lit("2020-06-01").as("snap"))
    val s3 = c.select($"c_custkey",
      when($"c_custkey" % 2 === 0, $"c_acctbal" + 200.0)
        .when($"c_custkey" % 3 === 0, $"c_acctbal" + 100.0)
        .otherwise($"c_acctbal").cast("double").as("bal"),
      lit("2021-01-01").as("snap"))
    s1.unionByName(s2).unionByName(s3)
  }

  val q8aScd2Rebuild: GraftQuery = GraftQuery(
    "q8a_scd2_rebuild",
    s"""WITH snaps AS ($snapshotSql),
       |changes AS (
       |  SELECT c_custkey, bal, snap,
       |         lag(snap) OVER w IS NULL
       |           OR bal IS DISTINCT FROM lag(bal) OVER w AS keep
       |  FROM snaps
       |  WINDOW w AS (PARTITION BY c_custkey ORDER BY snap))
       |SELECT c_custkey, bal,
       |       CAST(row_number() OVER w2 AS INTEGER) AS version,
       |       snap AS effective_from,
       |       coalesce(lead(snap) OVER w2, '${Scd.OpenEnd}') AS effective_to
       |FROM changes WHERE keep
       |WINDOW w2 AS (PARTITION BY c_custkey ORDER BY snap)""".stripMargin) {
    (spark, dir) =>
      scd2Rebuild(snapshots(Tables(spark, dir)),
        naturalKey = Seq("c_custkey"), tracked = Seq("bal"), snapCol = "snap")
  }

  val q8bScd1Upsert: GraftQuery = GraftQuery(
    "q8b_scd1_upsert",
    """WITH cur AS (
      |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal FROM customer),
      |inc AS (
      |  SELECT c_custkey, CAST(c_acctbal + 50.0 AS DOUBLE) AS bal
      |  FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, CAST(1.0 AS DOUBLE)
      |  FROM customer WHERE c_custkey % 1000 = 0)
      |SELECT coalesce(i.c_custkey, c.c_custkey) AS c_custkey,
      |       coalesce(i.bal, c.bal) AS bal,
      |       i.c_custkey IS NOT NULL AS was_updated
      |FROM cur c FULL OUTER JOIN inc i ON c.c_custkey = i.c_custkey""".stripMargin) {
    (spark, dir) =>
      val t = Tables(spark, dir)
      val c = t.customer
      import c.sparkSession.implicits._
      val current = c.select($"c_custkey", $"c_acctbal".cast("double").as("bal"))
      val incoming = c.filter($"c_custkey" % 5 === 0)
        .select($"c_custkey", ($"c_acctbal" + 50.0).cast("double").as("bal"))
        .unionByName(c.filter($"c_custkey" % 1000 === 0)
          .select(($"c_custkey" + 10000000).as("c_custkey"),
            lit(1.0).cast("double").as("bal")))
      scd1Upsert(current, incoming, Seq("c_custkey"))
  }

  /** Point-in-time lookup over an SCD2 dimension: the version valid
    * at `probe` (effective_from ≤ probe < effective_to). With few
    * versions per key this is a key-join + filter — no range join.
    */
  def pointInTime(scd2: DataFrame, probe: org.apache.spark.sql.Column): DataFrame =
    scd2.filter(col("effective_from") <= probe && probe < col("effective_to"))

  private val probeDates = Seq("2020-03-01", "2020-09-01", "2021-06-01")

  val q8cScd2PointInTime: GraftQuery = GraftQuery(
    "q8c_scd2_pointintime",
    s"""WITH snaps AS ($snapshotSql),
       |changes AS (
       |  SELECT c_custkey, bal, snap,
       |         lag(snap) OVER w IS NULL
       |           OR bal IS DISTINCT FROM lag(bal) OVER w AS keep
       |  FROM snaps
       |  WINDOW w AS (PARTITION BY c_custkey ORDER BY snap)),
       |scd AS (
       |  SELECT c_custkey, bal,
       |         CAST(row_number() OVER w2 AS INTEGER) AS version,
       |         snap AS effective_from,
       |         coalesce(lead(snap) OVER w2, '$OpenEnd') AS effective_to
       |  FROM changes WHERE keep
       |  WINDOW w2 AS (PARTITION BY c_custkey ORDER BY snap))
       |SELECT p.probe_date, s.c_custkey, s.bal, s.version
       |FROM scd s
       |CROSS JOIN (VALUES ${probeDates.map("('" + _ + "')").mkString(",")})
       |  p(probe_date)
       |WHERE s.effective_from <= p.probe_date
       |  AND p.probe_date < s.effective_to""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val scd = scd2Rebuild(snapshots(Tables(spark, dir)),
      naturalKey = Seq("c_custkey"), tracked = Seq("bal"), snapCol = "snap")
    val probes = probeDates.toDF("probe_date")
    // ISO strings compare chronologically; each probe selects exactly
    // one version per key
    scd.crossJoin(broadcast(probes))
      .filter($"effective_from" <= $"probe_date" &&
        $"probe_date" < $"effective_to")
      .select($"probe_date", $"c_custkey", $"bal", $"version")
  }

  /** q8d — [[applyCdc]] over a deterministic op log on customer:
    * seq 1 updates %5 keys, seq 2 deletes %7 keys, seq 3 inserts new
    * %11-derived keys, seq 4 updates %10 keys. The overlaps exercise
    * the semantics: %35 keys end deleted (D after U), %70 keys end
    * updated (U after D — resurrection), inserts land beside
    * untouched base rows.
    */
  val q8dCdcApply: GraftQuery = GraftQuery(
    "q8d_cdc_apply",
    """WITH base AS (
      |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal FROM customer),
      |ops AS (
      |  SELECT c_custkey, CAST(c_acctbal + 500.0 AS DOUBLE) AS bal,
      |         'U' AS op, 1 AS op_seq FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, CAST(NULL AS DOUBLE), 'D', 2
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, CAST(c_custkey AS DOUBLE), 'I', 3
      |  FROM customer WHERE c_custkey % 11 = 0
      |  UNION ALL
      |  SELECT c_custkey, CAST(c_acctbal + 1000.0 AS DOUBLE), 'U', 4
      |  FROM customer WHERE c_custkey % 10 = 0),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT c_custkey, bal, op,
      |           row_number() OVER (PARTITION BY c_custkey
      |             ORDER BY op_seq DESC) AS rn
      |    FROM ops) WHERE rn = 1)
      |SELECT coalesce(l.c_custkey, b.c_custkey) AS c_custkey,
      |       CASE WHEN l.op IS NULL THEN b.bal ELSE l.bal END AS bal,
      |       coalesce(l.op, 'B') AS last_op
      |FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
      |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val c = Tables(spark, dir).customer
    val base = c.select($"c_custkey", $"c_acctbal".cast("double").as("bal"))
    val ops = c.filter($"c_custkey" % 5 === 0)
      .select($"c_custkey", ($"c_acctbal" + 500.0).cast("double").as("bal"),
        lit("U").as("op"), lit(1).as("op_seq"))
      .unionByName(c.filter($"c_custkey" % 7 === 0)
        .select($"c_custkey", lit(null).cast("double").as("bal"),
          lit("D").as("op"), lit(2).as("op_seq")))
      .unionByName(c.filter($"c_custkey" % 11 === 0)
        .select(($"c_custkey" + 1000000).as("c_custkey"),
          $"c_custkey".cast("double").as("bal"),
          lit("I").as("op"), lit(3).as("op_seq")))
      .unionByName(c.filter($"c_custkey" % 10 === 0)
        .select($"c_custkey", ($"c_acctbal" + 1000.0).cast("double").as("bal"),
          lit("U").as("op"), lit(4).as("op_seq")))
    applyCdc(base, ops, naturalKey = Seq("c_custkey"),
      opCol = "op", seqCol = "op_seq")
  }

  /** q8e — [[extractCdc]] between two deterministic customer
    * snapshots: %4 keys change balance (U), %9 keys disappear (D —
    * and D wins over U for %36 keys, since the row is gone), %13 keys
    * gain a shifted-id twin (I). Everything else emits NO op — the
    * log is change-sized.
    */
  val q8eCdcExtract: GraftQuery = GraftQuery(
    "q8e_cdc_extract",
    """WITH s1 AS (
      |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal FROM customer),
      |s2 AS (
      |  SELECT c_custkey,
      |         CAST(CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 50.0
      |                   ELSE c_acctbal END AS DOUBLE) AS bal
      |  FROM customer WHERE c_custkey % 9 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 2000000, CAST(c_custkey AS DOUBLE)
      |  FROM customer WHERE c_custkey % 13 = 0)
      |SELECT * FROM (
      |  SELECT coalesce(s1.c_custkey, s2.c_custkey) AS c_custkey,
      |         CASE WHEN s2.c_custkey IS NULL THEN s1.bal
      |              ELSE s2.bal END AS bal,
      |         CASE WHEN s1.c_custkey IS NULL THEN 'I'
      |              WHEN s2.c_custkey IS NULL THEN 'D'
      |              WHEN s1.bal IS DISTINCT FROM s2.bal THEN 'U' END AS op,
      |         CAST(1 AS INTEGER) AS op_seq
      |  FROM s1 FULL JOIN s2 ON s1.c_custkey = s2.c_custkey)
      |WHERE op IS NOT NULL""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val c = Tables(spark, dir).customer
    val s1 = c.select($"c_custkey", $"c_acctbal".cast("double").as("bal"))
    val s2 = c.filter($"c_custkey" % 9 =!= 0)
      .select($"c_custkey",
        when($"c_custkey" % 4 === 0, $"c_acctbal" + 50.0)
          .otherwise($"c_acctbal").cast("double").as("bal"))
      .unionByName(c.filter($"c_custkey" % 13 === 0)
        .select(($"c_custkey" + 2000000).as("c_custkey"),
          $"c_custkey".cast("double").as("bal")))
    extractCdc(s1, s2, naturalKey = Seq("c_custkey"))
  }

  /** q8f — SCD2 conformance audit: the warehouse-hygiene invariants a
    * load gate checks before publishing a dimension, computed AS DATA
    * from the rebuilt dim: per natural key exactly one open-ended
    * version and zero validity-window breaks (every version's
    * effective_to equals the next version's effective_from), rolled up
    * to a one-row ledger. Composes q8a verbatim on both sides (Spark:
    * the rebuild function; oracle: q8a's twin as a CTE), so the hash
    * match proves the two independently-derived dimensions agree at
    * audit grain AND the invariant counters are zero on both. Scale:
    * one key-grain window over the dim (versions per key are bounded)
    * plus a 1-row rollup.
    */
  val q8fScd2Audit: GraftQuery = GraftQuery(
    "q8f_scd2_audit",
    s"""WITH dim AS (${q8aScd2Rebuild.oracle.get}),
       |w AS (
       |  SELECT c_custkey, version, effective_from, effective_to,
       |         lead(effective_from) OVER
       |           (PARTITION BY c_custkey ORDER BY version) AS next_from
       |  FROM dim),
       |per_key AS (
       |  SELECT c_custkey,
       |         COUNT(*) AS n_versions,
       |         CAST(SUM(CASE WHEN effective_to = '$OpenEnd'
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       |         CAST(SUM(CASE WHEN next_from IS NOT NULL
       |                        AND next_from <> effective_to
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
       |  FROM w GROUP BY 1)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       |       CAST(SUM(n_versions) AS BIGINT) AS n_rows,
       |       CAST(SUM(CASE WHEN n_versions > 1 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_multi_version_keys,
       |       CAST(MAX(n_versions) AS BIGINT) AS max_versions,
       |       CAST(SUM(CASE WHEN n_open <> 1 THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_bad_open,
       |       CAST(SUM(n_breaks) AS BIGINT) AS n_contiguity_breaks
       |FROM per_key""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val dim = scd2Rebuild(snapshots(Tables(spark, dir)),
      naturalKey = Seq("c_custkey"), tracked = Seq("bal"), snapCol = "snap")
    val w = Window.partitionBy($"c_custkey").orderBy($"version")
    val perKey = dim
      .withColumn("next_from", lead($"effective_from", 1).over(w))
      .groupBy($"c_custkey")
      .agg(count(lit(1)).as("n_versions"),
        sum(when($"effective_to" === OpenEnd, 1L).otherwise(0L))
          .as("n_open"),
        sum(when($"next_from".isNotNull &&
          $"next_from" =!= $"effective_to", 1L).otherwise(0L))
          .as("n_breaks"))
    perKey.agg(count(lit(1)).as("n_keys"),
      sum($"n_versions").as("n_rows"),
      sum(when($"n_versions" > 1, 1L).otherwise(0L))
        .as("n_multi_version_keys"),
      max($"n_versions").as("max_versions"),
      sum(when($"n_open" =!= 1L, 1L).otherwise(0L)).as("n_bad_open"),
      sum($"n_breaks").as("n_contiguity_breaks"))
  }

  val all: Seq[GraftQuery] =
    Seq(q8aScd2Rebuild, q8bScd1Upsert, q8cScd2PointInTime, q8dCdcApply,
      q8eCdcExtract, q8fScd2Audit)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed EXCLUSIVE prefix sum — the scale path for global
  * running totals (sequence packing, byte offsets, cumulative
  * quotas). The window form `sum(x) OVER (ORDER BY k ROWS UNBOUNDED
  * PRECEDING)` has an EMPTY partition spec: Spark funnels the entire
  * input through ONE task. This operator instead:
  *
  *  1. `repartitionByRange(orderCols)` — global order across
  *     partitions, each task sorts only its slice.
  *  2. Pass 1 (tiny): per-partition sums, collected and turned into
  *     exclusive per-partition offsets on the driver (O(partitions)).
  *  3. Pass 2: running sum within each partition + its offset. The
  *     range shuffle's map output is reused across both passes (same
  *     RDD lineage → skipped stages), so the input shuffles once.
  *
  * Same two-pass skeleton as [[DistributedRank]]; mapPartitions is
  * justified for the same reason — the cross-partition offset handoff
  * is per-partition imperative state no built-in expresses without
  * the single-task global window.
  *
  * `orderCols` must be a total order (tie-broken) for a deterministic
  * result. A NULL `valueCol` contributes 0 to the running sum (the
  * NULL-skipping SQL `SUM` applies to its window form too); unlike
  * SQL, an all-NULL prefix still reads 0, not NULL — the exclusive
  * scan's "first row gets 0" identity, which callers composing an
  * inclusive cum (`out + value`) inherit NULL-propagation from
  * naturally.
  *
  * NULL ordering is normalized to NULLS LAST in both directions
  * ([[DistributedRank.nullsLast]], r16): the internal sort sits
  * behind an RDD boundary the NullOrderCensus cannot see, and under
  * Spark's nulls-FIRST default an undateable/unkeyable row's value
  * would silently enter EVERY row's prefix while the DuckDB twins'
  * nulls-last ordering adds it to none. Current callers order by
  * derived non-null keys; the pin protects the next caller.
  */
object PrefixSum {

  /** Appends `outName` (LONG): sum of `valueCol` over all rows
    * STRICTLY BEFORE this row in `orderCols` order (exclusive —
    * first row gets 0).
    */
  def exclusivePrefixSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outName: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // the temp column is appended and later stripped positionally —
    // a name collision would silently drop/mislabel caller columns
    require(!df.columns.contains("__psum_v"),
      "input must not contain a column named __psum_v")
    require(!df.columns.contains(outName),
      s"input already contains output column '$outName'")
    val withVal = df.withColumn("__psum_v", valueCol.cast(LongType))
    val ord = orderCols.map(DistributedRank.nullsLast)
    val parted = withVal
      .repartitionByRange(parts, ord: _*)
      .sortWithinPartitions(ord: _*)
    val vIdx = parted.schema.fieldIndex("__psum_v")

    // Both passes at the catalyst InternalRow level (r18, the same
    // rewrite as DistributedRank): `.rdd` would deserialize every row
    // per pass (and forfeit the shared shuffle via its separate
    // QueryExecution), `createDataFrame(RDD[Row])` re-serialize the
    // output. The sum pass reads ONE long per InternalRow; the output
    // pass emits a projection wrapper the downstream RDDScanExec
    // unsafe-projects element-wise (no copies held across steps).
    val rdd = parted.queryExecution.toRdd

    val perPartition: Array[(Int, Long)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator.single((pid, s))
      }.collect()

    val offsets: Map[Int, Long] = {
      var acc = 0L
      perPartition.sortBy(_._1).map { case (pid, s) =>
        val e = pid -> acc
        acc += s
        e
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    val inTypes = parted.schema.fields.map(_.dataType)
    val n = inTypes.length
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcOffsets.value(pid)
      it.map { row =>
        // drop __psum_v (last field), append the running prefix
        val vals = new Array[Any](n)
        var i = 0
        while (i < n - 1) { vals(i) = row.get(i, inTypes(i)); i += 1 }
        vals(n - 1) = run
        if (!row.isNullAt(vIdx)) run += row.getLong(vIdx)
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val outSchema = StructType(
      parted.schema.fields.dropRight(1))
      .add(outName, LongType, nullable = false)
    org.apache.spark.sql.GraftColumnBridge.internalCreateDataFrame(
      spark, summed, outSchema)
  }
}

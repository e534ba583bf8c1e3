package graft

import org.apache.spark.sql.DataFrame

/** The ONE seam for intra-query staging (r18, verdict ask): every
  * place the library materializes a multi-consumer intermediate —
  * the q12y tf grain, q24h's purchase-grain band-join counts, q12k's
  * token-array boundary, the ANN cell assignment, PageRank's
  * per-iteration labels, the roundtrip read-backs — routes through
  * [[stage]] so the mechanism is swappable in one line.
  *
  * Current mechanism: EAGER `localCheckpoint`. The contract and its
  * trade, explicitly:
  *
  *  - **Why not cache()**: a library call must not register
  *    session-lifetime state in the CacheManager (r6 ADVICE 3);
  *    localCheckpoint blocks are reclaimed by the ContextCleaner as
  *    soon as the returned plan becomes unreachable, and the
  *    truncated lineage also caps plan size for iterative consumers
  *    (guide §3.3/§5).
  *  - **Why eager**: a lazy checkpoint materializes inside the FIRST
  *    consumer's job, charging one branch for the shared build and
  *    (for AQE) planning downstream stages before the staged
  *    statistics exist.
  *  - **NOT fault-tolerant** (guide §5): lineage is truncated and the
  *    blocks are unreplicated executor-local state — at cluster scale
  *    an executor loss AFTER the checkpoint fails the query instead
  *    of recomputing. Every staged grain in this library is chosen
  *    small relative to its input (distinct-pair tf, purchase-grain
  *    counts, vocabulary grain), so the pinned block-manager
  *    footprint is bounded; the failure-mode trade is accepted for
  *    bounded re-run cost, exactly like a mid-pipeline temp table.
  *  - **Swap points** for deployments that need stronger guarantees,
  *    each a one-line change HERE: `df.checkpoint(eager = true)`
  *    (reliable checkpoint to `spark.sparkContext.setCheckpointDir`
  *    storage — survives executor loss, costs a distributed write),
  *    `df.persist(StorageLevel.MEMORY_AND_DISK_2)` (replicated
  *    blocks — survives single-executor loss, stays recomputable,
  *    but registers in the CacheManager), or an explicit parquet
  *    write + read-back (what a production pipeline does at corpus
  *    scale; Sources.scala's roundtrip operators already measure that
  *    shape).
  */
object Staging {

  /** Materialize `df` now and return a frame whose plan starts at the
    * materialized blocks. See the object doc for the contract.
    */
  def stage(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)

  /** Chained form: `frame.groupBy(...).agg(...).staged`. */
  implicit class Stageable(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = stage(df)
  }
}

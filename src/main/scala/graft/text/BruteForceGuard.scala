package graft.text

/** Fail-fast input bounds for the deliberately brute-force exactness
  * baselines (q13e all-pairs cosine, q14a per-query full-corpus scan).
  * These queries exist as the correctness references the scale paths
  * (q14b LSH buckets, q14c IVF cells, q14e SemDeDup cells) are judged
  * against; above the bounds they would be a cluster-melting mistake,
  * so they refuse to run instead of silently attempting it (r5/r6
  * verdict task: "guard the quadratic baselines").
  */
object BruteForceGuard {

  /** q13e compares all C(N,2) pairs: 100k rows ≈ 5e9 pairs is the
    * most a "check the baseline" run should ever mean.
    */
  val QuadraticMaxRows: Long = 100000L

  /** q14a scans the full corpus per query (constant 10 queries →
    * linear in N, but unbounded corpus scans are still not a scale
    * path).
    */
  val LinearScanMaxRows: Long = 10000000L

  /** Throws IllegalArgumentException when the corpus exceeds the
    * baseline's bound, naming the scale path to use instead.
    */
  def guard(name: String, rows: Long, bound: Long, scalePath: String): Unit =
    require(rows <= bound,
      s"$name is a brute-force exactness baseline, refused at $rows rows " +
        s"(bound $bound); use the scale path instead: $scalePath")
}

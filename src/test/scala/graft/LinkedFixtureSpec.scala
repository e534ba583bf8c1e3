package graft

/** Fixture-LINKEDNESS ratchet (r16 verdict task 2, generalizing the
  * r15 blind-spot discovery): for 13 rounds every dirty shape's FK
  * keys missed their parent keys (limit(3) slices don't intersect),
  * so every join-grain twin replay was VACUOUSLY green — the property
  * whose absence hid q9f/q9o/q21/q26c/q26d (r15) and
  * q25c/q27/q24d/q15d (r16). This spec makes join-resolution coverage
  * a DECLARED, exact-checked property of every committed shape:
  *
  *  1. each shape declares exactly which star FK edges RESOLVE
  *     (non-empty key intersection) — a mismatch in EITHER direction
  *     fails, so a refactor that silently unlinks a linked fixture
  *     (or links a legacy one) is loud;
  *  2. every FK edge of the star must be resolved by at least one
  *     LINKED dirty shape (heavytie / linkedmixed / linkedseq) — the
  *     aggregate property that makes dirty-value join coverage real;
  *  3. a shape missing a declaration fails — a future fixture ships
  *     with its linkedness stated or not at all.
  *
  * The legacy unlinked shapes (tiny/nulls/mixed/outlier/heavy/nan
  * fact grain) keep their residual value — SCAN-grain and
  * single-table-window coverage (q9q's heavy cell needs no join;
  * the empty/tiny crash sweeps need no linkage) — which is why they
  * are declared as-is rather than relinked: relinking would change
  * the hand-derived expectations of five committed specs for zero
  * new coverage now that the linked family exists.
  */
class LinkedFixtureSpec extends SparkTestBase {

  /** The star's FK edges: (label, child table, fk col, parent table,
    * pk col). */
  private val edges: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem>orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem>part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem>supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders>customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer>nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier>nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation>region", "nation", "n_regionkey", "region", "r_regionkey"))

  /** Shape name → builder. Every committed sweep shape must appear
    * here AND in [[declaredResolved]]. */
  private def shapes: Map[String, String] = Map(
    "empty" -> DegenerateData.emptyDir(spark),
    "tiny" -> DegenerateData.tinyDir(spark),
    "const" -> DegenerateData.constDir(spark),
    "flat" -> DegenerateData.flatDir(spark),
    "nulls" -> DegenerateData.nullsDir(spark),
    "mixed" -> DegenerateData.mixedDir(spark),
    "outlier" -> DegenerateData.outlierDir(spark),
    "heavy" -> DegenerateData.heavyDir(spark),
    "heavyprice" -> DegenerateData.heavypriceDir(spark),
    "heavytie" -> DegenerateData.heavytieDir(spark),
    "linkedmixed" -> DegenerateData.linkedmixedDir(spark),
    "linkedseq" -> DegenerateData.linkedseqDir(spark),
    "boundary" -> DegenerateData.boundaryDir(spark),
    "nan" -> DegenerateData.nanLineitemDir(spark))

  /** Filled from the first empirical run (r16), then hand-audited:
    * every line is a CLAIM about what the shape's twin replay can
    * and cannot exercise. The legacy shapes resolve only DIM-grain
    * edges by accident of key ranges (c_nationkey/l_suppkey are
    * small ints that land inside the 3-row dim slices;
    * nation>region always resolves because both slices are 0,1,2) —
    * the FACT edges (lineitem>orders, orders>customer,
    * lineitem>part) resolve NOWHERE outside the linked family plus
    * heavyprice's hand-wired orders>customer, which is exactly the
    * r15 vacuous-join finding, now pinned. */
  private val legacyDims = Set("customer>nation", "lineitem>supplier",
    "nation>region")
  private val declaredResolved: Map[String, Set[String]] = Map(
    "empty" -> Set(),
    "tiny" -> legacyDims,
    "const" -> Set("nation>region"),
    "flat" -> (legacyDims + "supplier>nation"),
    "nulls" -> legacyDims,
    "mixed" -> legacyDims,
    "outlier" -> legacyDims,
    "heavy" -> legacyDims,
    "heavyprice" -> (legacyDims + "orders>customer"),
    "heavytie" -> edges.map(_._1).toSet,
    "linkedmixed" -> edges.map(_._1).toSet,
    "linkedseq" -> edges.map(_._1).toSet,
    // fully linked BY CONSTRUCTION (every crafted key wired): the
    // exact-edge values flow through RESOLVED joins, so the tie/
    // endpoint expectations in BoundarySpec exercise real join grains
    "boundary" -> edges.map(_._1).toSet,
    "nan" -> legacyDims)

  private def keysOf(dir: String, table: String, column: String): Set[String] =
    spark.read.parquet(s"$dir/$table.parquet")
      .select(column).na.drop().distinct()
      .collect().map(_.get(0).toString).toSet

  private def resolvedEdges(dir: String): Set[String] =
    edges.collect {
      case (label, ct, fk, pt, pk)
          if (keysOf(dir, ct, fk) intersect keysOf(dir, pt, pk)).nonEmpty =>
        label
    }.toSet

  test("every shape's FK-edge resolution matches its declaration exactly") {
    val actual = shapes.map { case (name, dir) => name -> resolvedEdges(dir) }
    val undeclared = actual.keySet -- declaredResolved.keySet
    assert(undeclared.isEmpty,
      s"shapes without a linkedness declaration: $undeclared")
    val mismatches = actual.collect {
      case (name, act) if declaredResolved(name) != act =>
        s"  $name: declared=${declaredResolved(name).toSeq.sorted
          .mkString(",")} actual=${act.toSeq.sorted.mkString(",")}"
    }
    assert(mismatches.isEmpty,
      s"fixture linkedness drifted (vacuous-join risk, SURVEY §8.13):\n" +
        mismatches.mkString("\n"))
    val staleDecl = declaredResolved.keySet -- actual.keySet
    assert(staleDecl.isEmpty, s"declared but unbuilt shapes: $staleDecl")
  }

  test("every star FK edge is resolved by at least one linked dirty shape") {
    val linked = Set("heavytie", "linkedmixed", "linkedseq")
    val covered = linked.flatMap(declaredResolved)
    val uncovered = edges.map(_._1).toSet -- covered
    assert(uncovered.isEmpty,
      s"FK edges with NO linked-dirty coverage (a divergence behind " +
        s"such a join is invisible to every twin replay): $uncovered")
  }
}

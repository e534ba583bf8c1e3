package graft

/** Registry bookkeeping: the README's advertised counts must equal the
  * live registry (they drifted twice across rounds when written by
  * hand), every query name must be unique, and every oracle entry must
  * point at a registered query.
  */
class RegistrySpec extends SparkTestBase {

  test("README registry counts match SparkEntry") {
    // explicit UTF-8: the forked JVM's default charset chokes on the
    // README's unicode punctuation
    val readme = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val pat = """(\d+) registered, (\d+)\s+oracle-checked""".r
    val m = pat.findFirstMatchIn(readme)
      .getOrElse(fail("README lost its 'N registered, M oracle-checked' line"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} registered; " +
        s"SparkEntry.queries has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked; " +
        s"SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
  }

  test("query names are unique and every oracle references a query") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.size == names.distinct.size, "duplicate query names")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}

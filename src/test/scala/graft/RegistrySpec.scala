package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants — no Spark session needed. A duplicate query name
  * would silently overwrite its twin in the `queries` Map and the driver
  * would verify one of them twice; fail loudly instead.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique") {
    val names = SparkEntry.allDefs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every oracle entry corresponds to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle SQL only references the driver's tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // crude but effective: every FROM/JOIN target must be a known table,
    // a CTE defined in the same query, or a parenthesized subquery
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*(\\w+)\\s*(?:\\([^)]*\\))?\\s+AS\\s+(?:MATERIALIZED\\s*)?\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      // lookbehind excludes `IS NOT DISTINCT FROM x` (not a table ref)
      val refs = "(?i)(?<!distinct )(?<![a-z0-9_])(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("declared queries and oracles stay in sync with the coverage counts") {
    assert(SparkEntry.queries.size === SparkEntry.allDefs.size)
    info(s"${SparkEntry.queries.size} queries, ${SparkEntry.oracleSql.size} oracle-gated")
  }

  test("CAPABILITIES.md matches the registry (regenerate with runMain graft.Capabilities)") {
    val committed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("CAPABILITIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(committed === Capabilities.render,
      "CAPABILITIES.md is stale — run `sbt \"runMain graft.Capabilities\"` and commit")
  }
}

package graft

/** Generates CAPABILITIES.md — the query → operator family → correctness
  * gate table — straight from the registry, so the doc cannot drift from
  * the code (RegistrySpec fails if the committed file is stale).
  */
object Capabilities {

  def render: String = {
    val rows = SparkEntry.families
      .flatMap { case (fam, defs) =>
        defs.map { q =>
          val gate =
            if (q.oracle.isDefined) "DuckDB oracle (row/schema/hash match)"
            else "rows>0 + ScalaTest spec"
          (q.name, fam, gate)
        }
      }
      .sortBy(_._1)
    val table =
      ("| query | operator family | correctness gate |"
        +: "|---|---|---|"
        +: rows.map { case (n, f, g) => s"| `$n` | $f | $g |" }).mkString("\n")
    // NOTE: the table rows start with '|' — keep them OUT of stripMargin
    s"""# Capabilities
       #
       #Generated from `graft.SparkEntry.queries` by
       #`sbt "runMain graft.Capabilities"` — do not edit by hand
       #(RegistrySpec asserts this file matches the registry).
       #
       #**${SparkEntry.allDefs.size} declared queries, ${SparkEntry.oracleSql.size}
       #oracle-gated** (every query also runs under `graft.Bench`'s timed
       #full-materialization passes). Imperative engine surfaces that are
       #not expressible as standalone queries (KV get/put/compact, catalog
       #CRUD, copy_file_range, streaming pipelines, the persistent IVF
       #index) are spec-gated in `src/test/scala/graft/`.
       #
       #""".stripMargin('#') + table + "\n"
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "CAPABILITIES.md")
    java.nio.file.Files.write(out,
      render.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $out")
  }
}

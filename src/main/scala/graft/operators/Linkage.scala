package graft.operators

import graft.{QueryDef, Tables}
import graft.plans.JaroWinkler.jaroWinkler
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution / record linkage — the blocking + scoring +
  * best-match pipeline (Fellegi & Sunter 1969; Winkler 1990) that links
  * a dirty relation (OCR noise, typos, scraper mangling) back to a
  * master relation. The scoring primitive is the codegen'd
  * [[graft.plans.JaroWinkler]] expression; blocking keeps the candidate
  * join a tiny slice of the full cross product.
  *
  * Scale design (100 TB): NEVER score the cross product. The blocking
  * key (here: string length — swap-typos preserve it) turns all-pairs
  * into an equi-join whose output is Σ_block |dirty_b|·|master_b|; the
  * master side of a linkage join is dimension-sized and broadcasts. The
  * per-record argmax is an aggregate-shaped window partitioned by the
  * dirty key — no global ordering anywhere before the final output sort.
  */
object Linkage {

  /** Deterministic "dirty" variant of `name`: the adjacent-character
    * swap at 1-based position k = key % (len-1) + 1 — the classic typo
    * model, reproducible in both dialects from (key, name) alone. */
  private def swapSql(name: String, key: String): String =
    s"substr($name, 1, ($key % (len($name)-1) + 1) - 1)" +
      s" || substr($name, ($key % (len($name)-1) + 1) + 1, 1)" +
      s" || substr($name, ($key % (len($name)-1) + 1), 1)" +
      s" || substr($name, ($key % (len($name)-1) + 1) + 2)"

  /** Link a deterministically-typo'd copy of `part` back to the distinct
    * master name list: block on length, score candidates with
    * Jaro–Winkler, keep each record's best match (tie-broken on name),
    * and report the score margin over the runner-up — the
    * Fellegi–Sunter-style ambiguity signal a linkage review queue sorts
    * by. `is_exact` audits end-to-end resolution accuracy.
    *
    * Thresholds and ordering use the ROUNDED score so an ulp difference
    * between engines can never flip a row or a rank. */
  val qErFuzzyMatch = QueryDef.sql(
    "q_er_fuzzy_match",
    s"""WITH master AS (SELECT DISTINCT p_name FROM part),
       |dirty AS (
       |  SELECT p_partkey, p_name AS orig,
       |         ${swapSql("p_name", "p_partkey")} AS dirty_name
       |  FROM part),
       |scored AS (
       |  SELECT d.p_partkey, d.orig, d.dirty_name, m.p_name AS match_name,
       |         round(jaro_winkler_similarity(d.dirty_name, m.p_name), 4) AS jw,
       |         row_number() OVER (
       |           PARTITION BY d.p_partkey
       |           ORDER BY round(jaro_winkler_similarity(d.dirty_name, m.p_name), 4) DESC,
       |                    m.p_name) AS rk,
       |         lead(round(jaro_winkler_similarity(d.dirty_name, m.p_name), 4))
       |           OVER (PARTITION BY d.p_partkey
       |                 ORDER BY round(jaro_winkler_similarity(d.dirty_name, m.p_name), 4) DESC,
       |                       m.p_name) AS runner_up
       |  FROM dirty d JOIN master m ON len(d.dirty_name) = len(m.p_name))
       |SELECT p_partkey, dirty_name, match_name, jw,
       |       round(jw - coalesce(runner_up, 0.0), 4) AS margin,
       |       CAST(match_name = orig AS BOOLEAN) AS is_exact
       |FROM scored WHERE rk = 1 AND jw >= 0.84
       |ORDER BY p_partkey""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val part = Tables.part(s, d)
    val master = part.select($"p_name").distinct()
    val dirty = part.select(
      $"p_partkey",
      $"p_name".as("orig"),
      concat(
        expr("substr(p_name, 1, (p_partkey % (length(p_name)-1) + 1) - 1)"),
        expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1) + 1, 1)"),
        expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1), 1)"),
        expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1) + 2)"))
        .as("dirty_name"))
    val w = Window
      .partitionBy($"p_partkey")
      .orderBy($"jw".desc, $"match_name")
    dirty
      .join(
        broadcast(master.select($"p_name".as("match_name"))),
        length($"dirty_name") === length($"match_name"))
      .withColumn("jw", round(jaroWinkler($"dirty_name", $"match_name"), 4))
      .withColumn("rk", row_number().over(w))
      .withColumn("runner_up", lead($"jw", 1).over(w))
      .filter($"rk" === 1 && $"jw" >= 0.84)
      .select(
        $"p_partkey",
        $"dirty_name",
        $"match_name",
        $"jw",
        round($"jw" - coalesce($"runner_up", lit(0.0)), 4).as("margin"),
        ($"match_name" === $"orig").as("is_exact"))
      .orderBy($"p_partkey")
  }

  /** Entity clustering — the other half of record linkage: instead of
    * matching a dirty relation against a master, resolve the UNION of
    * all observed name variants into entities by fuzzy-similarity
    * connected components (pairwise Jaro–Winkler ≥ 0.92 within a length
    * block, then [[Dedup.connectedComponents]]' log-round min-label
    * propagation). Each entity is labeled by its lexicographically
    * smallest member. On the fixture the 568 observed variants resolve
    * to exactly the 64 true part names.
    *
    * Scale: blocking bounds the scored pairs (names are a dimension —
    * the variant UNIVERSE is small even when the corpus is 100 TB, and
    * the distinct-union is one exchange over name strings); CC runs on
    * the edge list, never the corpus. The oracle replays the fixpoint
    * as a recursive transitive closure. */
  val qErEntityClusters = QueryDef.sql(
    "q_er_entity_clusters",
    s"""WITH RECURSIVE dirty AS (
       |  SELECT DISTINCT ${swapSql("p_name", "p_partkey")} AS name
       |  FROM part),
       |names AS (
       |  -- explicit outer DISTINCT: inside WITH RECURSIVE scope DuckDB
       |  -- reads a bare UNION as seed/iteration parts and does not
       |  -- dedup a master name against its own double-letter swap
       |  SELECT DISTINCT name FROM (
       |    SELECT p_name AS name FROM part
       |    UNION ALL SELECT name FROM dirty)),
       |cand AS (
       |  SELECT a.name AS a, b.name AS b
       |  FROM names a JOIN names b
       |    ON a.name < b.name AND len(a.name) = len(b.name)
       |  WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.92),
       |sym AS (SELECT a, b FROM cand UNION SELECT b, a FROM cand),
       |reach(a, b) AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
       |lbl AS (SELECT a AS name, min(b) AS m FROM reach GROUP BY a),
       |grp AS (
       |  SELECT n.name, least(coalesce(l.m, n.name), n.name) AS entity_id
       |  FROM names n LEFT JOIN lbl l ON l.name = n.name)
       |SELECT name, entity_id,
       |       CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
       |         AS entity_size
       |FROM grp ORDER BY name""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val part = Tables.part(s, d)
    val dirty = part
      .select(
        concat(
          expr("substr(p_name, 1, (p_partkey % (length(p_name)-1) + 1) - 1)"),
          expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1) + 1, 1)"),
          expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1), 1)"),
          expr("substr(p_name, (p_partkey % (length(p_name)-1) + 1) + 2)"))
          .as("name"))
    // checkpoint the tiny distinct-variant relation ONCE: it feeds three
    // places (both sides of the candidate join and the final left join),
    // and without the cut each consumer re-runs the part scan + union +
    // distinct as its own job chain — the r10 job census measured 49
    // jobs/run with most OUTSIDE connectedComponents; this single cut is
    // the floor dial (names is a name-universe relation, never corpus-
    // sized, so the checkpoint materializes hundreds of rows)
    import org.apache.spark.sql.graftbridge.DatasetBridge.{
      localCheckpointFreshStats => ckpt}
    val names = ckpt(part.select($"p_name".as("name")).union(dirty).distinct())
    val pairs = names
      .select($"name".as("d1"))
      .join(broadcast(names.select($"name".as("d2"))),
        $"d1" < $"d2" && length($"d1") === length($"d2"))
      .filter(round(jaroWinkler($"d1", $"d2"), 4) >= 0.92)
    val labels = Dedup
      .connectedComponents(pairs)
      .select($"node".as("l_name"), $"label")
    val w = Window.partitionBy($"entity_id")
    names
      .join(broadcast(labels), $"name" === $"l_name", "left")
      .select($"name",
        least(coalesce($"label", $"name"), $"name").as("entity_id"))
      .withColumn("entity_size", count(lit(1)).over(w))
      .orderBy($"name")
  }

  def defs: Seq[QueryDef] = Seq(qErFuzzyMatch, qErEntityClusters)
}

package graft

import graft.operators.{Events, Multimodal, Similarity, SqlPlane}
import org.apache.spark.sql.functions._

/** Round-7 batch-4 operators: perceptual-hash media dedup, SQL-plane
  * linkage, Markov event transitions, embedding drift.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("media phash: identical payloads pair at hamming 0; pairs are canonical") {
    val rows = Multimodal.qMediaPhashNearDup
      .fn(spark, sf)
      .select($"d1", $"d2", $"hamming")
      .as[(Long, Long, Long)]
      .collect()
    assert(rows.forall { case (a, b, h) => a < b && h >= 0 && h <= 10 })
    // any two docs with IDENTICAL text must surface with hamming 0
    val exactDups = Tables
      .documents(spark, sf)
      .groupBy($"text")
      .agg(collect_list($"doc_id").as("ids"), count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .select($"ids")
      .as[Seq[Long]]
      .collect()
    val pairSet = rows.map { case (a, b, h) => (a, b) -> h }.toMap
    exactDups.foreach { ids =>
      val s = ids.sorted
      for (i <- s.indices; j <- i + 1 until s.length) {
        assert(pairSet.get((s(i), s(j))).contains(0L),
          s"exact dup pair (${s(i)}, ${s(j)}) missing or nonzero")
      }
    }
  }

  test("sql-plane linkage groups by name length and bounds similarity counts") {
    val rows = SqlPlane.qSqlLinkage
      .fn(spark, sf)
      .select($"name_len", $"n_pairs", $"n_similar", $"sketch_h8")
      .as[(Int, Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 <= r._2))
    // the sketch probe is one global value, identical on every row
    assert(rows.map(_._4).toSet.size === 1)
    val lens = Tables.part(spark, sf)
      .select(length($"p_name")).distinct().as[Int].collect().toSet
    // a length with a single name has no pairs; every emitted length is real
    assert(rows.map(_._1).toSet.subsetOf(lens))
  }

  test("event transitions are a row-stochastic matrix") {
    val rows = Events.qEventTransitions
      .fn(spark, sf)
      .select($"from_type", $"prob".cast("double"), $"n")
      .as[(String, Double, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      val total = g.map(_._2).sum
      assert(math.abs(total - 1.0) < 0.001,
        s"outgoing probabilities must sum to 1, got $total")
    }
    assert(rows.forall(r => r._2 > 0.0 && r._2 <= 1.0 && r._3 > 0))
  }

  test("embedding drift: one row per label, cosine within [-1, 1]") {
    val rows = Similarity.qEmbedDrift
      .fn(spark, sf)
      .select($"label", $"n_a", $"n_b", $"drift_cos".cast("double"))
      .as[(Int, Long, Long, Double)]
      .collect()
    val labels = Tables.embeddings(spark, sf)
      .select($"label").distinct().count()
    assert(rows.length === labels)
    assert(rows.forall(r => r._4 >= -1.0 && r._4 <= 1.0))
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
    // parity split partitions each label's population
    val perLabel = Tables.embeddings(spark, sf)
      .groupBy($"label").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    rows.foreach { case (l, na, nb, _) =>
      assert(na + nb === perLabel(l))
    }
  }
}

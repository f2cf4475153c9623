package graft

import graft.sources.KvStore
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5) using ScalaCheck generators with
  * a fixed seed (the scalatest-scalacheck bridge isn't on the offline
  * classpath, so cases are sampled explicitly): put∘get identity over
  * arbitrary byte arrays, bucket-placement stability, pagination∘concat =
  * full listing. Spark jobs per case are expensive → few, larger cases.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("hashOf is stable, non-negative, and spreads keys (200 cases)") {
    samples(Gen.alphaNumStr, 200).foreach { s =>
      val h1 = KvStore.hashOf(s)
      assert(h1 === KvStore.hashOf(s))
      assert(h1 >= 0)
    }
    val buckets = (0 until 1000).map(i => math.floorMod(KvStore.hashOf(s"k$i"), 64L))
    assert(buckets.distinct.length > 32, "1000 keys must hit most of 64 buckets")
  }

  test("put then get is identity for arbitrary byte payloads") {
    val store = new KvStore(
      spark, java.nio.file.Files.createTempDirectory("kvprop").toString, 16)
    val payloadGen = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
    val cases = samples(payloadGen, 8).zipWithIndex
    store.put(cases.map { case (p, i) => (s"key$i", p) }.toDF("key", "value"))
    cases.foreach { case (p, i) =>
      assert(store.get(s"key$i").get.toSeq === p.toSeq, s"payload $i mismatch")
    }
  }

  test("source divergence is non-negative and zero for a self-identical corpus") {
    import org.apache.spark.sql.functions._
    // random corpora over random vocabularies: KL(group ‖ corpus) ≥ 0
    // always (Gibbs), and a single-group corpus IS the corpus → KL = 0
    val vocabGen = Gen.listOfN(30, Gen.identifier.suchThat(_.nonEmpty))
    samples(vocabGen, 3).zipWithIndex.foreach { case (vocab, vi) =>
      val words = samples(Gen.oneOf(vocab), 400)
      val docs = words.grouped(20).zipWithIndex.map { case (ws, i) =>
        (i.toLong, s"s${i % 4}", ws.mkString(" "))
      }.toSeq.toDF("doc_id", "source", "text")
      val kl = operators.CorpusOps
        .sourceDivergence(docs, "source", "text")
        .select($"kl_to_corpus").as[Double].collect()
      kl.foreach(v => assert(v >= 0.0, s"vocab $vi: negative KL $v"))
      // one group == the whole corpus: divergence must vanish
      val solo = operators.CorpusOps
        .sourceDivergence(docs.withColumn("source", lit("all")),
          "source", "text")
        .select($"kl_to_corpus").as[Double].head()
      assert(math.abs(solo) < 1e-9, s"vocab $vi: self-KL $solo not 0")
    }
  }

  test("dsir importance weights are invariant to corpus row order") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).limit(200)
    def run(df: org.apache.spark.sql.DataFrame) = operators.CorpusOps
      .dsirWeights(df, "doc_id", "text", isTarget = $"lang" === "en",
        topK = 20)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    val b = run(docs.orderBy(rand(7)))  // adversarial physical order
    assert(a === b, "importance weights must not depend on row order")
  }

  test("readdir pagination concatenates to the full listing for any page size") {
    var cat = graft.meta.InodeCatalog.empty(spark)
    val names = samples(Gen.identifier.suchThat(_.nonEmpty), 12).distinct.take(9)
    names.foreach(n => cat = cat.create(1, n, "file"))
    cat = cat.checkpointed()
    val full = cat.readdir(1).select($"name").as[String].collect().toSeq
    assert(full === names.sorted)
    Seq(1, 2, 4, 7).foreach { pageSize =>
      val paged = (0 until names.length by pageSize).flatMap(off =>
        cat.readdir(1, off, pageSize).select($"name").as[String].collect())
      assert(paged === full, s"pageSize=$pageSize must tile the listing")
    }
  }
  test("prefix-filter lemma: J >= 0.8 pairs always collide inside their prefixes") {
    // pure-set model of q_prefix_filter_join's pruning: random small
    // universes, random sets; order by (df, token); any pair with exact
    // Jaccard >= 0.8 MUST share a token within both prefixes of length
    // prefixLen(|set|) — the no-false-negative guarantee the oracle
    // verifies end-to-end, here exercised over thousands of adversarial
    // shapes the fixture can't contain
    val rnd = new scala.util.Random(42)
    var pairsChecked = 0
    for (_ <- 0 until 400) {
      val universe = 4 + rnd.nextInt(30)
      val sets = (0 until 6).map { _ =>
        val size = 1 + rnd.nextInt(universe)
        rnd.shuffle((0 until universe).toList).take(size).toSet
      }
      val df = (0 until universe).map(t => t -> sets.count(_.contains(t))).toMap
      def prefix(s0: Set[Int]): Set[Int] = {
        val ordered = s0.toSeq.sortBy(t => (df(t), t))
        ordered.take(operators.Dedup.prefixLen(s0.size.toLong).toInt).toSet
      }
      for (i <- sets.indices; j <- i + 1 until sets.length) {
        val (a, b) = (sets(i), sets(j))
        val jac = (a & b).size.toDouble / (a | b).size
        if (jac >= 0.8) {
          pairsChecked += 1
          assert((prefix(a) & prefix(b)).nonEmpty,
            s"lemma violated: a=$a b=$b jac=$jac")
        }
      }
    }
    assert(pairsChecked > 100, s"generator must produce real near-dup pairs ($pairsChecked)")
  }
}

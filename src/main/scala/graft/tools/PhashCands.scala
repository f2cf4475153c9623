package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main for SCALE.md's pHash code-length analysis: prints the
  * banded CANDIDATE COUNT at the 64-bit (4×16) and 256-bit (4×64) dials
  * for each data dir given — the quantity the analysis predicts
  * (spurious collisions ~n²/2^bandBits plus the corpus's true near-dup
  * structure). Usage:
  *   sbt "runMain graft.tools.PhashCands <dir1> [<dir2> ...]"
  */
object PhashCands {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared graft config set (this builder had been skipped when the
    // fallback threshold was raised — r11 ADVICE) — see
    // GraftSession.tunedBuilder
    val spark = graft.GraftSession.tunedBuilder(cpus.toInt, "graft-phashcands")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val withTruth = sys.env.get("PHASH_CANDS_TRUTH").contains("1")
    args.foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
      Seq(64, 256).foreach { segs =>
        val row = graft.operators.Multimodal
          .phashCandidateCount(docs, segs, 4).head
        val truth =
          if (!withTruth) ""
          else {
            // verified pairs at the dial's own radius (10/64 proportion):
            // candidates − truth = spurious band collisions the verify
            // pays for and discards
            val q = if (segs == 64) "q_media_phash_neardup"
                    else "q_media_phash_neardup_256"
            val n = graft.SparkEntry.queries(q)(spark, dir).count()
            s" n_verified=$n"
          }
        println(s"[cands] $dir dial=${row.getString(0)} " +
          s"n_docs=${row.getLong(1)} n_candidates=${row.getLong(2)}$truth")
      }
    }
    spark.stop()
  }
}

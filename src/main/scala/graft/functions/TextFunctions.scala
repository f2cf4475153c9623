package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the LLM-pipeline operators (SURVEY §2.10 /
  * north-star). Everything here is built from codegen'd Spark built-ins —
  * no UDFs — so whole-stage codegen stays intact and the same semantics
  * are expressible in the DuckDB oracle dialect.
  */
object TextFunctions {

  /** Mersenne-ish prime modulus for MinHash permutations (fits products of
    * (p-1) * maxA well inside a signed 64-bit long). */
  val MinhashP: Long = 2147483647L

  /** 16 fixed (a, b) permutation constants — small odd multipliers so
    * a*h + b never overflows: h < 2^31, a <= 1021 → a*h < 2^41. */
  val MinhashPerms: Seq[(Long, Long)] = Seq(
    (7L, 3L), (11L, 5L), (13L, 17L), (31L, 29L), (37L, 41L), (61L, 59L),
    (127L, 83L), (131L, 97L), (251L, 101L), (257L, 149L), (509L, 163L),
    (521L, 197L), (769L, 223L), (787L, 251L), (1013L, 281L), (1021L, 331L))

  /** Whitespace word tokenization. */
  def words(text: Column): Column = split(trim(text), " +")

  /** Lowercase + whitespace-collapse normalization (document
    * canonicalization before fingerprinting/dedup). */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Word n-gram shingles as an array (empty when fewer than n words). */
  def shingles(w: Column, n: Int): Column = {
    when(
      size(w) >= n,
      transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + lit(k))): _*))
    ).otherwise(array())
  }

  /** Stable 60-bit hash of a string via md5 — identical in Spark
    * (`conv(substr(md5(s),1,15),16,10)`) and DuckDB
    * (`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`). Backed by the
    * native [[graft.plans.StableHash60]] expression (bytes→long, no
    * hex-string roundtrip; codegen'd).
    *
    * Replaces the reference's `DefaultHasher` short_hash
    * (/root/reference/common/src/kv_store/mod.rs:26-30), which is
    * explicitly unstable across Rust releases — documented divergence
    * per SURVEY §2.8 F1.
    */
  def stableHash60(c: Column): Column =
    graft.plans.StableHash60.stableHash60(c)

  /** stableHash60 reduced into the MinHash field. */
  def minhashBase(c: Column): Column = stableHash60(c) % MinhashP

  /** The i-th MinHash permutation of a base-hash column. */
  def minhashPerm(base: Column, i: Int): Column = {
    val (a, b) = MinhashPerms(i)
    (base * lit(a) + lit(b)) % MinhashP
  }
}

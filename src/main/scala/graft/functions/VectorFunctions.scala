package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns, backed by the native
  * codegen'd [[graft.plans.FloatVectorDot]] expression (the higher-order
  * `zip_with`/`aggregate` formulation evaluates interpreted and allocates
  * an intermediate array per row — 10x+ slower in all-pairs joins).
  */
object VectorFunctions {

  /** Dot product in double precision, index order (matches the oracle's
    * sequential accumulation). */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns, built from Spark's
  * higher-order functions (`zip_with`/`aggregate`/`transform`) — codegen'd,
  * no UDFs, executes inside the scan stage.
  */
object VectorFunctions {

  /** Dot product in double precision, index order (matches the oracle's
    * sequential accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, v) => acc + v))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns as stock higher-order-function
  * expressions — no UDFs, so everything stays codegen-friendly and is
  * bit-for-bit reproducible in the DuckDB oracle (both engines evaluate
  * the same left-to-right IEEE fold).
  *
  * Inputs should be cast once via [[asDouble]]: the testdata embeddings
  * are `array<float>`, and doing the arithmetic in float would neither
  * match the oracle nor be wise at accumulation length 64+.
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** left-fold dot product: ((0 + a1*b1) + a2*b2) + ... */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** cosine via precomputed norms (callers precompute per-row norms once
    * rather than re-deriving them per pair) */
  def cosineFromParts(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** sign-bit bucket over the first `planes` dimensions: bit j set iff
    * v[j+1] > 0 — random-hyperplane LSH with axis-aligned planes. Few
    * planes = high recall / big buckets; more planes shrink buckets
    * exponentially (the scale knob). */
  def signBucket(v: Column, planes: Int): Column =
    (0 until planes).map { j =>
      when(element_at(v, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}

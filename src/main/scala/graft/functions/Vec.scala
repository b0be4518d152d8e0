package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math for `ArrayType(FloatType)` embedding columns.
  *
  * Mirrors the reference's three distance operators (`<->` L2, `<=>` cosine,
  * `<#>` negated inner product — /root/reference/vechord/spec.py:426-435) and
  * the multi-vector `@#` maxsim operator (spec.py:447-456), re-expressed as
  * Spark column expressions.
  *
  * All math is done in DOUBLE regardless of the storage type (float32 on
  * disk) so results are reproducible across engines; the fold is a
  * sequential left-fold (`aggregate`), deterministic for a given array
  * order. For the codegen'd hot path used by the scale-oriented operators
  * see `org.apache.spark.sql.graft.VecExprs` (bit-identical by
  * construction); these composed-builtin forms document the reference
  * semantics in plain DataFrame algebra.
  */
object Vec {

  /** Sequential-fold dot product of two array<numeric> columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** Squared L2 norm of one array column. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double"))

  /** Euclidean (L2) distance — reference op `<->`. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))

  /** Cosine distance (1 - cos similarity) — reference op `<=>`. */
  def cosDist(a: Column, b: Column): Column =
    lit(1.0) - dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine similarity. */
  def cosSim(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Negated inner product — reference op `<#>` (smaller = more similar). */
  def negDot(a: Column, b: Column): Column = -dot(a, b)

  /** MaxSim late-interaction score over multi-vector columns
    * (array<array<float>>): sum over query tokens of the max over doc
    * tokens of the per-pair similarity. Reference `@#` returns the
    * NEGATED maxsim (an ordering key where smaller = better); this
    * returns the positive score — negate at the call site to sort asc.
    *
    * simFn: (queryToken, docToken) => similarity column.
    */
  def maxSim(queryTokens: Column, docTokens: Column,
             simFn: (Column, Column) => Column): Column =
    aggregate(
      transform(queryTokens, q =>
        array_max(transform(docTokens, d => simFn(q, d)))),
      lit(0.0),
      (acc, x) => acc + x)

  /** MaxSim with dot-product similarity (the vchordrq maxsim semantics). */
  def maxSimDot(queryTokens: Column, docTokens: Column): Column =
    maxSim(queryTokens, docTokens, dot)

  /** Slice an array column into fixed-width token vectors:
    * array<float> of length n*width -> array<array<float>> of n tokens.
    * 1-based positions per Spark's `slice`. */
  def asTokens(vec: Column, nTokens: Int, width: Int): Column =
    transform(sequence(lit(0), lit(nTokens - 1)),
      i => slice(vec, i * width + 1, lit(width)))
}

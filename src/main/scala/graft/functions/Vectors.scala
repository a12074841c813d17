package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float|double>` embedding
  * columns, built entirely from codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`) — no UDFs, so the expressions
  * stay inside whole-stage codegen and work on any Dataset without
  * serialization round-trips.
  *
  * All math is promoted to float64 first: summation is sequential
  * left-to-right inside `aggregate`, which makes results deterministic
  * and reproducible across engines (the DuckDB oracle does the same).
  */
object Vectors {

  /** Cast array<float> → array<double> element-wise. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential dot product in float64 — codegen'd custom Expression
    * ([[graft.functions.expressions.DotProduct]]); accepts float or
    * double arrays directly, promoting per element. Identical results
    * to the higher-order-function form, ~5× faster (no interpreted
    * lambda dispatch, no array copy). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Reference higher-order-function dot (kept as the readable spec of
    * [[dot]]'s semantics; tests assert both agree). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Sum of squares, sequential. */
  def sq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(sq(a))

  /** Cosine similarity of two float64 arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (the shape used in top-k search:
    * norms are computed once per row before the join fan-out, not per
    * candidate pair). */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Symmetric per-vector int8 quantization scale: max|x|/127, floored
    * at 1e-30 so an all-zero vector quantizes to zeros instead of NaN.
    * At 100 TB the point is storage/shuffle: float32[d] → int8[d] + one
    * double is a ~4× reduction for ANN candidate stores and shipped
    * broadcast sides; cosine on dequantized vectors stays within ~1e-3
    * of exact (spec-pinned). */
  def int8Scale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x.cast("double")))), lit(1e-30))
      ./(lit(127d))

  /** Quantize to int8 with the given scale (round half-up, as DuckDB). */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("tinyint"))

  /** Reconstruct float64 values from (q, scale). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}

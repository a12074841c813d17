package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership as a broadcastable column predicate.
  *
  * Build side: `ofLongs` aggregates a long column into one
  * `org.apache.spark.util.sketch.BloomFilter` (distributed build — the
  * same treeAggregate Spark's own runtime row-group filtering uses) and
  * serializes it to bytes. Probe side: `mightContainLong` wraps
  * Catalyst's codegen'd [[BloomFilterMightContain]] — the bloom bytes
  * ride the plan as a foldable binary literal (shipped once per task
  * binary, deserialized once per executor), so the probe is a pure
  * per-row bit test inside whole-stage codegen: no UDF, no shuffle, no
  * driver round-trip.
  *
  * Sizing contract is the caller's: a bloom over n items at fpp f costs
  * ~-1.44·n·log2(f) bits (n=10⁹, f=1% ≈ 1.7 GB). For a reference that
  * big, raise fpp — every false positive only routes one extra row to
  * the exact verify join, it never changes results.
  */
object Bloom {

  /** Serialized bloom over `longCol` (built with `putLong`, probed with
    * `mightContainLong` — the two sides must agree on the long key).
    * `expectedItems` is clamped to ≥ 1 so an empty build side yields a
    * valid always-negative filter instead of an error. */
  def ofLongs(df: DataFrame, longCol: Column, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = df.select(longCol.as("__bloom_key"))
      .stat.bloomFilter("__bloom_key", math.max(expectedItems, 1L), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Per-row membership probe: NULL on a NULL key (mirroring Catalyst
    * semantics) — callers that must keep NULL-keyed rows should wrap in
    * `coalesce(_, lit(false))`. */
  def mightContainLong(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(value)))
}

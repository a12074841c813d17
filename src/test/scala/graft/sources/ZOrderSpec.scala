package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton key arithmetic + the layout's actual data-skipping payoff. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits round-robin (hand-computed)") {
    // a=0b11, b=0b01 → lanes: a bits at 0,2; b bits at 1,3
    //   a bit0 (1) -> pos 0; b bit0 (1) -> pos 1; a bit1 (1) -> pos 2;
    //   b bit1 (0) -> pos 3  ⇒ 0b0111 = 7
    val r = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
      .head().getLong(0)
    assert(r === 7L)
    // order matters: swapping columns swaps lanes → 0b1011 = 11
    val r2 = Seq((3L, 1L)).toDF("a", "b")
      .select(ZOrder.zorderKey(Seq(col("b"), col("a")), 16).as("z"))
      .head().getLong(0)
    assert(r2 === 11L)
  }

  test("zorderKey preserves locality: close pairs get close keys") {
    // (5, 9) and (5, 8) differ in one low bit of one dimension; their
    // Morton keys differ only in that bit's lane
    val df = Seq((5L, 9L), (5L, 8L)).toDF("a", "b")
      .select(ZOrder.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
    val Array(z1, z2) = df.collect().map(_.getLong(0))
    assert((z1 ^ z2) === 2L) // bit 0 of column b sits in lane 1
  }

  test("zorderKey is a bijection: keys decode back to their coordinates") {
    // deterministic pseudo-random 16-bit pairs + the corner cases
    val pairs = (Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L)) ++
      (1 to 200).map(i => ((i * 7919L) % 65536, (i * 104729L) % 65536))).distinct
    def decode(z: Long): (Long, Long) = {
      var a = 0L; var b = 0L
      for (i <- 0 until 16) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (a, b)
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(decode(z) == (a, b), s"key $z decodes to ${decode(z)}, not ($a,$b)")
    }
    assert(got.map(_._3).distinct.length == pairs.size) // injective
  }

  test("z-ordered layout prunes files on BOTH dimensions") {
    // 64x64 grid, every cell once: a single-column sort clusters only
    // its leading column; the Morton layout gives every file a tight
    // range on each dimension, so a point predicate on either column
    // touches few files.
    val dim = 64
    val grid = spark.range(dim.toLong * dim)
      .select((col("id") % dim).as("x"), (col("id") / dim).as("y"))
    val zDir = Files.createTempDirectory("graft-zorder").toString + "/z"
    val linDir = Files.createTempDirectory("graft-zorder").toString + "/lin"
    val files = 16
    ZOrder.writeZOrdered(grid, Seq("x", "y"), 6, zDir, files)
    // comparison layout: sorted by x only (the "obvious" sort)
    grid.repartitionByRange(files, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    val z = spark.read.parquet(zDir)
    val lin = spark.read.parquet(linDir)
    // x point-lookup: both layouts prune (x leads both), z-order at
    // worst a small factor behind
    val zx = ZOrder.filesTouched(z, "x", 7)
    // y point-lookup: the x-sorted layout must touch EVERY file (y is
    // uniform within each x-range); z-order keeps it local
    val zy = ZOrder.filesTouched(z, "y", 7)
    val liny = ZOrder.filesTouched(lin, "y", 7)
    assert(liny === files.toLong) // the bad layout really is bad
    assert(zy <= files / 2) // the z layout skips at least half on y
    assert(zx <= files / 2) // ...while still pruning on x
  }
}

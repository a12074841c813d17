package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class ParquetSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  test("writeSized: rows round-trip, file count tracks the size target") {
    val li = Tables.lineitem(spark, dir)
    val n = li.count()
    val work = java.nio.file.Files.createTempDirectory("wsized").toString

    // 1MB target on an ~11MB source -> several files
    val partsSmall = Parquet.writeSized(li, s"$work/small", targetMB = 1)
    val smallBack = spark.read.parquet(s"$work/small")
    assert(smallBack.count() == n, "writeSized must not drop rows")
    val smallFiles = new java.io.File(s"$work/small")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(smallFiles == partsSmall && partsSmall > 1,
      s"1MB target on sf0.1 lineitem should split: $partsSmall/$smallFiles")

    // huge target -> exactly one file
    val partsBig = Parquet.writeSized(li, s"$work/big", targetMB = 10000)
    val bigFiles = new java.io.File(s"$work/big")
      .listFiles().count(_.getName.startsWith("part-"))
    assert(partsBig == 1 && bigFiles == 1, s"got $partsBig/$bigFiles")
    assert(spark.read.parquet(s"$work/big").count() == n)

    // columns survive the round trip
    assert(smallBack.columns.sorted.sameElements(li.columns.sorted))
  }
}

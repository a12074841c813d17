package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of the z-order layout's data-skipping claim at
  * sf0.1 (test scope):
  * `sbt "Test/runMain graft.sources.ZOrderScaleDemo"` writes the 600k-
  * row lineitem twice at 32 files — Morton-ordered on
  * (l_partkey, l_suppkey) vs sorted on l_partkey alone — then counts
  * how many files a point predicate on EACH column could touch (file
  * min/max containment, the same stats parquet footers give the
  * planner). The single-column sort serves only its leading column;
  * the claim under test is that the Morton layout prunes on both. */
object ZOrderScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val base = Files.createTempDirectory("graft-zdemo").toString
    val files = 32
    ZOrder.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), 16,
      s"$base/z", files)
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/lin")
    val z = spark.read.parquet(s"$base/z")
    val lin = spark.read.parquet(s"$base/lin")
    // probe a spread of live keys so no single lucky key decides it
    val partKeys = Seq(17L, 4242L, 9001L, 15000L, 19987L)
    val suppKeys = Seq(3L, 250L, 512L, 777L, 999L)
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    val zPart = partKeys.map(ZOrder.filesTouched(z, "l_partkey", _))
    val linPart = partKeys.map(ZOrder.filesTouched(lin, "l_partkey", _))
    val zSupp = suppKeys.map(ZOrder.filesTouched(z, "l_suppkey", _))
    val linSupp = suppKeys.map(ZOrder.filesTouched(lin, "l_suppkey", _))
    println(s"[zdemo] files=$files rows=${li.count()}")
    println(s"[zdemo] l_partkey point lookup: zorder avg ${avg(zPart)} " +
      s"(${zPart.mkString(",")}) vs partkey-sorted avg ${avg(linPart)} " +
      s"(${linPart.mkString(",")})")
    println(s"[zdemo] l_suppkey point lookup: zorder avg ${avg(zSupp)} " +
      s"(${zSupp.mkString(",")}) vs partkey-sorted avg ${avg(linSupp)} " +
      s"(${linSupp.mkString(",")})")
    spark.stop()
  }
}

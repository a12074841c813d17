package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Directory-partitioned parquet layout must prune at the FILE level:
  * a filter on the partition column becomes a PartitionFilter and the
  * scan touches only matching directories. */
class PartitioningSpec extends SparkSpec {

  test("partitionBy layout: partition filter prunes files, not just rows") {
    val dir = Files.createTempDirectory("part").toString + "/docs"
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = (read.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect { case s: FileSourceScanExec => s }.head

    assert(scan.partitionFilters.nonEmpty,
      s"lang predicate must become a partition filter: ${scan.partitionFilters}")
    // the pruned scan reads only the en/ directory's files
    val allFiles = scan.relation.location.inputFiles.length
    val selected = scan.selectedPartitions.totalNumberOfFiles
    assert(selected < allFiles,
      s"expected pruning: selected=$selected of $allFiles files")

    val expected = docs.filter(col("lang") === "en").count()
    assert(read.count() == expected)
  }
}

package graft.m5

import org.apache.spark.sql.SparkSession

import graft.config.YamlConfig

/** Consumer-style driver for the M5 tier: layered yaml config →
  * pipeline run → submission CSV. Run with
  * `sbt "Test/runMain graft.m5.M5Demo <inputDir> <outputDir> <configDir> <name>"`.
  * (Test scope only for the fixture generator; the pipeline itself is
  * main-scope library code.) */
object M5Demo {
  def main(args: Array[String]): Unit = {
    val Array(inputDir, outputDir, configDir, name) = args
    MiniM5Fixture.write(inputDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = YamlConfig.layered(configDir, name)
      .withOverrides(Map("input_dir" -> inputDir, "output_dir" -> outputDir))
    val report = new M5Pipeline(spark, cfg).run()
    println(s"ran=${report.ran.size} skipped=${report.skipped.size}")
    println("--- submission head ---")
    scala.io.Source.fromFile(s"$outputDir/submission.csv").getLines().take(4)
      .foreach(l => println(l.split(",").take(9).mkString(",")))
    spark.stop()
  }
}

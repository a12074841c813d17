package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** O1/O5 — CSV source and sink.
  * Ref: pd.read_csv (common.py:42-45), to_csv (pipeline.py:379).
  */
object Csv {

  /** O1 — CSV scan with an EXPLICIT schema. The reference lets pandas
    * infer dtypes per run; at 100 TB schema inference is a full extra
    * pass over the data and a correctness hazard (a single odd row
    * flips a column to string), so the engine always declares the
    * schema up front. */
  def source(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** O5 — distributed CSV sink: one part per partition, header on
    * each. The right shape for big outputs. */
  def sink(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  /** O5 — single-FILE CSV sink for driver-sized outputs (the M5
    * submission is 60k rows). Writes through a temp directory then
    * moves the single part file to `path` — Spark has no single-file
    * writer, and `coalesce(1)` is only safe because the caller
    * guarantees the result fits one partition. Never use for data
    * plane outputs. */
  def sinkSingleFile(df: DataFrame, path: String): Unit = {
    val tmp = path + ".__tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file under $tmp"))
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    Files.move(part, Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    TaskRunnerFiles.deleteRecursive(tmp)
  }
}

private[io] object TaskRunnerFiles {
  def deleteRecursive(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
  }
}

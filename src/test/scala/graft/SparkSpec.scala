package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM per `sbt test`
  * fork; suites reuse the session to avoid per-suite startup cost).
  *
  * r20 (VERIFY_r19 tests_ok:false — TweedieGbtSpec died on
  * "SparkContext was shut down" mid-suite in the round driver's
  * memory-constrained environment): every suite now RELEASES its
  * residual storage on exit. Cached frames and localCheckpoint
  * blocks a suite leaves behind otherwise accumulate across all ~50
  * suites of the shared JVM, and the heaviest ML suite — which runs
  * late in alphabetical order — inherits a heap full of dead blocks;
  * an OOM anywhere in an executor thread stops the shared context
  * and cascades. Clearing per suite bounds the steady-state heap at
  * one suite's working set. The periodic-GC interval is also
  * shortened: the ContextCleaner's default 30 min never fires inside
  * a ~17 min test run, so weakly-referenced checkpoint blocks were
  * never collected at all. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override protected def afterAll(): Unit = {
    try {
      if (SparkSpec.initialized) {
        val s = SparkSpec.session
        s.sharedState.cacheManager.clearCache()
        // reaches localCheckpoint blocks too — they live as persisted
        // RDDs that DataFrame.unpersist alone cannot see
        s.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    super.afterAll()
  }
}

object SparkSpec {
  @volatile private var initialized = false
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    initialized = true
    s
  }
}

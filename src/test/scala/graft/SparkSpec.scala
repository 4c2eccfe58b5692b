package graft

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs (one JVM-wide session — Spark
  * getOrCreate makes this cheap across suites). */
trait SparkSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): Path =
    Files.createTempDirectory(SparkSpec.runTmp, prefix)

  def sf(scale: String = "0.001"): String = s"/root/testdata/sf$scale"
}

object SparkSpec {
  /** Run-private scratch root, removed wholesale at JVM exit —
    * File.deleteOnExit silently skips non-empty dirs, so suites used to
    * leave ~1 GB of table scratch in /tmp per full run. The property
    * redirect also routes code-internal scratch (stream checkpoints, CTAS
    * warehouses, Spark local dirs) under the same root. */
  private[graft] val runTmp: Path = {
    val base = System.getProperty("java.io.tmpdir", "/tmp")
    val d = java.nio.file.Paths.get(base,
      s"graft-test-run-${ProcessHandle.current().pid()}")
    Files.createDirectories(d)
    System.setProperty("java.io.tmpdir", d.toString)
    sys.addShutdownHook { graft.log.TxLog.deleteRecursively(d) }: Unit
    d
  }

  lazy val session: SparkSession = { runTmp: Unit; SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.extensions", "graft.table.GraftSparkExtensions")
    .getOrCreate() }
}

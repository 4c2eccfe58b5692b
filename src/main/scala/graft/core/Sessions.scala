package graft.core

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory — the reference's `optimize_spark_config`
  * (src/data_processor.py:55-84) and environment sizing (src/config.py:20-46,
  * 76-92) re-expressed as a builder (SURVEY §4).
  *
  * The defaults are the reference's 10TB+/day design constants; shuffle
  * partitions scale with the environment profile exactly like the
  * reference's dev/staging/prod presets.
  */
object Sessions {

  /** Environment sizing profiles (src/config.py:76-92). */
  sealed abstract class Profile(val shufflePartitions: Int)
  case object Dev extends Profile(200)
  case object Staging extends Profile(1000)
  case object Prod extends Profile(4000)
  /** Local testing: shuffle partitions = cores. */
  case class Local(cores: Int) extends Profile(cores)

  def builder(
      appName: String = "graft",
      profile: Profile = Dev,
      master: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      // AQE trio (src/data_processor.py:59-62)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // sizing constants (src/data_processor.py:65-79; src/config.py:24-27)
      .config("spark.sql.shuffle.partitions", profile.shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (100L * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "snappy")
      // deterministic timestamps + footer-stats-friendly parquet writes
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // column mapping: stamp/resolve parquet field ids — a no-op for
      // schemas without ids (plain name matching), by-id resolution for
      // mapped tables (RENAME/DROP COLUMN without file rewrites)
      .config("spark.sql.parquet.fieldId.write.enabled", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      // metadata-only agg rule + native SQL DML (UPDATE/MERGE/DELETE) on
      // graft catalog tables. Appended to (not clobbering) any extensions
      // the caller supplied via JVM properties / spark-defaults — Spark
      // accepts a comma-separated list here.
      .config("spark.sql.extensions", {
        val graftExt = "graft.table.GraftSparkExtensions"
        val existing = new org.apache.spark.SparkConf(true)
          .getOption("spark.sql.extensions")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty)
        (existing.filterNot(_ == graftExt) :+ graftExt).mkString(",")
      })
    val withMaster = profile match {
      case Local(n) => b.master(master.getOrElse(s"local[$n]"))
      case _        => master.map(b.master).getOrElse(b)
    }
    withMaster
  }

  def local(cores: Int, appName: String = "graft"): SparkSession =
    builder(appName, Local(cores)).config("spark.ui.enabled", "false").getOrCreate()
}

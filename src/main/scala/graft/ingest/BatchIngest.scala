package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}

import graft.table.LakeTable

/** Batch ingestion: the reference's bronze-layer readers and write-side
  * sizing (SURVEY §2.1 S1-S6/S13, §2.2 W6; reference:
  * notebooks/01_bronze_ingestion.py, migration/migrate_from_hdfs.py,
  * migration/migrate_from_s3.py, src/data_processor.py).
  *
  * All readers return plain DataFrames — Catalyst owns pushdown/pruning; the
  * value added here is schema enforcement, source-metadata columns, and
  * partition-count sizing so files land at ~128 MB regardless of source
  * fragmentation.
  */
object BatchIngest {

  /** Reader options shared by the format readers. */
  case class ReadConfig(
      schema: Option[StructType] = None,
      pathGlobFilter: Option[String] = None,
      recursive: Boolean = false,
      options: Map[String, String] = Map.empty)

  private def base(spark: SparkSession, c: ReadConfig): DataFrameReader = {
    var r = spark.read.options(c.options)
    c.schema.foreach(s => r = r.schema(s))
    c.pathGlobFilter.foreach(g => r = r.option("pathGlobFilter", g))
    if (c.recursive) r = r.option("recursiveFileLookup", "true")
    r
  }

  /** S1: schema-enforced Parquet scan (notebooks/01_bronze_ingestion.py:158-164). */
  def parquet(spark: SparkSession, path: String, c: ReadConfig = ReadConfig()): DataFrame =
    base(spark, c).parquet(path)

  /** S2: CSV with header + inference (migration/migrate_from_hdfs.py:130-132). */
  def csv(spark: SparkSession, path: String, c: ReadConfig = ReadConfig()): DataFrame = {
    val r = base(spark, c).option("header", "true")
    (if (c.schema.isEmpty) r.option("inferSchema", "true") else r).csv(path)
  }

  /** S3: JSON incl. multiLine (migration/migrate_from_s3.py:84-85). */
  def json(spark: SparkSession, path: String, c: ReadConfig = ReadConfig()): DataFrame =
    base(spark, c).json(path)

  /** Resolved avro provider. The "avro" short name only works when the
    * spark-avro module's service registration is on the classpath; Spark 4's
    * spark-sql jar bundles the implementation class WITHOUT registering it,
    * so the explicit class name is the portable spelling. None = no avro
    * support at all. */
  lazy val avroProvider: Option[String] = {
    val cls = "org.apache.spark.sql.avro.AvroFileFormat"
    if (scala.util.Try(Class.forName(cls)).isSuccess) Some(cls) else None
  }
  def avroAvailable: Boolean = avroProvider.isDefined

  /** S4: format-parametrized scan (migration/migrate_from_hdfs.py:109-134).
    * Failing fast on a missing avro provider with an actionable message
    * beats Spark's generic lookup error mid-plan. */
  def format(spark: SparkSession, fmt: String, path: String,
      c: ReadConfig = ReadConfig()): DataFrame = fmt.toLowerCase match {
    case "parquet" => parquet(spark, path, c)
    case "csv"     => csv(spark, path, c)
    case "json"    => json(spark, path, c)
    case "orc"     => base(spark, c).orc(path)
    case "avro"    => avroProvider match {
      case Some(p) => base(spark, c).format(p).load(path)
      case None => throw new IllegalStateException(
        "avro support requires the spark-avro classes on the classpath " +
          "(org.apache.spark:spark-avro_2.13); none were found")
    }
    case other     => base(spark, c).format(other).load(path)
  }

  // ------------------------------------------------------------------ JDBC

  /** JDBC url builder for the reference's four dialects
    * (migration/migrate_from_rdbms.py:35-51, drivers :329-340). */
  def jdbcUrl(dbType: String, host: String, port: Int, database: String): (String, String) =
    dbType.toLowerCase match {
      case "postgresql" => (s"jdbc:postgresql://$host:$port/$database", "org.postgresql.Driver")
      case "mysql"      => (s"jdbc:mysql://$host:$port/$database", "com.mysql.cj.jdbc.Driver")
      case "sqlserver"  => (s"jdbc:sqlserver://$host:$port;databaseName=$database",
        "com.microsoft.sqlserver.jdbc.SQLServerDriver")
      case "oracle"     => (s"jdbc:oracle:thin:@$host:$port:$database",
        "oracle.jdbc.driver.OracleDriver")
      case t => throw new IllegalArgumentException(s"unsupported db type: $t")
    }

  /** S5: partitioned parallel JDBC scan (migration/migrate_from_rdbms.py:78-96).
    * `bounds` = (partitionColumn, lowerBound, upperBound, numPartitions). */
  def jdbc(
      spark: SparkSession,
      url: String,
      dbtable: String,
      user: String,
      password: String,
      driver: String,
      bounds: Option[(String, Long, Long, Int)] = None,
      fetchSize: Int = 10000): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("user", user).option("password", password)
      .option("driver", driver).option("fetchsize", fetchSize)
    bounds.foreach { case (col, lb, ub, n) =>
      r = r.option("partitionColumn", col).option("lowerBound", lb)
        .option("upperBound", ub).option("numPartitions", n)
    }
    r.load()
  }

  /** S6: source-side incremental pushdown — the predicate is evaluated by the
    * database, not Spark (migration/migrate_from_rdbms.py:153-166). */
  def jdbcIncrementalTable(table: String, watermarkCol: String, lastValue: String): String =
    s"(SELECT * FROM $table WHERE $watermarkCol > '$lastValue') AS incremental_data"

  // -------------------------------------------------- metadata + sizing

  /** Bronze metadata columns (notebooks/01_bronze_ingestion.py:56-62):
    * ingestion timestamp/date, source file, and a sha2 row hash over the
    * original columns for change detection. */
  def withIngestionMetadata(df: DataFrame, sourceLabel: String = ""): DataFrame = {
    val hashed = df.columns.toIndexedSeq.map(col)
    df.withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("_ingestion_date", current_date())
      .withColumn("_source_file",
        if (sourceLabel.nonEmpty) lit(sourceLabel) else input_file_name())
      .withColumn("_record_hash", sha2(to_json(struct(hashed: _*)), 256))
  }

  /** Optimal shuffle/file partition count (src/data_processor.py:294-300):
    * max(min, bytes/128MB) capped at 10000. Size is estimated from the
    * logical plan when available, else rowCount × avgRowBytes. */
  def optimalPartitions(
      sizeBytes: Long,
      minPartitions: Int = 1,
      targetBytes: Long = 128L * 1024 * 1024,
      cap: Int = 10000): Int =
    math.min(cap, math.max(minPartitions, math.ceil(sizeBytes.toDouble / targetBytes).toLong)).toInt

  def estimatedSizeBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong

  /** Repartition for write (W6, notebooks/01_bronze_ingestion.py:169-173):
    * partition count from estimated size; optional distribution keys. */
  def repartitionForWrite(df: DataFrame, keys: Seq[Column] = Nil,
      minPartitions: Int = 1): DataFrame = {
    val n = optimalPartitions(estimatedSizeBytes(df), minPartitions)
    if (keys.isEmpty) df.repartition(n) else df.repartition(n, keys: _*)
  }

  /** End-to-end bronze ingestion (reference's ingest_*_data functions):
    * read → transform hook → metadata columns → sized write into `table`. */
  def ingestToTable(
      spark: SparkSession,
      fmt: String,
      path: String,
      table: LakeTable,
      c: ReadConfig = ReadConfig(),
      transform: DataFrame => DataFrame = identity,
      overwrite: Boolean = false): Long = {
    val df = withIngestionMetadata(transform(format(spark, fmt, path, c)))
    val sized = repartitionForWrite(df)
    if (overwrite) table.overwrite(sized, overwriteSchema = true)
    else table.append(sized, mergeSchema = true)
  }
}

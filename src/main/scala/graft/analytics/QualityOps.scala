package graft.analytics

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.quality.Quality
import graft.streaming.StreamIngest
import graft.table.LakeTable

/** Driver-contract queries for the quality validators (SURVEY §2.13) and
  * streaming ingestion (§2.11), DuckDB-verifiable over the testdata tables.
  */
object QualityOps {

  /** Q1+Q2 composite quality report over orders. */
  def qualityReport(spark: SparkSession, sfDir: String): DataFrame =
    Quality.report(Tables.orders(spark, sfDir), Seq("o_orderkey"),
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  /** Q5: duplicate-ID histogram over lineitem order keys. */
  def duplicateIds(spark: SparkSession, sfDir: String): DataFrame =
    Quality.duplicateIds(Tables.lineitem(spark, sfDir), Seq("l_orderkey"))

  /** Q3: range validation over lineitem quantity/discount. */
  def rangeValidation(spark: SparkSession, sfDir: String): DataFrame =
    Quality.rangeValidation(Tables.lineitem(spark, sfDir),
      Map("l_quantity" -> (1.0, 25.0), "l_discount" -> (0.0, 0.05)))

  /** S11+W7 end-to-end: spool orders to JSON, stream it into a graft table
    * with AvailableNow, return the table (oracle = the orders table itself). */
  def streamIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val base = Files.createTempDirectory("graft-stream")
    val srcDir = base.resolve("src").toString
    orders.write.json(srcDir)
    val table = LakeTable.create(spark, base.resolve("tbl").toString, orders.schema)
    val q = StreamIngest.ingest(spark, srcDir, orders.schema, table,
      base.resolve("ck").toString,
      StreamIngest.StreamConfig(trigger = Trigger.AvailableNow(),
        maxFilesPerTrigger = 8))
    q.awaitTermination()
    table.read()
  }

  /** Curation-funnel gate (q75): three quality stages over documents with
    * first-fail attribution — the report row per stage carries how many
    * docs died there and how many survive past it. Stage predicates reuse
    * the q27-proven token/punctuation formulas so the oracle replays them
    * exactly. */
  def filterCascade(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.text.TextAnalysis
    val docs = Tables.documents(spark, sfDir)
    val t = col("text")
    Quality.cascadeReport(docs, Seq(
      "min_tokens" -> (TextAnalysis.tokenCount(t) >= 30),
      "max_punct" -> (TextAnalysis.punctRatio(t) <= 0.045),
      "min_chars" -> (TextAnalysis.charCount(t) >= 200)))
  }

  private val cascadeToks =
    """CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       ELSE string_split_regex(trim(text), '\s+') END"""
  private val cascadePunct =
    """(CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
       / greatest(length(text), 1))"""

  val oracles: Map[String, String] = Map(
    "q75_filter_cascade" ->
      s"""WITH m AS (SELECT
             CASE WHEN NOT coalesce(len($cascadeToks) >= 30, false) THEN 0
                  WHEN NOT coalesce($cascadePunct <= 0.045, false) THEN 1
                  WHEN NOT coalesce(length(text) >= 200, false) THEN 2
                  ELSE 3 END AS f
           FROM documents)
         SELECT 0 AS stage_id, 'min_tokens' AS stage,
             (SELECT count(*) FROM m WHERE f = 0) AS failed,
             (SELECT count(*) FROM m WHERE f > 0) AS surviving
         UNION ALL SELECT 1, 'max_punct',
             (SELECT count(*) FROM m WHERE f = 1),
             (SELECT count(*) FROM m WHERE f > 1)
         UNION ALL SELECT 2, 'min_chars',
             (SELECT count(*) FROM m WHERE f = 2),
             (SELECT count(*) FROM m WHERE f > 2)""",
    "q30_quality_report" ->
      """SELECT 'o_custkey' AS "column", CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS metric_value, COUNT(*) AS total_rows FROM orders
         UNION ALL SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT), COUNT(*) FROM orders
         UNION ALL SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT), COUNT(*) FROM orders
         UNION ALL SELECT '__duplicate_keys__', CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT), COUNT(*) FROM orders""",
    "q31_duplicate_ids" ->
      """SELECT l_orderkey, COUNT(*) AS occurrences FROM lineitem
         GROUP BY l_orderkey HAVING COUNT(*) > 1""",
    "q32_range_validation" ->
      """SELECT 'l_discount' AS "column", CAST(0.0 AS DOUBLE) AS min_allowed, CAST(0.05 AS DOUBLE) AS max_allowed,
           CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS out_of_range_rows FROM lineitem
         UNION ALL
         SELECT 'l_quantity', CAST(1.0 AS DOUBLE), CAST(25.0 AS DOUBLE),
           CAST(SUM(CASE WHEN l_quantity < 1.0 OR l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem""",
    "q33_stream_ingest" ->
      "SELECT * FROM orders")
}

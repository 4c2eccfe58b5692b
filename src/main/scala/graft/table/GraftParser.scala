package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension: `spark.sql("DESCRIBE HISTORY t")` / `DESCRIBE DETAIL`
  * on graft tables, the same surface Delta adds through its SQL extension.
  * The target is a path or a `cat.ns.table` name under a registered
  * [[graft.sources.GraftCatalog]] (resolved exactly like the GraftSql
  * wrapper's identifiers). DESCRIBE is a metadata-only read, so the plan
  * is materialized at parse time from the transaction log — O(log size)
  * driver work, no jobs. Everything else delegates to Spark's parser. */
class GraftParser(spark: SparkSession, delegate: ParserInterface) extends ParserInterface {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(\S+?)(?:\s+LIMIT\s+(\d+))?(\s+AS\s+JSON)?\s*""".r
  private val describeDetail = """(?is)\s*DESCRIBE\s+DETAIL\s+(\S+)\s*""".r
  // maintenance statements Spark's grammar does not know (Delta's extension
  // adds the same set): parsed here into eager commands — Spark executes
  // RunnableCommands when spark.sql() returns, which is exactly Delta's
  // OPTIMIZE/VACUUM timing. The statement bodies are delegated verbatim to
  // GraftSql, the single dispatcher both surfaces share.
  private val optimizeCmd =
    """(?is)\s*OPTIMIZE\s+(\S+?)(\s+FULL)?(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]+)\)|\s+CLUSTER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val reorgCmd =
    """(?is)\s*REORG\s+TABLE\s+(\S+?)(?:\s+WHERE\s+(.+?))?\s+APPLY\s*\(\s*PURGE\s*\)\s*""".r
  private val vacuumCmd =
    """(?is)\s*VACUUM\s+(\S+?)(\s+LITE)?(?:\s+USING\s+INVENTORY\s+\((.+)\))?(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*""".r
  // EXACTLY GraftSql's two restore forms: a broader match here would loop
  // (GraftSql falls back to spark.sql for statements it can't parse, which
  // would re-enter this parser)
  private val restoreCmd =
    """(?is)\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+(?:VERSION\s+AS\s+OF\s+\d+|TIMESTAMP\s+AS\s+OF\s+'[^']+')\s*""".r
  private val generateCmd =
    """(?is)\s*GENERATE\s+(?:symlink_format_manifest|uniform_iceberg)\s+FOR\s+TABLE\s+(\S+)\s*""".r
  // SHOW PARTITIONS is valid Spark grammar (unlike the statements above),
  // so it is intercepted ONLY when the target resolves to a graft table —
  // hive/parquet tables keep Spark's own implementation
  private val showPartitionsCmd = """(?is)\s*SHOW\s+PARTITIONS\s+(\S+)\s*""".r
  /** Resolve `t` as a graft table, or None when it is NOT one (the
    * `IllegalArgumentException` a non-graft path/name resolves to). Any
    * other failure — a transient log-IO error on a real graft table —
    * propagates instead of silently rerouting the statement to Spark. */
  private def graftTable(t: String): Option[LakeTable] =
    try Some(GraftSql.resolveSpec(spark, unquote(t)))
    catch { case _: IllegalArgumentException => None }

  private def unquote(id: String): String = {
    val t = id.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("`") && t.endsWith("`")))
      t.substring(1, t.length - 1)
    else t
  }

  private def command(sqlText: String, schema: org.apache.spark.sql.types.StructType) =
    GraftRunCommand(sqlText.trim.split("""\s+""").head.toUpperCase, schema,
      s => GraftSql(s).run(sqlText).collect().toSeq)

  private val versionOut = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("version",
      org.apache.spark.sql.types.LongType)))
  private val optimizeOut = org.apache.spark.sql.types.StructType(Seq(
    "version", "numFilesAdded", "numFilesRemoved", "numOutputRows").map(n =>
    org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType)))
  private val restoredOut = org.apache.spark.sql.types.StructType(Seq(
    "restored_version", "num_restored_files", "num_removed_files",
    "num_of_files_after_restore", "table_size_after_restore").map(n =>
    org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType)))
  private val pathOut = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType)))
  private val manifestOut = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("manifest",
      org.apache.spark.sql.types.StringType)))

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeHistory(t, limit, asJson) =>
      val lake = GraftSql.resolveSpec(spark, unquote(t))
      val lim = Option(limit).map(_.toInt)
      (if (asJson != null) lake.historyJson(lim) else lake.history(lim))
        .queryExecution.logical
    case describeDetail(t) =>
      GraftSql.resolveSpec(spark, unquote(t)).detail().queryExecution.logical
    case showPartitionsCmd(t) =>
      // resolve ONCE (resolution replays the transaction log); non-graft
      // targets keep Spark's own SHOW PARTITIONS
      graftTable(t) match {
        case Some(lake) => lake.showPartitions().queryExecution.logical
        case None => delegate.parsePlan(sqlText)
      }
    case optimizeCmd(_, _, _, _, _) => command(sqlText, optimizeOut)
    case reorgCmd(_, _) => command(sqlText, versionOut)
    case vacuumCmd(_, _, _, _, _) => command(sqlText, pathOut)
    case restoreCmd(_) => command(sqlText, restoredOut)
    case generateCmd(_) => command(sqlText, manifestOut)
    // never parses as Spark SQL (OPTIMIZE/VACUUM/... are not grammar words),
    // so a malformed maintenance statement gets a graft error, not Spark's
    // confusing syntax error — and can never re-enter this parser
    case s if s.trim.toUpperCase.startsWith("OPTIMIZE ") ||
        s.trim.toUpperCase.startsWith("VACUUM ") =>
      throw new IllegalArgumentException(s"cannot parse maintenance statement: $s")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parsePlanWithParameters(
      sqlText: String, parameterContext: ParameterContext): LogicalPlan =
    sqlText match {
      case describeHistory(_, _, _) | describeDetail(_) | optimizeCmd(_, _, _, _, _) |
           reorgCmd(_, _) | vacuumCmd(_, _, _, _, _) | restoreCmd(_) | generateCmd(_) |
           showPartitionsCmd(_) =>
        parsePlan(sqlText)
      case _ => delegate.parsePlanWithParameters(sqlText, parameterContext)
    }
}

/** Eager maintenance command (Spark runs RunnableCommands when `spark.sql`
  * returns — Delta's OPTIMIZE/VACUUM semantics): a fixed output schema plus
  * the GraftSql dispatch closure. */
case class GraftRunCommand(
    commandName: String,
    outSchema: org.apache.spark.sql.types.StructType,
    body: SparkSession => Seq[org.apache.spark.sql.Row])
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(outSchema)
  override def run(session: SparkSession): Seq[org.apache.spark.sql.Row] = body(session)
}

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
    """(?is)\s*DESCRIBE\s+HISTORY\s+(\S+?)(?:\s+LIMIT\s+(\d+))?\s*""".r
  private val describeDetail = """(?is)\s*DESCRIBE\s+DETAIL\s+(\S+)\s*""".r

  private def unquote(id: String): String = {
    val t = id.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("`") && t.endsWith("`")))
      t.substring(1, t.length - 1)
    else t
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case describeHistory(t, limit) =>
      GraftSql.resolveSpec(spark, unquote(t))
        .history(Option(limit).map(_.toInt)).queryExecution.logical
    case describeDetail(t) =>
      GraftSql.resolveSpec(spark, unquote(t)).detail().queryExecution.logical
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
      case describeHistory(_, _) | describeDetail(_) => parsePlan(sqlText)
      case _ => delegate.parsePlanWithParameters(sqlText, parameterContext)
    }
}

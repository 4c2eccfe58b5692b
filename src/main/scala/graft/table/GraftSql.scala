package graft.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** SQL-string surface for the table-management commands the reference
  * drives through `spark.sql(...)` (src/delta_utils.py:99-102, 151-174,
  * 191-195, 319, 356-364, 381-385):
  *
  *   DESCRIBE HISTORY <t> [LIMIT n]
  *   DESCRIBE DETAIL <t>
  *   SHOW TBLPROPERTIES <t>
  *   ALTER TABLE <t> SET TBLPROPERTIES ('k' = 'v' [, ...])
  *   RESTORE TABLE <t> TO VERSION AS OF <n>
  *   RESTORE TABLE <t> TO TIMESTAMP AS OF '<ts>'
  *   OPTIMIZE <t> [WHERE <pred>] [ZORDER BY (c1[, c2...])]
  *   VACUUM <t> [RETAIN <n> HOURS] [DRY RUN]
  *   CREATE TABLE [IF NOT EXISTS] <dst> {DEEP|SHALLOW} CLONE <src>
  *   CONVERT TO GRAFT [parquet.]'<path>'
  *
  * `<t>` is a quoted path ('...' or delta-style `...`) resolved to a
  * [[LakeTable]] by the pluggable `resolve` (default: filesystem path; use
  * the Catalog overload for 3-level names). Every command returns a
  * DataFrame so results compose with `spark.sql` pipelines over temp views
  * (see [[LakeTable.createOrReplaceTempView]] for the query side).
  * Anything that is not one of these commands is delegated to
  * `spark.sql(...)` verbatim, so one entry point serves both surfaces.
  */
class GraftSql(spark: SparkSession, resolve: String => LakeTable) {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(\S+?)(?:\s+LIMIT\s+(\d+))?\s*""".r
  private val describeDetail = """(?is)\s*DESCRIBE\s+DETAIL\s+(\S+)\s*""".r
  private val showProps = """(?is)\s*SHOW\s+TBLPROPERTIES\s+(\S+)\s*""".r
  private val setProps =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val restoreVersion =
    """(?is)\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  private val restoreTs =
    """(?is)\s*RESTORE\s+TABLE\s+(\S+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*""".r
  private val optimizeCmd =
    """(?is)\s*OPTIMIZE\s+(\S+?)(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*""".r
  private val vacuumCmd =
    """(?is)\s*VACUUM\s+(\S+?)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*""".r
  private val cloneCmd =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s+(DEEP|SHALLOW)\s+CLONE\s+(\S+)\s*""".r
  private val addConstraintCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val dropConstraintCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r
  // ALTER TABLE t ADD COLUMNS (c1 TYPE [COMMENT '...'], ...) —
  // the reference's schema-evolution DDL (notebooks/04_acid_operations.py:289-295)
  private val addColumnsCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+ADD\s+COLUMNS\s*\((.+)\)\s*""".r
  private val renameColumnCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val dropColumnCmd =
    """(?is)\s*ALTER\s+TABLE\s+(\S+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  // CONVERT TO GRAFT parquet.`/path` — Delta's CONVERT TO DELTA shape
  private val convertCmd =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+(?:parquet\.)?(\S+)\s*""".r

  private def unquote(id: String): String = {
    val t = id.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("`") && t.endsWith("`")))
      t.substring(1, t.length - 1)
    else t
  }
  private def table(id: String): LakeTable = resolve(unquote(id))

  private def oneRow(fields: (String, Any)*): DataFrame = {
    val schema = StructType(fields.map {
      case (n, _: Long) => StructField(n, LongType)
      case (n, _) => StructField(n, StringType)
    })
    spark.createDataFrame(
      Seq(Row.fromSeq(fields.map(_._2))).asJava, schema)
  }

  /** Split on commas at paren depth 0 (so `decimal(18,2)` survives). */
  private def splitTop(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var inStr = false
    body.indices.foreach { i =>
      body.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += body.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += body.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val columnDef =
    """(?is)\s*(\w+)\s+(.+?)(?:\s+COMMENT\s+'([^']*)')?\s*""".r

  /** Parse `c1 TYPE [COMMENT '...'], ...` into StructFields. */
  private def parseColumnDefs(body: String): Seq[StructField] =
    splitTop(body).map {
      case columnDef(name, ddlType, comment) =>
        val f = StructField(name,
          org.apache.spark.sql.types.DataType.fromDDL(ddlType.trim))
        Option(comment).map(c => f.withComment(c)).getOrElse(f)
      case bad => throw new IllegalArgumentException(s"bad column def: $bad")
    }

  /** Parse `'k' = 'v', k2 = v2, ...` (quotes optional, delta-style). */
  private def parseProps(body: String): Map[String, String] =
    body.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"bad TBLPROPERTIES entry: $kv")
      unquote(kv.substring(0, i).trim) -> unquote(kv.substring(i + 1).trim)
    }.toMap

  def run(sql: String): DataFrame = sql match {
    case describeHistory(t, limit) =>
      table(t).history(Option(limit).map(_.toInt))
    case describeDetail(t) => table(t).detail()
    case showProps(t) =>
      val props = table(t).properties.toSeq.sortBy(_._1)
      spark.createDataFrame(
        props.map { case (k, v) => Row(k, v) }.asJava,
        StructType(Seq(StructField("key", StringType), StructField("value", StringType))))
    case addConstraintCmd(t, name, check) =>
      oneRow("version" -> table(t).addConstraint(name, check))
    case dropConstraintCmd(t, name) =>
      oneRow("version" -> table(t).dropConstraint(name))
    case addColumnsCmd(t, defs) =>
      oneRow("version" -> table(t).addColumns(parseColumnDefs(defs)))
    case renameColumnCmd(t, from, to) =>
      oneRow("version" -> table(t).renameColumn(from, to))
    case dropColumnCmd(t, name) =>
      oneRow("version" -> table(t).dropColumn(name))
    case convertCmd(path) =>
      val t = LakeTable.convert(spark, unquote(path))
      oneRow("location" -> t.dir.toString, "version" -> t.version)
    case setProps(t, body) =>
      val v = table(t).setProperties(parseProps(body))
      oneRow("version" -> v)
    case restoreVersion(t, v) =>
      oneRow("restored_version" -> table(t).restoreToVersion(v.toLong))
    case restoreTs(t, ts) =>
      oneRow("restored_version" ->
        table(t).restoreToTimestamp(java.sql.Timestamp.valueOf(ts).getTime))
    case cloneCmd(dst, kind, src) =>
      val cloned = table(src).cloneTo(unquote(dst),
        shallow = kind.equalsIgnoreCase("SHALLOW"))
      oneRow("location" -> cloned.dir.toString)
    case optimizeCmd(t, where, zorder) =>
      val tbl = table(t)
      val pred = Option(where).map(w => expr(w))
      val v = Option(zorder) match {
        case Some(cols) =>
          tbl.optimizeZOrder(cols.split(',').map(_.trim).toSeq.filter(_.nonEmpty),
            where = pred)
        case None => tbl.optimizeCompact(where = pred)
      }
      oneRow("version" -> v)
    case vacuumCmd(t, retain, dry) =>
      val hours = Option(retain).map(_.toDouble).getOrElse(168.0)
      val paths = table(t).vacuum(hours, dryRun = dry != null)
      spark.createDataFrame(
        paths.map(Row(_)).asJava,
        StructType(Seq(StructField("path", StringType))))
    // not a table-management command — plain Spark SQL (temp views etc.)
    case other => spark.sql(other)
  }
}

object GraftSql {
  /** Table identifiers are filesystem paths. */
  def apply(spark: SparkSession): GraftSql =
    new GraftSql(spark, p => LakeTable.forPath(spark, p))
  /** Table identifiers are 3-level catalog names. */
  def apply(spark: SparkSession, catalog: graft.ingest.Catalog): GraftSql =
    new GraftSql(spark, n => catalog.table(n))
}

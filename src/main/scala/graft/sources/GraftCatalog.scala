package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}

import graft.log.TxLog
import graft.table.LakeTable

/** Session-catalog integration (DataSourceV2 `CatalogPlugin`): the
  * reference's primary UX is 3-level names through the session catalog —
  * `df.write.format("delta").saveAsTable("delta_migration.bronze.events")`
  * and `spark.table(f"{db}.{t}")`
  * (notebooks/01_bronze_ingestion.py:176-182, migration/migrate_from_hdfs
  * .py:53-54). Registering this class makes the same shapes work on graft
  * tables:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.g", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.g.warehouse", "/data/warehouse")
  * spark.sql("CREATE NAMESPACE g.bronze")
  * spark.sql("CREATE TABLE g.bronze.events (id BIGINT, day DATE) USING graft PARTITIONED BY (day)")
  * spark.sql("INSERT INTO g.bronze.events SELECT ...")
  * df.write.saveAsTable("g.bronze.events")        // append/CTAS
  * spark.table("g.bronze.events")                 // reads, with file skipping
  * spark.sql("SELECT * FROM g.bronze.events VERSION AS OF 3")
  * }}}
  *
  * Identifiers map to `warehouse/<ns...>/<table>` directories holding
  * ordinary graft tx-log tables — interchangeable with path-based access.
  * Reads bridge through [[V1Scan]] into [[LakeTable.read]] (stats + bloom +
  * partition file skipping, deletion-vector masking, metadata-only counts);
  * writes bridge through [[V1Write]] into append/overwrite commits. DML
  * (UPDATE/DELETE/MERGE) stays on [[graft.table.GraftSql]] / the API —
  * those are storage-level row operations, not catalog concerns.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = Option(options.get("warehouse")).getOrElse(throw new IllegalArgumentException(
      s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse"))
    warehouse = Paths.get(w)
    Files.createDirectories(warehouse): Unit
  }

  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    ident.namespace.foldLeft(warehouse)(_.resolve(_)).resolve(ident.name)

  private def nameOf(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  private def lake(ident: Identifier): LakeTable = {
    val d = dirOf(ident)
    if (!TxLog.isTable(d.toString)) throw new NoSuchTableException(ident)
    LakeTable.forPath(spark, d.toString)
  }

  // ---------------------------------------------------------------- tables

  override def tableExists(ident: Identifier): Boolean =
    TxLog.isTable(dirOf(ident).toString)

  override def loadTable(ident: Identifier): Table =
    GraftV2Table(lake(ident), nameOf(ident), None)

  /** `VERSION AS OF` time travel through pure SQL. */
  override def loadTable(ident: Identifier, version: String): Table =
    GraftV2Table(lake(ident), nameOf(ident), Some(version.toLong))

  /** `TIMESTAMP AS OF` — Spark hands micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = lake(ident)
    GraftV2Table(t, nameOf(ident), Some(t.log.versionAt(timestamp / 1000L)))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    Files.list(d).iterator().asScala
      .filter(p => TxLog.isTable(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  private def partitionCols(partitions: Array[Transform]): Seq[String] =
    partitions.toSeq.map {
      case t if t.name == "identity" && t.references.length == 1 =>
        t.references.head.fieldNames.mkString(".")
      case t => throw new UnsupportedOperationException(
        s"graft tables support identity partitioning only, got: $t")
    }

  /** Engine/catalog-reserved keys aren't table properties. */
  private def tableProps(properties: JMap[String, String]): Map[String, String] = {
    val reserved = Set("provider", "location", "owner", "external", "comment",
      "option.path", "path")
    properties.asScala.filterNot { case (k, _) => reserved(k.toLowerCase) }.toMap
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    LakeTable.create(spark, dirOf(ident).toString, schema,
      partitionCols(partitions), tableProps(properties))
    loadTable(ident)
  }

  // ------------------------------------------------- staged create/replace

  /** `[CREATE OR] REPLACE TABLE [AS SELECT]` as Spark's ATOMIC plans.
    * Replace is ONE engine commit (`LakeTable.replaceTable`): new
    * schema/partitioning/properties, all files swapped, query output staged
    * into the same commit — prior versions stay time-travelable, and a
    * failed RTAS query leaves the old table untouched (the staged files are
    * invisible orphans). Without this, Spark falls back to DROP + CREATE,
    * which erases history and leaves no table at all on a mid-query
    * failure. Staged CREATE commits the table only at commitStagedChanges
    * (create, then the captured query output as the first append). */
  override def stageCreate(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    new StagedGraftTable(ident, schema, partitions, properties, replace = false, orCreate = true)
  }

  override def stageReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new StagedGraftTable(ident, schema, partitions, properties, replace = true, orCreate = false)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: JMap[String, String]): org.apache.spark.sql.connector.catalog.StagedTable =
    new StagedGraftTable(ident, schema, partitions, properties, replace = true, orCreate = true)

  private class StagedGraftTable(
      ident: Identifier, stagedSchema: StructType, partitions: Array[Transform],
      stagedProps: JMap[String, String], replace: Boolean, orCreate: Boolean)
    extends org.apache.spark.sql.connector.catalog.StagedTable with SupportsWrite {

    // the AS SELECT output, captured un-executed; the engine runs it inside
    // its own staging/commit
    private var captured: Option[DataFrame] = None

    override def name(): String = nameOf(ident)
    override def schema(): StructType = stagedSchema
    override def partitioning(): Array[Transform] = partitions
    override def properties(): JMap[String, String] = stagedProps
    override def capabilities(): JSet[TableCapability] =
      Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

    // RTAS plans an overwrite-style write (truncate) on the staged table;
    // the replace commit already swaps every file, so truncate is a marker
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        override def truncate(): WriteBuilder = this
        override def build(): Write = new V1Write {
          override def toInsertableRelation: InsertableRelation =
            new InsertableRelation {
              override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
                captured = Some(data)
            }
        }
      }

    override def commitStagedChanges(): Unit = {
      val pcols = partitionCols(partitions)
      val props = tableProps(stagedProps)
      val dir = dirOf(ident).toString
      if (replace && tableExists(ident))
        LakeTable.forPath(spark, dir)
          .replaceTable(stagedSchema, pcols, props, captured): Unit
      else if (replace && !orCreate) throw new NoSuchTableException(ident)
      else {
        if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
        val t = LakeTable.create(spark, dir, stagedSchema, pcols, props,
          ifNotExists = false)
        // atomic-CREATE contract: a failing AS SELECT must leave NO table
        // behind (the create committed just above, so roll it back by
        // removing the dir — nothing existed before this staged commit)
        try captured.foreach(t.append(_): Unit)
        catch {
          case e: Throwable =>
            TxLog.deleteRecursively(dirOf(ident))
            throw e
        }
      }
    }

    override def abortStagedChanges(): Unit = () // nothing visible was staged
  }

  /** Column defaults flow through Spark's own DEFAULT framework: with this
    * capability declared, CREATE TABLE DDL encodes defaults into the column
    * metadata (CURRENT_DEFAULT/EXISTS_DEFAULT keys) and INSERTs that omit a
    * defaulted column are filled at analysis time by ResolveDefaultColumns
    * — the engine only has to keep the metadata and honor it on the
    * path-based write API (LakeTable.align does). */
  override def capabilities(): JSet[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val t = lake(ident)
    changes.foreach {
      case sp: TableChange.SetProperty => t.setProperties(Map(sp.property -> sp.value)): Unit
      case rp: TableChange.RemoveProperty => t.unsetProperties(Seq(rp.property)): Unit
      case ac: TableChange.AddColumn if ac.fieldNames.length == 1 =>
        // Delta parity: ADD COLUMN with a default is rejected — it would
        // imply a backfill of rows already written without the column
        if (ac.defaultValue() != null)
          throw new UnsupportedOperationException(
            "ADD COLUMN with DEFAULT is not supported (existing rows would need " +
              "a backfill, as in Delta); add the column, then ALTER COLUMN SET DEFAULT")
        t.addColumns(Seq(org.apache.spark.sql.types.StructField(
          ac.fieldNames.head, ac.dataType, ac.isNullable))): Unit
      case ud: TableChange.UpdateColumnDefaultValue if ud.fieldNames.length == 1 =>
        t.setColumnDefault(ud.fieldNames.head,
          Option(ud.newDefaultValue()).filter(_.nonEmpty)): Unit
      case ut: TableChange.UpdateColumnType if ut.fieldNames.length == 1 =>
        // native `ALTER TABLE ... ALTER COLUMN c TYPE <wider>` — type
        // widening (metadata-only; widenColumn enforces the matrix/guards)
        t.widenColumn(ut.fieldNames.head, ut.newDataType): Unit
      case other => throw new UnsupportedOperationException(
        s"ALTER not supported through the catalog: $other (use GraftSql / the table API)")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    if (!TxLog.isTable(d.toString)) return false
    // managed tables: dropping removes data, like Delta's managed drop
    val all = Files.walk(d)
    try all.iterator().asScala.toSeq.reverseIterator.foreach(p => Files.delete(p))
    finally all.close()
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    // Spark hands RENAME TO targets verbatim, catalog prefix included —
    // strip it (a top-level namespace shadowing the catalog name would be
    // unreachable through SQL anyway)
    val dst =
      if (to.namespace.nonEmpty && to.namespace.head == catalogName)
        Identifier.of(to.namespace.drop(1), to.name)
      else to
    if (!tableExists(from)) throw new NoSuchTableException(from)
    if (tableExists(dst)) throw new TableAlreadyExistsException(dst)
    Files.createDirectories(dirOf(dst).getParent)
    Files.move(dirOf(from), dirOf(dst)): Unit
  }

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    Files.list(warehouse).iterator().asScala
      .filter(p => Files.isDirectory(p) && !TxLog.isTable(p.toString))
      .map(p => Array(p.getFileName.toString))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(d) || TxLog.isTable(d.toString))
      throw new NoSuchNamespaceException(namespace)
    Files.list(d).iterator().asScala
      .filter(p => Files.isDirectory(p) && !TxLog.isTable(p.toString))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val d = namespace.foldLeft(warehouse)(_.resolve(_))
    Files.isDirectory(d) && !TxLog.isTable(d.toString)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION ->
      namespace.foldLeft(warehouse)(_.resolve(_)).toString).asJava
  }

  override def createNamespace(
      namespace: Array[String], metadata: JMap[String, String]): Unit =
    Files.createDirectories(namespace.foldLeft(warehouse)(_.resolve(_))): Unit

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!namespaceExists(namespace)) return false
    val hasChildren = { val s = Files.list(d); try s.iterator().hasNext finally s.close() }
    if (hasChildren && !cascade)
      throw new IllegalStateException(s"namespace not empty: ${namespace.mkString(".")}")
    val all = Files.walk(d)
    try all.iterator().asScala.toSeq.reverseIterator.foreach(p => Files.delete(p))
    finally all.close()
    true
  }
}

/** A graft table surfaced through the V2 catalog. Reads and writes bridge
  * to the V1 relation machinery ([[V1Scan]]/[[V1Write]]) — the engine's
  * own scan already does stats/bloom/partition file skipping and DV
  * masking, so the bridge only forwards pruned columns and pushable
  * filters. */
private[sources] case class GraftV2Table(
    lake: LakeTable, fullName: String, asOfVersion: Option[Long])
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with org.apache.spark.sql.graft.V1FallbackTable {

  override def name(): String = fullName

  /** Native `DELETE FROM cat.ns.t WHERE …` (and, via SupportsDelete's
    * TruncatableTable default, `TRUNCATE TABLE cat.ns.t`): Spark hands the
    * conjunctive predicates here and the engine's delete runs with the
    * table's own settings (deletion vectors mask, CDF sidecars, rewrite
    * otherwise). Predicates outside the translatable set report
    * non-deletable, surfacing Spark's standard error rather than a silent
    * wrong delete. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    asOfVersion.isEmpty && filters.forall(f => FilterColumns.toColumnExact(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.map(f => FilterColumns.toColumnExact(f).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE condition not translatable (canDeleteWhere should have refused): $f")))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    lake.delete(cond): Unit
  }

  /** `df.writeStream.toTable("g.ns.t")` support — the reference's primary
    * streaming-write spelling (src/data_processor.py:191-197). The engine's
    * streaming commits need the whole microbatch frame for the
    * (txnAppId, epoch) exactly-once ledger and footer-stats staging, which
    * the DSv2 per-row StreamingWrite contract can't see — so the table
    * declares the V1 fallback Spark provides for exactly this shape (as
    * Delta does): DataStreamWriter re-routes to `format("graft")`'s
    * [[graft.streaming.GraftStreamSink]] at the table's location. */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    val parts = fullName.split('.')
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      parts.last,
      if (parts.length >= 2) Some(parts(parts.length - 2)) else None,
      if (parts.length >= 3) Some(parts.head) else None)
    CatalogTable(
      identifier = ident,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(lake.dir.toUri)),
      schema = schema(),
      provider = Some("graft"),
      partitionColumnNames = lake.snapshot(asOfVersion).metadata.partitionColumns)
  }

  override def schema(): StructType = lake.snapshot(asOfVersion).schema

  override def partitioning(): Array[Transform] =
    lake.snapshot(asOfVersion).metadata.partitionColumns
      .map(Expressions.identity).toArray

  override def properties(): JMap[String, String] = lake.properties.asJava

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(lake, asOfVersion)

  /** Write modes beyond plain append, all mapped onto existing engine
    * commits: TRUNCATE / full INSERT OVERWRITE → [[LakeTable.overwrite]],
    * filter overwrite (static `INSERT OVERWRITE … PARTITION (k=v)`,
    * `writeTo(t).overwrite(cond)`) → replaceWhere. Dynamic partition
    * overwrite is NOT offered here: Spark's V1-write bridge has exec
    * fallbacks only for Append/OverwriteByExpression, so the dynamic mode
    * rides the format-writer option instead —
    * `df.write.format("graft").mode("overwrite")
    *   .option("partitionOverwriteMode", "dynamic")` (Delta's spelling) →
    * [[LakeTable.overwriteDynamic]]. */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate with SupportsOverwrite {
      private sealed trait Mode
      private case object AppendMode extends Mode
      private case object TruncateMode extends Mode
      private case class FilterMode(filters: Array[Filter]) extends Mode
      private var mode: Mode = AppendMode
      override def truncate(): WriteBuilder = { mode = TruncateMode; this }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        mode =
          if (filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]))
            TruncateMode
          else FilterMode(filters)
        this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
              mode match {
                case TruncateMode => lake.overwrite(data): Unit
                case FilterMode(filters) =>
                  val cols = filters.map(f => FilterColumns.toColumn(f).getOrElse(
                    throw new UnsupportedOperationException(
                      s"overwrite condition not translatable to a partition predicate: $f")))
                  lake.overwriteWhere(cols.reduce(_ && _), data): Unit
                case AppendMode =>
                  if (overwriteFlag) lake.overwrite(data): Unit
                  else lake.append(data): Unit
              }
          }
      }
    }
}

/** Filter/column pushdown into the graft scan. All filters are reported as
  * residual (Spark re-applies them row-level, the V1 contract) — pushing
  * them here drives FILE skipping via the tx-log stats. */
private[sources] class GraftScanBuilder(lake: LakeTable, version: Option[Long])
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters; filters
  }
  override def pushedFilters(): Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = new V1Scan {
    private val scanSchema: StructType =
      required.getOrElse(lake.snapshot(version).schema)
    override def readSchema(): StructType = scanSchema
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T =
      new GraftCatalogRelation(context, lake, version, pushed, scanSchema)
        .asInstanceOf[T]
  }
}

private[sources] class GraftCatalogRelation(
    override val sqlContext: SQLContext,
    lake: LakeTable, version: Option[Long],
    filters: Array[Filter], override val schema: StructType)
  extends BaseRelation with TableScan {

  /** Accurate plan-time size (live data bytes from the tx-log) so small
    * catalog tables auto-broadcast — see [[GraftRelation.sizeInBytes]]. */
  override def sizeInBytes: Long = lake.snapshot(version).files.map(_.size).sum

  override def buildScan(): RDD[Row] = {
    val preds = filters.flatMap(FilterColumns.toColumn).toSeq
    val df = lake.read(preds, version)
    val projected =
      if (schema.isEmpty) df.select()
      else df.select(schema.fieldNames.toIndexedSeq.map(col): _*)
    projected.rdd
  }
}

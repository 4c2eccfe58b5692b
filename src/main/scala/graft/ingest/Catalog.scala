package graft.ingest

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import graft.table.LakeTable

/** Lightweight three-level catalog (catalog.schema.table → directory), the
  * stand-in for Unity Catalog namespaces in the reference
  * (`delta_migration.bronze.events` — notebooks/01_bronze_ingestion.py:40-41,
  * schemas created in infrastructure/main.tf:176-215).
  *
  * Names map to `<root>/<catalog>/<schema>/<table>` on disk; each table dir
  * is a graft table. Listing walks directories — cheap because the driver
  * only ever lists table-level dirs, never data files.
  */
class Catalog(val spark: SparkSession, val root: Path) {

  private def parse(name: String): Path = {
    val parts = name.split('.')
    require(parts.length == 3 && parts.forall(_.nonEmpty),
      s"table name must be catalog.schema.table: $name")
    require(parts.forall(p => !p.contains('/') && !p.contains("..")),
      s"illegal characters in table name: $name")
    root.resolve(parts(0)).resolve(parts(1)).resolve(parts(2))
  }

  def createSchema(catalogName: String, schemaName: String): Unit =
    Files.createDirectories(root.resolve(catalogName).resolve(schemaName)): Unit

  /** CREATE TABLE IF NOT EXISTS (W4). */
  def createTable(
      name: String,
      schema: StructType,
      partitionColumns: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty): LakeTable =
    LakeTable.create(spark, parse(name).toString, schema, partitionColumns,
      properties, name = name)

  def table(name: String): LakeTable = {
    val dir = parse(name)
    require(LakeTable.isTable(dir.toString), s"table not found: $name")
    LakeTable.forPath(spark, dir.toString)
  }

  def tableExists(name: String): Boolean = LakeTable.isTable(parse(name).toString)

  /** Drop = remove the table directory (metadata + data). */
  def dropTable(name: String): Boolean = {
    val dir = parse(name)
    if (!LakeTable.isTable(dir.toString)) return false
    val all = Files.walk(dir)
    try all.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally all.close()
    true
  }

  /** Tables under catalog[.schema], as fully-qualified names. */
  def listTables(catalogName: String, schemaName: Option[String] = None): Seq[String] = {
    val cat = root.resolve(catalogName)
    if (!Files.isDirectory(cat)) return Nil
    val schemas = schemaName.map(s => Seq(cat.resolve(s)))
      .getOrElse(listDirs(cat))
    schemas.filter(Files.isDirectory(_)).flatMap { sd =>
      listDirs(sd).filter(t => LakeTable.isTable(t.toString))
        .map(t => s"$catalogName.${sd.getFileName}.${t.getFileName}")
    }.sorted
  }

  private def listDirs(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.filter(Files.isDirectory(_)).toSeq
    finally s.close()
  }
}

object Catalog {
  def apply(spark: SparkSession, root: String): Catalog = {
    val p = Paths.get(root)
    Files.createDirectories(p)
    new Catalog(spark, p)
  }
}

package graft.ingest

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Schema introspection/diff/evolution utilities (SURVEY §1.3; reference:
  * src/delta_utils.py:107-256).
  */
object SchemaUtils {

  /** Result of [[compareSchemas]] (src/delta_utils.py:203-231). */
  case class SchemaDiff(
      added: Seq[StructField],          // in target, not in source
      removed: Seq[StructField],        // in source, not in target
      changed: Seq[(String, DataType, DataType)]) { // name, sourceType, targetType
    def isCompatible: Boolean = removed.isEmpty && changed.isEmpty
    def isIdentical: Boolean = added.isEmpty && removed.isEmpty && changed.isEmpty
  }

  /** Field-level diff of two schemas (case-insensitive names, like Spark). */
  def compareSchemas(source: StructType, target: StructType): SchemaDiff = {
    def byName(s: StructType) = s.fields.map(f => f.name.toLowerCase -> f).toMap
    val src = byName(source); val tgt = byName(target)
    SchemaDiff(
      added = target.fields.filterNot(f => src.contains(f.name.toLowerCase)).toSeq,
      removed = source.fields.filterNot(f => tgt.contains(f.name.toLowerCase)).toSeq,
      changed = source.fields.toSeq.flatMap { f =>
        tgt.get(f.name.toLowerCase)
          .filter(_.dataType != f.dataType)
          .map(t => (f.name, f.dataType, t.dataType))
      })
  }

  /** CREATE TABLE DDL from a schema, incl. nullability and comments
    * (src/delta_utils.py:242-256). */
  def schemaToDdl(tableName: String, schema: StructType,
      partitionColumns: Seq[String] = Nil): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      val comment = if (f.metadata.contains("comment"))
        s" COMMENT '${f.metadata.getString("comment").replace("'", "''")}'" else ""
      s"  ${f.name} ${f.dataType.sql}$nn$comment"
    }.mkString(",\n")
    val part = if (partitionColumns.nonEmpty)
      s"\nPARTITIONED BY (${partitionColumns.mkString(", ")})" else ""
    s"CREATE TABLE $tableName (\n$cols\n)$part"
  }

  /** Schema inference from a sample of JSON strings
    * (src/delta_utils.py:233-240). */
  def schemaFromJsonSample(spark: SparkSession, samples: Seq[String]): StructType = {
    import spark.implicits._
    spark.read.json(samples.toDS: Dataset[String]).schema
  }

  /** Union evolution: existing fields keep position/type, new fields append;
    * a type conflict that cannot up-cast errors (src/delta_utils.py:107-147
    * merge_schema semantics). */
  def mergeSchemas(existing: StructType, incoming: StructType): StructType = {
    val merged = existing.fields.toBuffer
    incoming.fields.foreach { f =>
      merged.indexWhere(_.name.equalsIgnoreCase(f.name)) match {
        case -1 => merged += f
        case i =>
          val e = merged(i)
          if (e.dataType != f.dataType &&
              !org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(f.dataType, e.dataType))
            throw new IllegalArgumentException(
              s"schema merge conflict on ${f.name}: ${e.dataType} vs ${f.dataType}")
      }
    }
    StructType(merged.toSeq)
  }

  /** Columns of `df` not present in `schema` and vice versa — the metadata-
    * level set diff used by migration validation
    * (migration/migrate_from_rdbms.py:308-318). */
  def columnSetDiff(df: DataFrame, other: DataFrame,
      excluded: Set[String] = Set.empty): (Set[String], Set[String]) = {
    val a = df.columns.map(_.toLowerCase).toSet -- excluded.map(_.toLowerCase)
    val b = other.columns.map(_.toLowerCase).toSet -- excluded.map(_.toLowerCase)
    (a -- b, b -- a)
  }
}

package graft.log

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping via Parquet field IDs (the mechanism behind Delta's
  * columnMapping 'id' mode): every column carries a stable numeric id in
  * its field metadata, the writer stamps it into the Parquet footer, and
  * the reader resolves columns BY ID instead of by name
  * (`spark.sql.parquet.fieldId.{write,read}.enabled`). RENAME is then a
  * metadata-only commit (the id is the identity), DROP retires an id
  * without touching files, and a file missing a requested id reads NULL —
  * exactly the add-column-after-the-fact semantics the format wants.
  *
  * Ids are never reused: `graft.columnMapping.maxId` only grows, so a new
  * column can never alias a dropped column's bytes in old files. */
object ColumnIds {
  val FieldIdKey = "parquet.field.id"
  val MaxIdKey = "graft.columnMapping.maxId"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(FieldIdKey)) Some(f.metadata.getLong(FieldIdKey)) else None

  /** A table is mapped iff EVERY column carries an id (all files written
    * through stageWrite then carry ids, making by-id reads safe). */
  def mapped(schema: StructType): Boolean =
    schema.fields.nonEmpty && schema.fields.forall(_.metadata.contains(FieldIdKey))

  def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(FieldIdKey, id).build())

  /** Stamp ids 1..n at table creation. */
  def stampAll(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) => withId(f, i + 1L) })

  /** Highest id ever used (property beats schema so dropped ids stay
    * retired). */
  def maxId(properties: Map[String, String], schema: StructType): Long =
    math.max(
      properties.get(MaxIdKey).map(_.toLong).getOrElse(0L),
      schema.fields.flatMap(idOf).foldLeft(0L)(math.max))

  /** Logical names RETIRED by renames, tracked as "name:fieldId" pairs:
    * per-file stats in the log stay keyed by the OLD logical name forever
    * (AddFile actions are immutable), so a LATER column reusing a retired
    * name under a DIFFERENT id would make those stale stats resolvable
    * again — wrong exact min/max answers and unsound null-count pruning.
    * A name may come back only for its ORIGINAL id (a rename revert),
    * which un-retires it. Shared by graft's own RENAME/ADD COLUMN and the
    * mirror syncs' followed evolution. */
  val RetiredNamesKey = "graft.columnMapping.retiredNames"

  // the ledger serializes as a small JSON object: logical names are
  // ARBITRARY strings (a column-mapped source may legally carry commas,
  // colons, or braces in a name), so a hand-rolled delimiter format
  // corrupts — the pre-r14 ','-joined "name:id" encoding threw on a
  // comma-bearing name and permanently wedged every later rename/drop/
  // ADD COLUMN/sync on the table. Reads accept BOTH encodings (tables
  // committed before r14 carry the legacy form forever).
  private val ledgerMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def retiredNames(properties: Map[String, String]): Map[String, Long] =
    properties.get(RetiredNamesKey).map { s =>
      def legacy: Map[String, Long] = s.split(',').filter(_.nonEmpty).map { e =>
        val i = e.lastIndexOf(':')
        require(i > 0, s"unparseable retired-name ledger entry '$e'")
        e.substring(0, i) -> e.substring(i + 1).toLong
      }.toMap
      if (s.isEmpty) Map.empty[String, Long]
      else if (s.startsWith("{")) {
        // a LEGACY ledger can also start with '{' (a retired name like
        // "{tags}" — legal under column mapping): try JSON first, fall
        // back to the legacy delimiter parse instead of wedging the
        // table. The fallback refuses when any parsed name carries a '"'
        // — a '{'-and-quote-bearing string that is not valid JSON is far
        // more likely a CORRUPT JSON ledger (out-of-band truncation)
        // than a legacy name, and silently keying the distrust ledger by
        // a garbage name would re-enable the stale-stats hazard it
        // exists to prevent.
        scala.util.Try {
          import scala.jdk.CollectionConverters._
          ledgerMapper.readValue(s, classOf[java.util.Map[String, Object]])
            .asScala.map { case (n, v) =>
              n -> v.asInstanceOf[java.lang.Number].longValue()
            }.toMap
        }.getOrElse {
          val m = legacy
          require(m.keysIterator.forall(!_.contains('"')),
            s"retired-name ledger is neither valid JSON nor a plausible " +
              s"legacy encoding: '$s'")
          m
        }
      } else legacy
    }.getOrElse(Map.empty)

  def serializeRetired(retired: Map[String, Long]): String = {
    val node = ledgerMapper.createObjectNode()
    retired.toSeq.sortBy(_._1).foreach { case (n, i) => node.put(n, i): Unit }
    ledgerMapper.writeValueAsString(node)
  }

  /** Assign fresh ids to `added` (only when the base schema is mapped).
    * Returns the stamped fields plus the new max id. */
  def stampNew(properties: Map[String, String], base: StructType,
      added: Seq[StructField]): (Seq[StructField], Long) = {
    if (!mapped(base)) return (added, maxId(properties, base))
    var next = maxId(properties, base)
    val stamped = added.map { f =>
      if (f.metadata.contains(FieldIdKey)) f
      else { next += 1; withId(f, next) }
    }
    (stamped, next)
  }

  /** True iff every staged field appears in the committed schema with the
    * SAME id — the safety condition for committing pre-staged files after
    * a lost schema race (a different id would silently remap bytes). */
  def consistent(staged: StructType, committed: StructType): Boolean =
    staged.fields.forall { f =>
      committed.fields.find(_.name.equalsIgnoreCase(f.name))
        .exists(c => idOf(c) == idOf(f))
    }

  def strip(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(FieldIdKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata).remove(FieldIdKey)
        f.copy(metadata = mb.build())
      }
    })

  def metadataOf(schema: StructType, name: String): Metadata =
    schema.fields.find(_.name.equalsIgnoreCase(name)).map(_.metadata)
      .getOrElse(Metadata.empty)
}

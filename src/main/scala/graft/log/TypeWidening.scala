package graft.log

import org.apache.spark.sql.types._

/** Type widening (Delta's `typeWidening` table feature): a column's type
  * may grow to a strictly-wider one in a METADATA-ONLY commit — bytes
  * never move; readers upcast old files at scan time (Spark 4's parquet
  * reader performs every conversion in the matrix below on both the
  * vectorized and row-based paths). At 100 TB this is the difference
  * between an instant DDL and rewriting the table because ids outgrew
  * INT.
  *
  * The supported matrix is Delta's (PROTOCOL.md, Type Widening):
  *  - integer family upward: byte → short → int → long
  *  - byte/short/int → double; float → double
  *  - date → timestamp_ntz
  *  - byte/short/int → decimal(p,s) with p−s ≥ 10; long → decimal with
  *    p−s ≥ 20; decimal(p,s) → decimal(p',s') with s' ≥ s and
  *    p'−s' ≥ p−s (value range and scale both only grow)
  *
  * Every applied change is recorded in the FIELD's metadata
  * ([[ChangesKey]]: array of {fromType,toType,tableVersion}); the record
  * is what lets the engine stay honest about artifacts built under the
  * old type:
  *  - file-level MIN/MAX stats are exact strings for every integer/
  *    decimal widening, but a float's shortest-decimal encoding parsed as
  *    a double can sit strictly INSIDE the file's true upcast range
  *    (0.1f's stat "0.1" < (double)0.1f), and a date stat does not parse
  *    as a timestamp at all — [[statLossy]] changes disable min/max
  *    pruning for the column (stats resume for files written after a
  *    rewrite, which re-collects under the new type — but a file's write
  *    type is not recorded, so the engine keeps the conservative blanket
  *    rule);
  *  - bloom sidecars hash COLUMN-TYPED values, and xxhash64(1: int) ≠
  *    xxhash64(1L) — ANY recorded change disables bloom pruning for the
  *    column ([[hasChanges]]); sidecars built after the change would be
  *    consistent, but per-file build types are not recorded.
  */
object TypeWidening {

  /** Field-metadata key: JSON array of {fromType, toType, tableVersion}. */
  val ChangesKey = "graft.typeChanges"

  private def intRank(dt: DataType): Int = dt match {
    case _: ByteType => 1
    case _: ShortType => 2
    case _: IntegerType => 3
    case _: LongType => 4
    case _ => -1
  }

  /** Is `from` → `to` in the supported widening matrix? */
  def isWidening(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if intRank(f) > 0 && intRank(t) > 0 => intRank(f) < intRank(t)
    case (_: ByteType | _: ShortType | _: IntegerType, _: DoubleType) => true
    case (_: FloatType, _: DoubleType) => true
    case (_: DateType, _: TimestampNTZType) => true
    case (_: ByteType | _: ShortType | _: IntegerType, d: DecimalType) =>
      d.precision - d.scale >= 10
    case (_: LongType, d: DecimalType) => d.precision - d.scale >= 20
    case (f: DecimalType, t: DecimalType) =>
      t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
    case _ => false
  }

  /** Changes whose OLD stat encodings are not exact bounds under the new
    * type (see object doc): float → double, date → timestamp_ntz. */
  def statLossy(from: DataType, to: DataType): Boolean = (from, to) match {
    case (_: FloatType, _: DoubleType) => true
    case (_: DateType, _: TimestampNTZType) => true
    case _ => false
  }

  /** Field metadata with the change appended to any existing record. */
  def recordChange(f: StructField, to: DataType, tableVersion: Long): Metadata = {
    // DDL spellings (INT/BIGINT/DECIMAL(p,s)/TIMESTAMP_NTZ): typeName's
    // "byte"/"integer" forms do not all round-trip through fromDDL
    val entry = new MetadataBuilder()
      .putString("fromType", f.dataType.sql)
      .putString("toType", to.sql)
      .putLong("tableVersion", tableVersion)
      .build()
    val prior =
      if (f.metadata.contains(ChangesKey)) f.metadata.getMetadataArray(ChangesKey)
      else Array.empty[Metadata]
    new MetadataBuilder().withMetadata(f.metadata)
      .putMetadataArray(ChangesKey, prior :+ entry)
      .build()
  }

  private def changeTypes(f: StructField): Seq[(DataType, DataType)] =
    if (!f.metadata.contains(ChangesKey)) Nil
    else f.metadata.getMetadataArray(ChangesKey).toIndexedSeq.flatMap { m =>
      for {
        from <- scala.util.Try(DataType.fromDDL(m.getString("fromType"))).toOption
        to <- scala.util.Try(DataType.fromDDL(m.getString("toType"))).toOption
      } yield (from, to)
    }

  /** Field-metadata marker (r13): this column REUSES a name that a
    * DIFFERENT column (different field id) carried earlier — older files'
    * stats and bloom sidecars under this name describe that other
    * column's bytes (AddFile stats key by logical name and are
    * immutable), so they must not resolve for this column. Files written
    * after the reuse carry the [[tagKey]] tag — keyed by the NEW field
    * id, which old files can never have — and are trusted; pruning and
    * exact metadata-only answers heal as data rewrites, exactly like the
    * widening tags. Value: the retired field id the name used to mean. */
  val NameReusedKey = "graft.nameReused"

  def nameReused(f: StructField): Boolean = f.metadata.contains(NameReusedKey)

  def markNameReused(f: StructField, retiredId: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(NameReusedKey, retiredId).build())

  /** Any recorded widening on this field (disables bloom pruning). */
  def hasChanges(f: StructField): Boolean = f.metadata.contains(ChangesKey)

  /** The schema with every [[ChangesKey]] entry's `tableVersion` removed —
    * schema comparison MODULO change versions. A mirror that followed a
    * source widening records GRAFT's commit version while the source's
    * own record (Delta's `delta.typeChanges`) carries the DELTA version,
    * so comparing raw schemas misclassifies every later unchanged schema
    * as an evolution (and the Delta sync then skips its heal tags on
    * ranges that carry any metaData line at all). The from/to types and
    * the change ORDER — everything stat/bloom honesty depends on — are
    * preserved; only the version stamp (provenance, never consulted by
    * [[statsExact]]/[[bloomValid]]) is ignored. */
  def ignoringChangeVersions(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(ChangesKey)) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putMetadataArray(ChangesKey,
          f.metadata.getMetadataArray(ChangesKey).map { e =>
            val mb = new MetadataBuilder()
            if (e.contains("fromType"))
              mb.putString("fromType", e.getString("fromType")): Unit
            if (e.contains("toType"))
              mb.putString("toType", e.getString("toType")): Unit
            mb.build()
          })
        .build())
    })

  /** Any recorded STAT-LOSSY widening (disables min/max pruning). */
  def hasLossyChange(f: StructField): Boolean =
    changeTypes(f).exists { case (from, to) => statLossy(from, to) }

  /** How many widenings this field has accumulated. */
  def changeCount(f: StructField): Int =
    if (!f.metadata.contains(ChangesKey)) 0
    else f.metadata.getMetadataArray(ChangesKey).length

  /** Per-file tag key recording how many of the column's widenings the
    * writer had seen — keyed by the column-mapping field id (stable across
    * renames), name as the unmapped fallback. */
  def tagKey(f: StructField): String =
    "tc:" + ColumnIds.idOf(f).map(_.toString).getOrElse(f.name)

  /** Were this file's stats for `f` collected under the column's CURRENT
    * type? True when the writer saw every recorded change (count match) or
    * no change is stat-lossy. The count comparison is sound under RESTORE
    * and CLONE because both move the schema's change history and the file
    * set together, wholesale; files without the tag (or with a stale
    * count) simply keep conservative no-pruning behavior. This is how
    * pruning HEALS after a float→double widen: every post-widen write and
    * every OPTIMIZE rewrite re-collects stats under the new type and tags
    * the files accordingly. */
  def statsExact(file: AddFile, f: StructField): Boolean =
    !(hasLossyChange(f) || nameReused(f)) ||
      file.tag(tagKey(f)).contains(changeCount(f).toString)

  /** Was this file's bloom sidecar for `f` built hashing the CURRENT
    * type? Any unseen widening changes the hash domain (xxhash64(1: int)
    * ≠ xxhash64(1L)), so here even exact-stat widenings count — and a
    * REUSED name's old sidecars hashed a different column's values. */
  def bloomValid(file: AddFile, f: StructField): Boolean =
    !(hasChanges(f) || nameReused(f)) ||
      file.tag(tagKey(f)).contains(changeCount(f).toString)
}

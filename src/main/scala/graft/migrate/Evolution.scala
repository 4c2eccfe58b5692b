package graft.migrate

import org.apache.spark.sql.types.StructType

import graft.log.ColumnIds

/** Source schema evolution a MIRROR can follow mid-cadence — shared by the
  * Delta and Iceberg syncs (r13).
  *
  * By-id tables (column-mapped Delta, id-carrying Iceberg) follow renames
  * of non-partition columns and ADDED nullable columns: field ids are
  * never reused, so the translation is unambiguous. Name-bound tables
  * follow ADDED nullable columns only — a rename there is
  * indistinguishable from a drop+add (the old name simply disappears),
  * which refuses. Everything else stays a cut-over refusal: drops and
  * type changes would break downstream graft consumers mid-cadence, and a
  * REQUIRED add cannot be satisfied by existing files. */
private[migrate] object Evolution {

  /** Refuse (IllegalArgumentException) unless `old -> incoming` is a
    * followable evolution under the binding mode. */
  def requireFollowable(old: StructType, incoming: StructType,
      mapped: Boolean, sourceKind: String): Unit = {
    def refuse(why: String): Nothing = throw new IllegalArgumentException(
      s"the $sourceKind source's schema changed ($why) — this evolution " +
        "is a cut-over moment, not a silent sync step; re-import")
    if (mapped) {
      val oldById = old.fields.map(f => ColumnIds.idOf(f).get -> f).toMap
      val newById = incoming.fields.map(f => ColumnIds.idOf(f).get -> f).toMap
      val dropped = (oldById.keySet -- newById.keySet).toSeq.sorted
      if (dropped.nonEmpty)
        refuse(s"dropped column(s) ${dropped.map(oldById(_).name).mkString(", ")}")
      oldById.foreach { case (id, of) =>
        val nf = newById(id)
        // a WIDENING is followable — it is exactly graft's own
        // metadata-only ALTER COLUMN TYPE (readers upcast old files; the
        // recorded change keeps stats/bloom pruning honest); anything
        // outside the widening matrix refuses
        if (nf.dataType != of.dataType &&
            !graft.log.TypeWidening.isWidening(of.dataType, nf.dataType))
          refuse(s"column '${of.name}' changed type ${of.dataType} -> ${nf.dataType}")
      }
      (newById.keySet -- oldById.keySet).toSeq.sorted.foreach { id =>
        if (!newById(id).nullable)
          refuse(s"added column '${newById(id).name}' is REQUIRED — " +
            "existing files cannot satisfy it")
      }
    } else {
      // name-bound: ADDs and widenings only — every old column must
      // survive by name (a renamed column would present as a drop)
      val newByName = incoming.fields.map(f => f.name -> f).toMap
      old.fields.foreach { of =>
        newByName.get(of.name) match {
          case None => refuse(s"column '${of.name}' disappeared — renames " +
            "are not followable without field ids")
          case Some(nf) if nf.dataType != of.dataType &&
              !graft.log.TypeWidening.isWidening(of.dataType, nf.dataType) =>
            refuse(s"column '${of.name}' changed type ${of.dataType} -> ${nf.dataType}")
          case _ => ()
        }
      }
      val oldNames = old.fieldNames.toSet
      incoming.fields.filterNot(f => oldNames.contains(f.name)).foreach { nf =>
        if (!nf.nullable)
          refuse(s"added column '${nf.name}' is REQUIRED — existing files " +
            "cannot satisfy it")
      }
    }
  }

  /** Apply a followable evolution onto the CURRENT schema (which may carry
    * local field metadata a file-set-neutral commit stamped — a column
    * DEFAULT — that must survive): by id when mapped (renames change
    * names, nullability may only WIDEN, adds append in source order), by
    * name otherwise. Type WIDENINGS apply as graft's own ALTER COLUMN
    * TYPE would — the change records in the field metadata for stat/bloom
    * honesty, and `graft.enableTypeWidening` rides the property update so
    * the typeWidening feature stamps in the same commit. Refuses a rename
    * of any column referenced by a local constraint/generated rule
    * (identifier-boundary match); a column REUSING a renamed-away name
    * under a different id gets the name-reuse distrust marker (per-file
    * stats stay keyed by the old logical name — see
    * [[ColumnIds.RetiredNamesKey]]), like graft's own DROP + re-ADD.
    *
    * Returns the merged schema plus the property updates (retired-name
    * ledger, widening enablement; empty when nothing changes). */
  def mergedSchema(current: StructType, incoming: StructType,
      mapped: Boolean, properties: Map[String, String],
      tableVersion: Long)
      : (StructType, Map[String, String]) = {
    // apply a type widening onto the merged field (which still carries
    // the OLD type from `of`): take the wider type and RECORD the change
    def widen(of: org.apache.spark.sql.types.StructField,
        nf: org.apache.spark.sql.types.StructField,
        merged: org.apache.spark.sql.types.StructField) =
      if (of.dataType == nf.dataType) merged
      else merged.copy(dataType = nf.dataType,
        metadata = graft.log.TypeWidening.recordChange(
          merged, nf.dataType, tableVersion))
    if (!mapped) {
      val curByName = current.fields.map(f => f.name -> f).toMap
      val widened = incoming.fields.exists(nf =>
        curByName.get(nf.name).exists(_.dataType != nf.dataType))
      val out = StructType(incoming.fields.map { nf =>
        curByName.get(nf.name) match {
          case Some(of) =>
            widen(of, nf, of.copy(nullable = of.nullable || nf.nullable))
          case None => nf
        }
      })
      (out, if (widened) Map("graft.enableTypeWidening" -> "true")
        else Map.empty)
    } else {
      val sById = current.fields.map(f => ColumnIds.idOf(f).get -> f).toMap
      val renamedPairs: Seq[(String, Long)] = incoming.fields.flatMap { nf =>
        sById.get(ColumnIds.idOf(nf).get).filter(_.name != nf.name)
          .map(of => of.name -> ColumnIds.idOf(nf).get)
      }
      renamedPairs.map(_._1).foreach { oldName =>
        val ref = ("(?i)(?<![A-Za-z0-9_])" +
          java.util.regex.Pattern.quote(oldName) + "(?![A-Za-z0-9_])").r
        val refs = properties.filter { case (k, v) =>
          (k.startsWith("graft.constraints.") ||
            k.startsWith("graft.generated.")) && ref.findFirstIn(v).isDefined
        }
        require(refs.isEmpty,
          s"the source renamed column '$oldName', which is referenced by " +
            s"${refs.keys.mkString(", ")} — drop the rule first or re-import")
      }
      // a retired name returning under a DIFFERENT field id gets the
      // name-reuse marker: the log's per-file stats still carry the old
      // key, and the old column's stats resolving for the new one would
      // answer exact queries WRONG — the marker makes stats/bloom
      // pruning distrust pre-reuse files, healing as data rewrites
      // (graft's own DROP + re-ADD path does exactly the same)
      val retired = ColumnIds.retiredNames(properties)
      val nowUsed = incoming.fields
        .map(f => f.name -> ColumnIds.idOf(f).get).toMap
      // the ledger state INCLUDING names retired by THIS very evolution:
      // the reuse marker below must consult it, not the pre-evolution
      // `retired` alone — a single source commit that renames a column
      // away AND reuses that name (a rename-swap, or a rename plus a
      // same-name add in one metaData) would otherwise yield an UNMARKED
      // column, and old files' stats keyed by the reused logical name
      // would resolve for the new column (wrong exact min/max answers,
      // unsound pruning — the exact bug class this ledger exists to stop)
      val ledger = retired ++ renamedPairs
      val newRetired = ledger
        .filter { case (n, i) => !nowUsed.get(n).contains(i) }
      val retireProp: Map[String, String] =
        if (newRetired == retired) Map.empty
        else Map(ColumnIds.RetiredNamesKey ->
          ColumnIds.serializeRetired(newRetired))
      val widened = incoming.fields.exists(nf =>
        sById.get(ColumnIds.idOf(nf).get).exists(_.dataType != nf.dataType))
      val out = StructType(incoming.fields.map { nf =>
        val merged = sById.get(ColumnIds.idOf(nf).get) match {
          case Some(of) =>
            widen(of, nf,
              of.copy(name = nf.name, nullable = of.nullable || nf.nullable))
          case None => nf
        }
        ledger.get(merged.name) match {
          case Some(origId) if origId != ColumnIds.idOf(nf).get =>
            graft.log.TypeWidening.markNameReused(merged, origId)
          case _ => merged
        }
      })
      (out, retireProp ++
        (if (widened) Map("graft.enableTypeWidening" -> "true") else Map.empty))
    }
  }
}

package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

import graft.log._

/** Row-level DML over the graft table format: UPDATE, DELETE, MERGE.
  *
  * All three follow Delta's two-phase shape (SURVEY §3.2): (1) find the files
  * that actually contain affected rows (stats-pruned scan + inner probe),
  * (2) rewrite ONLY those files, commit remove+add atomically. Untouched
  * files — at 100 TB, the overwhelming majority — are never read or written.
  */
trait DmlSupport { self: LakeTable =>

  private def cdfEnabled: Boolean =
    properties.get("graft.enableChangeDataFeed").contains("true")

  private def dvEnabled: Boolean =
    properties.get("graft.enableDeletionVectors").contains("true")

  /** UPDATE t SET ... WHERE cond (M4, notebooks/04_acid_operations.py:129-139).
    * With deletion vectors enabled, matched rows are masked and ONLY their
    * updated versions are appended — a 0.1% update writes 0.1% of the data,
    * not every touched file. */
  def update(cond: Column, rawSet: Map[String, Column]): Long = {
    val snap = snapshot()
    val unknown = rawSet.keys.filterNot(k => snap.schema.fieldNames.exists(_.equalsIgnoreCase(k)))
    require(unknown.isEmpty, s"SET references unknown columns: ${unknown.mkString(",")}")
    val idents = identityColumns.map(_._1.toLowerCase).toSet
    require(!rawSet.keys.exists(k => idents.contains(k.toLowerCase)),
      "columns GENERATED ALWAYS AS IDENTITY cannot be updated")
    // Delta parity: a generated column whose rule reads an updated base
    // column, and which the statement does not SET explicitly, is
    // RECOMPUTED (leaving it stale would fail the write-time identity
    // check; explicit SETs stay caller-owned and validated as before).
    val set = recomputeGenerated(rawSet)
    if (dvEnabled) return updateWithDv(snap, cond, set)
    val touched = filesContaining(snap, cond)
    if (touched.isEmpty) return snap.version
    val touchedDf = readFilesMasked(snap, touched, snap.schema)
    val matchPred = coalesce(cond, lit(false))
    // numUpdatedRows rides the rewrite job itself (CollectMetrics ahead of
    // the projection) — no dedicated counting pass over the touched files.
    // On a foreachBatch thread the observation can never complete (see
    // LakeTable.onStreamExecutionThread); recount narrowly there instead.
    val observable = !LakeTable.onStreamExecutionThread
    val obs = org.apache.spark.sql.Observation()
    // row tracking: the rewrite reads resolved ids and writes them back as
    // materialized columns — unmodified rows keep id AND commit version,
    // updated rows keep id with a bumped version (null materialized value
    // falls back to the new file's defaultRowCommitVersion = this commit)
    val rt = rowsTracked(snap, touched)
    val rewriteSrc =
      if (rt) posWithRowIds(snap, touched).drop("__file", "__idx") else touchedDf
    val observed = if (!observable) rewriteSrc else rewriteSrc.observe(obs,
      sum(when(matchPred, 1L).otherwise(0L)).as("updated"))
    val rtExtra: Seq[Column] = if (!rt) Nil else Seq(
      col(RowTracking.MatRowId),
      when(matchPred, lit(null).cast(org.apache.spark.sql.types.LongType))
        .otherwise(col(RowTracking.MatRcv)).as(RowTracking.MatRcv))
    val rewritten = observed.select(snap.schema.fieldNames.toIndexedSeq.map { c =>
      val newVal = set.collectFirst { case (k, v) if k.equalsIgnoreCase(c) => v }
      newVal match {
        case Some(v) => when(matchPred, v.cast(snap.schema(c).dataType))
          .otherwise(col(c)).as(c, snap.schema(c).metadata)
        case None => col(c)
      }
    } ++ rtExtra: _*)
    val setExprs = snap.schema.fieldNames.toIndexedSeq.map { c =>
      set.collectFirst { case (k, v) if k.equalsIgnoreCase(c) =>
        v.cast(snap.schema(c).dataType).as(c, snap.schema(c).metadata) }
        .getOrElse(col(c).as(c, snap.schema(c).metadata))
    }
    val sidecars = if (cdfEnabled) {
      // row tracking: the sidecar records each image's resolved id — the
      // post image carries the SAME id (an update never moves a row's id)
      val idCol: Seq[Column] =
        if (rt) Seq(col(RowTracking.MatRowId).as(Cdf.RowIdCol)) else Nil
      val hit = rewriteSrc.filter(matchPred)
      val pre = hit.select(snap.schema.fieldNames.toIndexedSeq.map(col) ++ idCol: _*)
        .withColumn("_change_type", lit("update_preimage"))
      val post = hit.select(setExprs ++ idCol: _*)
        .withColumn("_change_type", lit("update_postimage"))
      writeCdfSidecar(pre.unionByName(post))
    } else Nil
    val adds = stageWrite(rewritten, snap.metadata.partitionColumns)
    val numUpdated =
      if (observable) obs.get.get("updated") match {
        case Some(l: java.lang.Long) => l.longValue()
        case _ => 0L
      }
      else touchedDf.filter(matchPred).count()
    commitRewrite(snap, "UPDATE", Map("predicate" -> cond.toString), touched, adds,
      sidecars, Map("numUpdatedRows" -> numUpdated))
  }

  /** Generated-column recompute shared by UPDATE and MERGE's update/insert
    * clauses (Delta parity). A generated column the assignment map does not
    * SET explicitly, whose rule reads a column the map DOES assign, gets its
    * rule re-evaluated with the assignments substituted in — the recompute
    * sees post-update base values while still evaluating over the original
    * row (one projection, no second pass). Rows that predate the rule (NULL
    * generated value) CONVERGE to it when their base is updated — the NULL
    * exemption covers rows the DML never touches, not rows being rewritten
    * while the rule is live.
    *
    * `qualifier`: how the rule's remaining (un-assigned) base references
    * resolve — None reads the bare pre-image row (UPDATE), Some("target")
    * qualifies them against MERGE's joined target/source frame (a bare name
    * would be ambiguous when the source carries the same column).
    * `insertMode`: INSERT clauses have no pre-image — every generated column
    * missing from the VALUES map is computed, and rule references the map
    * does not assign resolve via `defaultFor`: the column's declared
    * CURRENT_DEFAULT when one exists (the value `insertMissing` writes into
    * the row — computing the rule over NULL there would stamp a generated
    * value inconsistent with the row actually written), else NULL. */
  private[table] def recomputeGenerated(
      rawSet: Map[String, Column],
      qualifier: Option[String] = None,
      insertMode: Boolean = false,
      defaultFor: String => Option[Column] = _ => None): Map[String, Column] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    val setKeys = rawSet.keys.map(_.toLowerCase).toSet
    rawSet ++ generatedColumns.flatMap { case (g, rule) =>
      val ruleExpr = Pruner.exprOf(org.apache.spark.sql.functions.expr(rule))
      val touchesBase =
        insertMode || refNames(ruleExpr).exists(r => setKeys.contains(r.toLowerCase))
      if (setKeys.contains(g.toLowerCase) || !touchesBase) None
      else {
        // transformUp: a replacement that itself references the base column
        // (SET n = n + 5) must not be re-entered by the rule
        val substituted = ruleExpr.transformUp {
          case u: UnresolvedAttribute if u.nameParts.length == 1 =>
            rawSet.collectFirst {
              case (k, v) if k.equalsIgnoreCase(u.name) => Pruner.exprOf(v)
            }.getOrElse {
              if (insertMode)
                Pruner.exprOf(defaultFor(u.name).getOrElse(lit(null)))
              else qualifier.fold(u: Expression)(q =>
                UnresolvedAttribute(Seq(q, u.name)))
            }
        }
        Some(g -> org.apache.spark.sql.graft.ColumnExpr.toColumn(substituted))
      }
    }
  }

  /** DELETE FROM t WHERE cond (M5, notebooks/04_acid_operations.py:171-175).
    * Rows where the predicate is NULL are kept (SQL semantics). With
    * deletion vectors enabled, matching rows are masked instead of
    * rewriting the touched files — at 100 TB a 0.1% delete writes a few KB
    * of row indexes instead of re-encoding every touched file. */
  def delete(cond: Column): Long = {
    val snap = snapshot()
    if (dvEnabled) return deleteWithDv(snap, cond)
    val touched = filesContaining(snap, cond)
    if (touched.isEmpty) return snap.version
    val touchedDf = readFilesMasked(snap, touched, snap.schema)
    val matchPred = coalesce(cond, lit(false))
    // row tracking: survivors pass their resolved id AND commit version
    // straight through as materialized columns — a delete never changes
    // the rows it keeps
    val rt = rowsTracked(snap, touched)
    val rewriteSrc =
      if (rt) posWithRowIds(snap, touched).drop("__file", "__idx")
      else touchedDf
    val rewritten = rewriteSrc.filter(!matchPred)
    val sidecars = if (cdfEnabled) {
      val idCol: Seq[Column] =
        if (rt) Seq(col(RowTracking.MatRowId).as(Cdf.RowIdCol)) else Nil
      writeCdfSidecar(rewriteSrc.filter(matchPred)
        .select(snap.schema.fieldNames.toIndexedSeq.map(col) ++ idCol: _*)
        .withColumn("_change_type", lit("delete")))
    } else Nil
    val adds = stageWrite(rewritten, snap.metadata.partitionColumns)
    // deleted-row count falls out of the file metadata — no extra job
    // (touched files' live counts = base counts minus their DV masks)
    val liveTouched = touched.map(f =>
      f.numRecords - snap.dvs.get(f.path).map(_.numDeleted).getOrElse(0L)).sum
    val numDeleted = liveTouched - adds.map(_.numRecords).sum
    commitRewrite(snap, "DELETE", Map("predicate" -> cond.toString), touched, adds,
      sidecars, Map("numDeletedRows" -> numDeleted))
  }

  /** Deletion-vector DELETE: no data files are read-modified-written; the
    * commit adds one DV parquet (this delete's masked positions unioned
    * with the touched files' existing vectors) plus per-file
    * DeletionVector actions. */
  private def deleteWithDv(snap: Snapshot, cond: Column): Long = {
    val touched = filesContaining(snap, cond)
    if (touched.isEmpty) return snap.version
    val matchPred = coalesce(cond, lit(false))
    // row tracking: resolve ids alongside the positions so the CDF
    // sidecar records which rows the mask deleted
    val rt = rowsTracked(snap, touched)
    val matched = (if (rt) posWithRowIds(snap, touched)
      else readFilesMaskedPos(snap, touched, snap.schema)).filter(matchPred)
    val sidecars = if (cdfEnabled) {
      val idCol: Seq[Column] =
        if (rt) Seq(col(RowTracking.MatRowId).as(Cdf.RowIdCol)) else Nil
      writeCdfSidecar(matched
        .select(snap.schema.fieldNames.toIndexedSeq.map(col) ++ idCol: _*)
        .withColumn("_change_type", lit("delete")))
    } else Nil
    maskAndCommit(snap, "DELETE", Map("predicate" -> cond.toString),
      touched, matched, Nil, sidecars,
      newlyMasked => Map("numDeletedRows" -> newlyMasked))
  }

  /** Deletion-vector UPDATE: matched rows are masked and only their updated
    * versions are appended as new files. */
  private def updateWithDv(snap: Snapshot, cond: Column, set: Map[String, Column]): Long = {
    val touched = filesContaining(snap, cond)
    if (touched.isEmpty) return snap.version
    val matchPred = coalesce(cond, lit(false))
    // row tracking: the masked originals' resolved ids ride into the
    // appended post-image file as a materialized column, so an updated row
    // KEEPS its id across the mask+append; the commit version is left to
    // the new file's default (= this commit), which is the bump Delta makes
    val rt = rowsTracked(snap, touched)
    val matched =
      (if (rt) posWithRowIds(snap, touched)
      else readFilesMaskedPos(snap, touched, snap.schema)).filter(matchPred)
    val setExprs = snap.schema.fieldNames.toIndexedSeq.map { c =>
      set.collectFirst { case (k, v) if k.equalsIgnoreCase(c) =>
        v.cast(snap.schema(c).dataType).as(c, snap.schema(c).metadata) }
        .getOrElse(col(c).as(c, snap.schema(c).metadata))
    }
    val sidecars = if (cdfEnabled) {
      // both images carry the row's resolved id (updates keep ids)
      val idCol: Seq[Column] =
        if (rt) Seq(col(RowTracking.MatRowId).as(Cdf.RowIdCol)) else Nil
      val base = matched.drop("__file", "__idx")
      val pre = base.select(snap.schema.fieldNames.toIndexedSeq.map(col) ++ idCol: _*)
        .withColumn("_change_type", lit("update_preimage"))
      val post = base.select(setExprs ++ idCol: _*)
        .withColumn("_change_type", lit("update_postimage"))
      writeCdfSidecar(pre.unionByName(post))
    } else Nil
    val rtExtra: Seq[Column] = if (rt) Seq(col(RowTracking.MatRowId)) else Nil
    val adds = stageWrite(
      matched.drop("__file", "__idx").select(setExprs ++ rtExtra: _*),
      snap.metadata.partitionColumns)
    maskAndCommit(snap, "UPDATE", Map("predicate" -> cond.toString),
      touched, matched, adds, sidecars,
      newlyMasked => Map("numUpdatedRows" -> adds.map(_.numRecords).sum))
  }

  /** Shared deletion-vector commit: aggregate this change's masked positions
    * into per-file roaring bitmaps, OR in the touched files' current
    * vectors, write one bitmap row per file, derive per-file actions, and
    * commit with the DV conflict checks. `matched` must carry __file/__idx.
    *
    * Cost is O(new masks) + O(touched files' bitmap bytes) — independent of
    * how many masks have accumulated table-wide, unlike a row-per-position
    * union rewrite. The groupBy runs under ObjectHashAggregate with partial
    * aggregation, so only per-(file × map task) partial bitmaps shuffle. */
  private[table] def maskAndCommit(
      snap: Snapshot, op: String, params: Map[String, String],
      touched: Seq[AddFile], matched: DataFrame, adds: Seq[AddFile],
      sidecars: Seq[Action], metrics: Long => Map[String, Long]): Long = {
    // group on the raw reader path; strip to the canonical path AFTER the
    // aggregate (one strip per file, not per row)
    val newBm = matched.select(col("__file"), col("__idx"))
      .groupBy("__file").agg(DvBitmap.aggPositions(col("__idx")).as("__bitmap"))
      .select(DvBitmap.stripPathCol(col("__file")).as("__path"), col("__bitmap"))
    val oldDvs = touched.flatMap(f => snap.dvs.get(f.path))
    val merged =
      if (oldDvs.isEmpty) newBm
      else newBm.unionByName(dvBitmapDf(oldDvs))
        .groupBy("__path").agg(DvBitmap.aggOr(col("__bitmap")).as("__bitmap"))
    val commitId = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val dvRel = s"dv/$commitId"
    merged.withColumn("__n", DvBitmap.cardinality(col("__bitmap")))
      .write.mode("errorifexists").parquet(dir.resolve(dvRel).toString)
    // per-file mask sizes from the written vector (tiny read: 1 row/file)
    val counts = spark.read.parquet(dir.resolve(dvRel).toString)
      .select("__path", "__n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val newActions = touched.flatMap { f =>
      counts.get(absPath(f)).map(n => DeletionVector(f.path, dvRel, n))
    }
    // nothing masked AND nothing appended -> the table state is unchanged
    if (newActions.isEmpty && adds.isEmpty) return snap.version
    val prevMasked = newActions.flatMap(a => snap.dvs.get(a.forFile)).map(_.numDeleted).sum
    val newlyMasked = newActions.map(_.numDeleted).sum - prevMasked
    val newKeys = newActions.map(_.forFile).toSet
    val committed = commitWithRetry(op, params + ("deletionVectors" -> "true"), snap,
      metrics(newlyMasked)) { s =>
      // idempotent replay guard, as in commitRewrite
      params.get("txnAppId").foreach { app =>
        if (lastTxnVersion(s, app).exists(_ >= params("txnVersion").toLong))
          throw new LakeTable.EpochAlreadyCommitted
      }
      if (s.version != snap.version) {
        if (s.metadata.schemaJson != snap.metadata.schemaJson)
          throw new java.util.ConcurrentModificationException(
            s"$op conflicts with a concurrent metadata change")
        val live = s.files.map(_.path).toSet
        if (!newKeys.subsetOf(live))
          throw new java.util.ConcurrentModificationException(
            s"$op conflicts with a concurrent commit that rewrote the touched files")
        // the new vectors were computed on top of snap's vectors
        newKeys.foreach { p =>
          if (s.dvs.get(p) != snap.dvs.get(p))
            throw new java.util.ConcurrentModificationException(
              s"$op conflicts with a concurrent deletion-vector change")
        }
      }
      val now = clockMillis()
      val future = ((s.dvs -- newKeys).values.map(_.dvPath) ++ Seq(dvRel)).toSet
      newActions ++ adds ++ sidecars ++ dvTombstones(s, newKeys, future, now)
    }
    maybeAutoPurge()
    committed
  }

  /** Opt-in DV compaction valve (`graft.autoOptimize.purgeDvFraction`):
    * after a DV commit, rewrite files whose masked fraction reached the
    * configured threshold. Best-effort, like auto-compaction — a lost
    * commit race never fails the DML that triggered it. */
  private def maybeAutoPurge(): Unit =
    properties.get("graft.autoOptimize.purgeDvFraction")
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .foreach(th => scala.util.Try(reorgPurge(th)): Unit)

  /** MERGE INTO builder (M1-M3, src/data_processor.py:233-280). The condition
    * references the two sides as `target.<col>` / `source.<col>`. */
  def merge(source: DataFrame, condition: Column): MergeBuilder =
    new MergeBuilder(this, source, condition)

  /** Files whose rows might — then verifiably do — match `cond`. At <=2
    * candidates the verification probe costs more than rewriting a file the
    * probe might have excluded, so stats-pruned candidates are taken as-is. */
  private[table] def filesContaining(snap: Snapshot, cond: Column): Seq[AddFile] = {
    val candidates = Pruner.prune(partitionPrune(snap, snap.files, Seq(cond)),
      Seq(cond), snap.schema, bloomIndex)
    if (candidates.size <= 2) return candidates
    val withFile = readFilesWithFile(snap, candidates, snap.schema)
    val hit = withFile.filter(coalesce(cond, lit(false)))
      .select("__file").distinct().collect().map(r => Stats.stripScheme(r.getString(0))).toSet
    candidates.filter(f => hit.contains(absPath(f)))
  }

  /** Commit a rewrite: remove `touched`, add `adds`; verifies on a lost race
    * that no concurrent commit rewrote the same files. */
  private[table] def commitRewrite(
      snap: Snapshot,
      op: String,
      params: Map[String, String],
      touched: Seq[AddFile],
      adds: Seq[AddFile],
      extra: Seq[Action],
      metrics: Map[String, Long]): Long = {
    val touchedPaths = touched.map(_.path).toSet
    commitWithRetry(op, params, snap, metrics) { s =>
      // idempotent replay (streaming foreachBatch merge): the same
      // (txnAppId, txnVersion) already committed -> no-op; checked against
      // the FRESH snapshot inside the retry loop, like appendStream
      params.get("txnAppId").foreach { app =>
        if (lastTxnVersion(s, app).exists(_ >= params("txnVersion").toLong))
          throw new LakeTable.EpochAlreadyCommitted
      }
      if (s.version != snap.version) {
        // rewritten files were derived under snap's schema/partitioning; a
        // concurrent metadata change would make them silently inconsistent
        if (s.metadata.schemaJson != snap.metadata.schemaJson ||
            s.metadata.partitionColumns != snap.metadata.partitionColumns)
          throw new java.util.ConcurrentModificationException(
            s"$op conflicts with a concurrent metadata change")
        val live = s.files.map(_.path).toSet
        if (!touchedPaths.subsetOf(live))
          throw new java.util.ConcurrentModificationException(
            s"$op conflicts with a concurrent commit that rewrote ${touchedPaths.diff(live).size} file(s)")
        // the rewrite was computed under snap's deletion-vector masks
        touchedPaths.foreach { p =>
          if (s.dvs.get(p) != snap.dvs.get(p))
            throw new java.util.ConcurrentModificationException(
              s"$op conflicts with a concurrent deletion-vector change")
        }
      }
      val now = clockMillis()
      touched.map(f => RemoveFile(f.path, now)) ++ adds ++ extra ++
        dvTombstones(s, touchedPaths, (s.dvs -- touchedPaths).values.map(_.dvPath).toSet, now)
    }
  }
}

/** Fluent MERGE spec, mirroring Delta's builder
  * (whenMatchedUpdate/whenMatchedDelete/whenNotMatchedInsert; clause order is
  * evaluation order, first matching clause wins). */
class MergeBuilder private[table] (
    table: LakeTable,
    source: DataFrame,
    condition: Column) {

  private sealed trait Clause { def cond: Option[Column] }
  private case class MatchedUpdate(cond: Option[Column], set: Map[String, Column]) extends Clause
  private case class MatchedUpdateAll(cond: Option[Column]) extends Clause
  private case class MatchedDelete(cond: Option[Column]) extends Clause
  private case class NotMatchedInsert(cond: Option[Column], values: Map[String, Column]) extends Clause
  private case class NotMatchedInsertAll(cond: Option[Column]) extends Clause
  private case class NotMatchedBySourceUpdate(cond: Option[Column], set: Map[String, Column]) extends Clause
  private case class NotMatchedBySourceDelete(cond: Option[Column]) extends Clause

  private var rawMatchedClauses = Vector.empty[Clause]
  private var rawNotMatchedClauses = Vector.empty[Clause]
  private var notMatchedBySourceClauses = Vector.empty[Clause]
  private var schemaEvolution = false
  private var txn: Option[(String, Long)] = None

  private def sourceCols: Seq[String] = source.columns.toSeq

  def whenMatchedUpdate(set: Map[String, Column], condition: Option[Column] = None): MergeBuilder = {
    rawMatchedClauses :+= MatchedUpdate(condition, set); this
  }

  def whenMatchedUpdateAll(condition: Option[Column] = None): MergeBuilder = {
    rawMatchedClauses :+= MatchedUpdateAll(condition); this
  }

  def whenMatchedDelete(condition: Option[Column] = None): MergeBuilder = {
    rawMatchedClauses :+= MatchedDelete(condition); this
  }

  def whenNotMatchedInsert(values: Map[String, Column], condition: Option[Column] = None): MergeBuilder = {
    rawNotMatchedClauses :+= NotMatchedInsert(condition, values); this
  }

  def whenNotMatchedInsertAll(condition: Option[Column] = None): MergeBuilder = {
    rawNotMatchedClauses :+= NotMatchedInsertAll(condition); this
  }

  /** Idempotent merge under replay (the streaming foreachBatch upsert
    * pattern): the commit records (txnAppId, txnVersion) exactly like
    * [[LakeTable.appendStream]], and a merge whose version is <= the last
    * recorded one for the same app id is a no-op — re-checked against the
    * fresh snapshot inside the commit-retry loop, so a lost CAS race with a
    * replayed twin cannot double-apply the batch. */
  def withTxn(appId: String, version: Long): MergeBuilder = {
    txn = Some((appId, version)); this
  }

  private def txnParams: Map[String, String] =
    txn.map { case (a, v) => Map("txnAppId" -> a, "txnVersion" -> v.toString) }
      .getOrElse(Map.empty)

  /** Delta's schema auto-merge: source columns missing from the target are
    * added (nullable) in the merge commit, and the *All clauses pick them
    * up. Rows from files written before the evolution read them as NULL. */
  def withSchemaEvolution(): MergeBuilder = { schemaEvolution = true; this }

  /** Update target rows that have NO source match (Delta's WHEN NOT MATCHED
    * BY SOURCE). `set` expressions may reference target columns only —
    * there is no source row on this branch. */
  def whenNotMatchedBySourceUpdate(set: Map[String, Column], condition: Option[Column] = None): MergeBuilder = {
    notMatchedBySourceClauses :+= NotMatchedBySourceUpdate(condition, set); this
  }

  /** Delete target rows that have NO source match (the "sync deletes"
    * half of a full-sync merge). */
  def whenNotMatchedBySourceDelete(condition: Option[Column] = None): MergeBuilder = {
    notMatchedBySourceClauses :+= NotMatchedBySourceDelete(condition); this
  }

  /** Equi-join key pairs (targetCol, sourceCol) extracted from the merge
    * condition's AND-conjunction — the inputs to phase-0 file pruning. */
  private def equiKeyPairs: Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    def attr(e: Expression): Option[(String, String)] = e match {
      case u: UnresolvedAttribute if u.nameParts.length == 2 =>
        Some((u.nameParts.head.toLowerCase, u.nameParts.last))
      case _ => None
    }
    def walk(e: Expression): Seq[(String, String)] = e match {
      case And(l, r) => walk(l) ++ walk(r)
      case EqualTo(a, b) => (attr(a), attr(b)) match {
        case (Some(("target", t)), Some(("source", s))) => Seq((t, s))
        case (Some(("source", s)), Some(("target", t))) => Seq((t, s))
        case _ => Nil
      }
      case _ => Nil
    }
    walk(Pruner.normalize(Pruner.exprOf(condition)))
  }

  /** True iff the merge condition is EXACTLY a conjunction of target-source
    * equi pairs — then "multiple sources match one target row" can only
    * happen when the source has duplicate key tuples, so a distinct-key
    * source needs no join-side ambiguity guard at all. */
  private def pureEquiCondition(pairs: Seq[(String, String)]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    pairs.nonEmpty &&
      conjuncts(Pruner.normalize(Pruner.exprOf(condition))).size == pairs.size
  }

  // opt-in phase timing for local profiling: -Dgraft.merge.timing=1
  private val timingOn = sys.props.get("graft.merge.timing").contains("1")
  private var lastMark = System.nanoTime()
  private def mark(label: String): Unit = if (timingOn) {
    val now = System.nanoTime()
    System.err.println(f"[merge-timing] $label%-28s ${(now - lastMark) / 1e9}%7.2f s")
    lastMark = now
  }

  /** Run the two-phase merge. Returns the committed version. */
  def execute(): Long =
    try executeImpl()
    catch {
      // replayed (txnAppId, txnVersion) epoch detected inside the commit
      // retry loop: the work is already in the table
      case _: LakeTable.EpochAlreadyCommitted => table.snapshot().version
    }

  private def executeImpl(): Long = {
    val spark = table.spark
    val snap = table.snapshot()
    txn match {
      case Some((app, v)) if table.lastTxnVersion(snap, app).exists(_ >= v) =>
        return snap.version // replayed epoch: skip before staging any work
      case _ =>
    }
    lastMark = System.nanoTime()
    val cdfOn = table.properties.get("graft.enableChangeDataFeed").contains("true")
    val dvOn = table.properties.get("graft.enableDeletionVectors").contains("true")

    // Schema evolution: source-only columns join the target schema
    // (nullable) for this merge's commit; pre-evolution files read them as
    // NULL via the enforced read schema — no rewrite of untouched data.
    val newCols: Seq[org.apache.spark.sql.types.StructField] = {
      val added =
        if (!schemaEvolution) Seq.empty
        else source.schema.fields.toSeq
          .filter(f => !snap.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
          .map(f => f.copy(nullable = true,
            metadata = graft.log.ColumnIds.strip(
              org.apache.spark.sql.types.StructType(Seq(f))).fields.head.metadata))
      // on a mapped table the evolved columns get fresh field ids
      graft.log.ColumnIds.stampNew(snap.metadata.properties, snap.schema, added)._1
    }
    val schema = org.apache.spark.sql.types.StructType(snap.schema.fields ++ newCols)
    val evolution: Seq[graft.log.Action] = table.evolveMeta(snap, schema)
    // Delta parity: an insert clause that omits a column falls back to the
    // column's declared DEFAULT (CURRENT_DEFAULT metadata), else NULL
    def insertMissing(c: String, dt: org.apache.spark.sql.types.DataType): Column = {
      val md = schema(c).metadata
      if (md.contains("CURRENT_DEFAULT"))
        org.apache.spark.sql.functions.expr(md.getString("CURRENT_DEFAULT")).cast(dt)
      else lit(null).cast(dt)
    }

    // *All clauses resolve against the EFFECTIVE schema (incl. evolved
    // columns), which is only known here.
    val allSet = () => schema.fieldNames.filter(sourceCols.contains)
      .map(c => c -> col(s"source.$c")).toMap
    // Delta parity: update clauses RECOMPUTE generated columns whose base
    // the clause assigns (same substitution as UPDATE — a stale value would
    // fail the write-time identity check); insert clauses COMPUTE generated
    // columns missing from the VALUES map over the inserted values.
    val matchedClauses: Vector[Clause] = rawMatchedClauses.map {
      case MatchedUpdateAll(cond) => MatchedUpdate(cond, allSet())
      case other => other
    }.map {
      case MatchedUpdate(cond, set) =>
        MatchedUpdate(cond, table.recomputeGenerated(set, qualifier = Some("target")))
      case other => other
    }
    val notMatchedClauses: Vector[NotMatchedInsert] = rawNotMatchedClauses.map {
      case NotMatchedInsertAll(cond) => NotMatchedInsert(cond, allSet())
      case i: NotMatchedInsert => i
      case other => throw new IllegalStateException(s"unexpected clause $other")
    }.map { case NotMatchedInsert(cond, values) =>
      NotMatchedInsert(cond, table.recomputeGenerated(values, insertMode = true,
        // base columns the VALUES map omits are written by insertMissing
        // with their CURRENT_DEFAULT — the rule must see that same value
        defaultFor = n => schema.fields
          .find(f => f.name.equalsIgnoreCase(n) &&
            f.metadata.contains("CURRENT_DEFAULT"))
          .map(f => org.apache.spark.sql.functions
            .expr(f.metadata.getString("CURRENT_DEFAULT")).cast(f.dataType))))
    }
    notMatchedBySourceClauses = notMatchedBySourceClauses.map {
      case NotMatchedBySourceUpdate(cond, set) =>
        NotMatchedBySourceUpdate(cond,
          table.recomputeGenerated(set, qualifier = Some("target")))
      case other => other
    }

    // Materialize the source once: it is referenced by phase-0 bounds, the
    // phase-1 probe, and the phase-2 join — and must not change between them.
    val src = source.persist(StorageLevel.MEMORY_AND_DISK)
    // The phase-2 full-outer join cannot use a broadcast hash join, and a
    // sort-merge join pays a full sort of the (large) target side that a
    // shuffled hash join skips — the source side always fits a build map
    // (it is the small side by construction; AQE still rewrites skew).
    // Measured 2.8x faster on the 5M-row rewrite. Scoped to this merge.
    val prevPreferSmj = spark.conf.getOption("spark.sql.join.preferSortMergeJoin")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    // Probe by-product: when some source rows found no match, the (lazy)
    // plan for their DISTINCT matched keys — the insert side then anti-joins
    // against its broadcast (one extra narrow scan) instead of shuffling the
    // touched files' keys.
    var matchedKeys: Option[DataFrame] = None
    try {

    // Phase 0: ONE fused pass over the (persisted) source computes the row
    // count (numSourceRows metric), the equi-key min/max bounds for file
    // pruning (the Delta "merge touches only the key-overlapping slice"
    // behavior — at scale this is what keeps a 1%-overlap merge from
    // scanning the table), and the distinct-key count for the ambiguity
    // guard. One small job instead of three.
    val pairs = equiKeyPairs
    val pureEqui = pureEquiCondition(pairs)
    val (numSourceRows, candidates, srcKeysDistinct): (Long, Seq[AddFile], Boolean) =
      scala.util.Try {
        val aggs = Seq(count(lit(1)).as("__cnt")) ++
          pairs.flatMap { case (_, s) =>
            Seq(min(col(s)).as(s"__lo_$s"), max(col(s)).as(s"__hi_$s")) } ++
          (if (pureEqui)
            // bare column beats a 1-field struct in the distinct agg's Expand
            Seq(count_distinct(
              if (pairs.size == 1) col(pairs.head._2)
              else struct(pairs.map(p => col(p._2)): _*)).as("__dk"))
          else Nil)
        val row = src.agg(aggs.head, aggs.tail: _*).collect().head
        val cnt = row.getAs[Long]("__cnt")
        val distinct = pureEqui && row.getAs[Long]("__dk") == cnt
        val cands =
          if (pairs.isEmpty || snap.files.size < 8) snap.files
          else {
            val preds = pairs.flatMap { case (t, s) =>
              val lo = row.getAs[Any](s"__lo_$s"); val hi = row.getAs[Any](s"__hi_$s")
              if (lo == null || hi == null) None
              else Some(col(t) >= lit(lo) && col(t) <= lit(hi))
            }
            if (preds.isEmpty) snap.files
            else Pruner.prune(table.partitionPrune(snap, snap.files, preds), preds,
              schema, table.bloomIndex)
          }
        (cnt, cands, distinct)
      }.getOrElse((src.count(), snap.files, false))
    mark("phase0 source agg")

    // WHEN NOT MATCHED BY SOURCE widens the touched set beyond the
    // key-overlap slice: unmatched target rows can live in ANY file, so
    // only the clause conditions themselves can prune (Delta behaves the
    // same — an unconditional NMBS clause scans the whole table).
    val nmbsOn = notMatchedBySourceClauses.nonEmpty
    val nmbsCandidates: Seq[AddFile] =
      if (!nmbsOn) Nil
      else {
        val conds = notMatchedBySourceClauses.map(_.cond)
        if (conds.forall(_.isDefined)) {
          val anyCond = conds.flatten.reduce(_ || _)
          Pruner.prune(table.partitionPrune(snap, snap.files, Seq(anyCond)),
            Seq(anyCond), schema, table.bloomIndex)
        } else snap.files
      }

    // Insert-only merge (no matched clauses): target files are never
    // rewritten — anti-join the source against the candidate slice and
    // append the surviving rows as new files (Delta's insert-only-merge
    // fast path; also the only correct semantics when one target row
    // matches several source rows).
    if (matchedClauses.isEmpty && !nmbsOn) {
      // shuffle_hash: the target side must never be auto-broadcast (see the
      // phase-2 anti-join note below — same driver-broadcast hazard)
      val tgt = table.readFilesMasked(snap, candidates, schema)
        .hint("shuffle_hash").alias("target")
      val unmatchedSrc = src.alias("source").join(tgt, condition, "left_anti")
        .alias("source")
      val insertAction = {
        var c: Column = null
        notMatchedClauses.zipWithIndex.foreach { case (cl, j) =>
          val p = coalesce(cl.cond.getOrElse(lit(true)), lit(false))
          c = if (c == null) when(p, lit(s"i$j")) else c.when(p, lit(s"i$j"))
        }
        if (c == null) lit("drop") else c.otherwise(lit("drop"))
      }
      val tagged = unmatchedSrc.withColumn("__action", insertAction)
        .filter(col("__action") =!= "drop")
      val inserts = tagged.select(schema.fieldNames.toIndexedSeq.map { c =>
        val dt = schema(c).dataType
        var expr: Column = null
        notMatchedClauses.zipWithIndex.foreach { case (NotMatchedInsert(_, values), j) =>
          val v = values.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e }
            .map(_.cast(dt)).getOrElse(insertMissing(c, dt))
          expr = if (expr == null) when(col("__action") === s"i$j", v)
            else expr.when(col("__action") === s"i$j", v)
        }
        (if (expr == null) lit(null).cast(dt) else expr.otherwise(lit(null).cast(dt)))
          .as(c, schema(c).metadata)
      }: _*)
      val adds = table.stageWrite(inserts, snap.metadata.partitionColumns)
      val numInserted = adds.map(_.numRecords).sum
      val sidecars = if (cdfOn && adds.nonEmpty)
        table.writeCdfSidecar(table.readFiles(adds.map(f =>
          f.copy(path = table.absPath(f))), schema)
          .withColumn("_change_type", lit("insert")))
      else Nil
      return table.commitRewrite(snap, "MERGE",
        Map("predicate" -> condition.toString, "matchedClauses" -> "0",
          "notMatchedClauses" -> notMatchedClauses.size.toString) ++ txnParams,
        Nil, adds, evolution ++ sidecars,
        Map("numTargetRowsInserted" -> numInserted,
          "numTargetRowsUpdated" -> 0L, "numTargetRowsDeleted" -> 0L,
          "numTargetRowsCopied" -> 0L, "numSourceRows" -> numSourceRows))
    }

    // Phase 1: which candidate files actually contain matched rows, FUSED
    // with the ambiguous-match guard — the same broadcast inner join yields
    // the touched-file set, the matched-pair count, and the distinct
    // matched-target-row count in one job (a target row matched by >1
    // source row makes pairs exceed distinct rows). When the phase-0 source
    // pass already proved ambiguity impossible (pure equi-condition with
    // distinct source keys), the probe collects only the file set — the
    // distinct agg's Expand over every matched pair is the expensive part.
    // With <=2 candidates the probe costs more than rewriting everything;
    // the guard (when still needed) then falls back to a narrow aggregation
    // over the phase-2 join.
    var guardChecked = srcKeysDistinct
    // Set by the distinct-keys probe: how many source rows found a match.
    // When it equals numSourceRows, NO source row is an insert and the
    // phase-2 anti-join (a full scan of the touched files' keys) is skipped.
    var matchedSourceRows: Option[Long] = None
    // (The probe always runs past the 2-candidate floor: a "dense merge"
    // heuristic that skips it was tried and dropped — when a large
    // distinct-key source mostly MISSES the table (an id-list delete), the
    // skipped probe turns into a full rewrite of every candidate file as
    // unchanged copies, an asymmetric loss for a narrow-scan saving.)
    val matchTouched: Seq[AddFile] =
      if (candidates.size <= 2) candidates
      else {
        val touchedPaths: Set[String] =
          if (srcKeysDistinct) {
            // Key-only probe scan (the pure-equi condition references
            // nothing else). When insert clauses exist, the same probe job
            // also counts the DISTINCT matched source keys (distinct because
            // a source row can match several duplicate-key target rows): if
            // every source row matched, phase 2 skips its anti-join — a full
            // scan of the touched files' keys — entirely.
            val srcKey = if (pairs.size == 1) col(s"source.${pairs.head._2}")
              else struct(pairs.map(p => col(s"source.${p._2}")): _*)
            val keySchema = org.apache.spark.sql.types.StructType(
              pairs.map(_._1).distinct.map(c =>
                schema.fields.find(_.name.equalsIgnoreCase(c)).get))
            val probeT = table.readFilesWithFile(snap, candidates, keySchema)
              .alias("target")
            val joinedProbe = probeT.join(src.alias("source"), condition, "inner")
            if (rawNotMatchedClauses.isEmpty) {
              val row = joinedProbe
                .agg(collect_set(col("__file")).as("files")).collect().head
              row.getAs[Seq[String]]("files").map(Stats.stripScheme).toSet
            } else {
              val row = joinedProbe.agg(collect_set(col("__file")).as("files"),
                count_distinct(srcKey).as("msr")).collect().head
              val msr = row.getAs[Long]("msr")
              matchedSourceRows = Some(msr)
              // same sizing rule as the DV mask broadcast: a known row count
              // under 4M builds a safe executor-side map
              if (msr < numSourceRows && msr <= 4000000L)
                matchedKeys = Some(joinedProbe.select(srcKey.as("__k")).distinct())
              row.getAs[Seq[String]]("files").map(Stats.stripScheme).toSet
            }
          } else {
            val probeTarget = table.readFilesWithFile(snap, candidates, schema)
              .withColumn("__prid", monotonically_increasing_id()).alias("target")
            val probe = probeTarget.join(src.alias("source"), condition, "inner")
              .select(col("target.__file").as("__f"), col("target.__prid").as("__p"))
              .agg(collect_set(col("__f")).as("files"),
                count(lit(1)).as("tocc"), count_distinct(col("__p")).as("trids"))
              .collect().head
            if (matchedClauses.nonEmpty &&
                probe.getAs[Long]("tocc") > probe.getAs[Long]("trids"))
              throw new IllegalStateException(
                "MERGE failed: multiple source rows matched the same target row " +
                  "(same semantics as Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE)")
            guardChecked = true
            probe.getAs[Seq[String]]("files").map(Stats.stripScheme).toSet
          }
        snap.files.filter(f => touchedPaths.contains(table.absPath(f)))
      }
    mark("phase1 probe")
    val touched: Seq[AddFile] =
      if (!nmbsOn) matchTouched
      else {
        val seen = matchTouched.map(_.path).toSet
        matchTouched ++ nmbsCandidates.filterNot(f => seen.contains(f.path))
      }

    // Shared by the two low-shuffle fast paths below: which matched clause
    // fires ("m<i>" / "copy"), and the rewrite projection for matched rows.
    def matchedActionCol(matchedP: Column): Column = {
      var c: Column = null
      matchedClauses.zipWithIndex.foreach { case (cl, i) =>
        val p = matchedP && coalesce(cl.cond.getOrElse(lit(true)), lit(false))
        c = if (c == null) when(p, lit(s"m$i")) else c.when(p, lit(s"m$i"))
      }
      c.otherwise(lit("copy"))
    }
    def matchedOutCol(c: String): Column = {
      val dt = schema(c).dataType
      var expr: Column = null
      matchedClauses.zipWithIndex.foreach {
        case (MatchedUpdate(_, set), i) =>
          val v = set.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e }
            .getOrElse(col(s"target.$c")).cast(dt)
          expr = if (expr == null) when(col("__action") === s"m$i", v)
            else expr.when(col("__action") === s"m$i", v)
        case _ =>
      }
      val base = col(s"target.$c")
      (if (expr == null) base else expr.otherwise(base)).as(c, schema(c).metadata)
    }
    lazy val fastDeleteTags = matchedClauses.zipWithIndex.collect {
      case (_: MatchedDelete, i) => s"m$i" }
    lazy val fastUpdateTags = matchedClauses.zipWithIndex.collect {
      case (_: MatchedUpdate, i) => s"m$i" }

    // Insert side of the decomposed merge: source LEFT ANTI touched-target
    // keys, projected to the table schema, insert count observed on the
    // write job. The anti side needs only the target key columns: a source
    // row matching any touched-file row is by definition not an insert, and
    // rows in unprobed files cannot match (their key ranges were pruned
    // against the source bounds in phase 0). shuffle_hash pins the plan to
    // a shuffled hash join: the target keys are the build side and at scale
    // they must never be driver-broadcast (auto-broadcast picked them
    // whenever the narrow key scan's estimate fell under the threshold — a
    // 10M-key HashedRelation built on the driver per merge).
    def fastInsertSide(): (DataFrame, () => Long) = {
      val anti = matchedKeys match {
        case Some(mk) =>
          // The probe already materialized the distinct matched source keys
          // (small, known count): anti-join against their broadcast — the
          // touched files' keys are never scanned a second time. A null
          // source key compares null and is kept, i.e. inserted — identical
          // to the equi anti-join below.
          val srcKey = if (pairs.size == 1) col(s"source.${pairs.head._2}")
            else struct(pairs.map(p => col(s"source.${p._2}")): _*)
          src.alias("source").join(broadcast(mk), srcKey === col("__k"), "left_anti")
            .alias("source")
        case None =>
          val keyCols = pairs.map(_._1).distinct
          val tgtKeys = table.readFilesMasked(snap, touched,
            org.apache.spark.sql.types.StructType(
              keyCols.map(c => schema.fields.find(_.name.equalsIgnoreCase(c)).get)))
            .hint("shuffle_hash")
            .alias("target")
          src.alias("source").join(tgtKeys, condition, "left_anti")
            .alias("source")
      }
      val insertAction = {
        var c: Column = null
        notMatchedClauses.zipWithIndex.foreach { case (cl, j) =>
          val p = coalesce(cl.cond.getOrElse(lit(true)), lit(false))
          c = if (c == null) when(p, lit(s"i$j")) else c.when(p, lit(s"i$j"))
        }
        c.otherwise(lit("drop"))
      }
      val tagged = anti.withColumn("__action", insertAction)
      val obsB = org.apache.spark.sql.Observation()
      val observable = !LakeTable.onStreamExecutionThread
      val keptB = (if (observable)
          tagged.observe(obsB,
            sum(when(col("__action") =!= "drop", 1L).otherwise(0L)).as("inserted"))
        else tagged)
        .filter(col("__action") =!= "drop")
        .select(schema.fieldNames.toIndexedSeq.map { c =>
          val dt = schema(c).dataType
          var expr: Column = null
          notMatchedClauses.zipWithIndex.foreach { case (NotMatchedInsert(_, values), j) =>
            val v = values.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e }
              .map(_.cast(dt)).getOrElse(insertMissing(c, dt))
            expr = if (expr == null) when(col("__action") === s"i$j", v)
              else expr.when(col("__action") === s"i$j", v)
          }
          expr.otherwise(lit(null).cast(dt)).as(c, schema(c).metadata)
        }: _*)
      (keptB, () =>
        if (observable) obsB.get.get("inserted") match {
          case Some(l: java.lang.Long) => l.longValue(); case _ => 0L
        }
        // foreachBatch thread: recount with a narrow job (keys only)
        else tagged.filter(col("__action") =!= "drop").count())
    }

    // Phase 2 fast path (low-shuffle merge): when the source keys are
    // provably distinct under a pure equi-condition, the full-outer join
    // decomposes into
    //   (a) touched-target LEFT OUTER source  -> updates / deletes / copies
    //   (b) source LEFT ANTI touched-keys     -> inserts
    // (a) broadcasts the (small) source build side, so the wide target rows
    // are scanned and rewritten IN PLACE — never shuffled. (b) shuffles only
    // the join keys. The full-outer plan shuffles every touched row full-
    // width through an exchange, which at the 10M-row strain shape doubled
    // merge wall time and its variance. Delta's photon merge does the same
    // decomposition ("low-shuffle merge").
    if (srcKeysDistinct && pureEqui && !cdfOn && !dvOn &&
        notMatchedBySourceClauses.isEmpty && matchedClauses.nonEmpty) {
      if (touched.isEmpty) {
        // Empty key-overlap slice (e.g. first CDC batch into an empty
        // table): no target row can match, the merge is pure insert. Short-
        // circuit — the left-outer leg over ZERO files collapses to an
        // empty relation during optimization and takes its CollectMetrics
        // node with it, so Observation.get would never return.
        val (inserts, numInserted: (() => Long)) =
          if (notMatchedClauses.isEmpty) (None, () => 0L)
          else { val (k, i) = fastInsertSide(); (Some(k), i) }
        val adds = inserts.map(r => table.stageWrite(r, snap.metadata.partitionColumns))
          .getOrElse(Nil)
        mark("phase2 insert-only write")
        val v = table.commitRewrite(snap, "MERGE",
          Map("predicate" -> condition.toString,
            "matchedClauses" -> matchedClauses.size.toString,
            "notMatchedClauses" -> notMatchedClauses.size.toString) ++ txnParams,
          Nil, adds, evolution,
          Map("numTargetRowsUpdated" -> 0L, "numTargetRowsDeleted" -> 0L,
            "numTargetRowsInserted" -> numInserted(),
            "numTargetRowsCopied" -> 0L, "numSourceRows" -> numSourceRows))
        mark("commit")
        return v
      }
      // row tracking: target rows carry resolved ids through the join and
      // back out as materialized columns — updates/copies keep their id
      // (copies keep the commit version too); inserts land with null
      // materialized values and resolve to the new file's fresh range
      val rt = table.rowsTracked(snap, touched)
      val tgtF = (if (rt) table.posWithRowIds(snap, touched, schema)
          .drop("__file", "__idx")
        else table.readFilesMasked(snap, touched, schema)).alias("target")
      val srcF = src.withColumn("__src", lit(true)).alias("source")
      val lo = tgtF.join(srcF, condition, "left_outer")
      val matchedP = col("source.__src").isNotNull
      val actionA = matchedActionCol(matchedP)
      val deleteTagsA = fastDeleteTags
      val updateTagsA = fastUpdateTags
      def tagCountA(tags: Seq[String]): Column =
        if (tags.isEmpty) sum(lit(0L))
        else sum(when(col("__action").isin(tags: _*), 1L).otherwise(0L))
      val obsA = org.apache.spark.sql.Observation()
      val observable = !LakeTable.onStreamExecutionThread
      val keptA0 = lo.withColumn("__action", actionA)
      val keptA = (if (observable)
          keptA0.observe(obsA,
            tagCountA(updateTagsA).as("updated"),
            tagCountA(deleteTagsA).as("deleted"),
            tagCountA(Seq("copy")).as("copied"))
        else keptA0)
        .filter(!col("__action").isin(deleteTagsA: _*))
        .select(schema.fieldNames.toIndexedSeq.map(matchedOutCol) ++
          (if (!rt) Nil else Seq(
            col(s"target.${RowTracking.MatRowId}").as(RowTracking.MatRowId),
            when(col("__action") === "copy", col(s"target.${RowTracking.MatRcv}"))
              .otherwise(lit(null)
                .cast(org.apache.spark.sql.types.LongType))
              .as(RowTracking.MatRcv))): _*)

      val (rewritten, numInserted: (() => Long)) =
        if (notMatchedClauses.isEmpty ||
            matchedSourceRows.contains(numSourceRows)) (keptA, () => 0L)
        else {
          val (keptB, inserted) = fastInsertSide()
          // inserts carry no materialized ids (allowMissingColumns fills
          // null) — they resolve to the staged file's fresh base range
          (keptA.unionByName(keptB, allowMissingColumns = true), inserted)
        }
      if (timingOn) System.err.println(rewritten.queryExecution.executedPlan.toString
        .linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Broadcast")).mkString("[merge-plan]\n", "\n", ""))
      val adds = table.stageWrite(rewritten, snap.metadata.partitionColumns)
      mark("phase2 low-shuffle write")
      // foreachBatch thread: recount per-action with one narrow job
      // (Catalyst prunes the projection to the join keys + clause refs)
      lazy val recountA: Map[String, Long] =
        lo.select(actionA.as("__action")).groupBy("__action").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def metricA(k: String): Long =
        if (observable) obsA.get.get(k) match {
          case Some(l: java.lang.Long) => l.longValue(); case _ => 0L
        }
        else k match {
          case "updated" => updateTagsA.map(t => recountA.getOrElse(t, 0L)).sum
          case "deleted" => deleteTagsA.map(t => recountA.getOrElse(t, 0L)).sum
          case _ => recountA.getOrElse("copy", 0L)
        }
      val v = table.commitRewrite(snap, "MERGE",
        Map("predicate" -> condition.toString,
          "matchedClauses" -> matchedClauses.size.toString,
          "notMatchedClauses" -> notMatchedClauses.size.toString) ++ txnParams,
        touched, adds, evolution,
        Map("numTargetRowsUpdated" -> metricA("updated"),
          "numTargetRowsDeleted" -> metricA("deleted"),
          "numTargetRowsInserted" -> numInserted(),
          "numTargetRowsCopied" -> metricA("copied"),
          "numSourceRows" -> numSourceRows))
      mark("commit")
      return v
    }

    // Deletion-vector fast path: same preconditions, but matched rows are
    // MASKED, not rewritten — so the left-outer join above degrades to an
    // INNER join (copies are simply left alone; only firing rows matter)
    // and nothing full-width is ever shuffled OR copied. The small changed
    // set (updates + deletes) is persisted once and feeds the data write,
    // the mask rows, and the metrics; inserts reuse the key-only anti-join.
    // vs the general DV path (full-outer + changed-set scan): 9.1s -> 7.9s
    // at the 10M-row strain shape — the residual cost there is the DV
    // union-vector rewrite, which grows with accumulated masks, not the
    // join. At cluster scale the full-outer's full-width shuffle is the
    // part that would dominate; this path never pays it.
    if (srcKeysDistinct && pureEqui && !cdfOn && dvOn &&
        notMatchedBySourceClauses.isEmpty && matchedClauses.nonEmpty) {
      // row tracking: an updated row's resolved id rides into the appended
      // post-image file (the mask+append analogue of the DV UPDATE path);
      // the commit version is left to the new file's default (= this commit)
      val rt = table.rowsTracked(snap, touched)
      val tgtF = (if (rt) table.posWithRowIds(snap, touched, schema)
        else table.readFilesMaskedPos(snap, touched, schema)).alias("target")
      val changed = tgtF.join(src.alias("source"), condition, "inner")
        .withColumn("__action", matchedActionCol(lit(true)))
        .filter(col("__action") =!= "copy")
        .select(schema.fieldNames.toIndexedSeq.map(matchedOutCol) ++ Seq(
          col("target.__file").as("__file"), col("target.__idx").as("__idx"),
          col("__action")) ++
          (if (rt) Seq(col(s"target.${RowTracking.MatRowId}")
            .as(RowTracking.MatRowId)) else Nil): _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val counts = changed.groupBy("__action").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val numUpdated = fastUpdateTags.map(t => counts.getOrElse(t, 0L)).sum
        val numDeleted = fastDeleteTags.map(t => counts.getOrElse(t, 0L)).sum
        val updatedRows = changed.filter(col("__action").isin(fastUpdateTags: _*))
          .select(schema.fieldNames.toIndexedSeq.map(c =>
            col(c).as(c, schema(c).metadata)) ++
            (if (rt) Seq(col(RowTracking.MatRowId)) else Nil): _*)
        val (toWrite, numInserted: (() => Long)) =
          if (notMatchedClauses.isEmpty ||
              matchedSourceRows.contains(numSourceRows)) (updatedRows, () => 0L)
          else {
            val (keptB, inserted) = fastInsertSide()
            (updatedRows.unionByName(keptB, allowMissingColumns = true), inserted)
          }
        val adds = table.stageWrite(toWrite, snap.metadata.partitionColumns)
        mark("phase2 dv low-shuffle write")
        val maskedRows = changed.select(col("__file"), col("__idx"))
        val v = table.maskAndCommit(snap, "MERGE",
          Map("predicate" -> condition.toString,
            "matchedClauses" -> matchedClauses.size.toString,
            "notMatchedClauses" -> notMatchedClauses.size.toString) ++ txnParams,
          touched, maskedRows, adds, evolution,
          _ => Map("numTargetRowsUpdated" -> numUpdated,
            "numTargetRowsDeleted" -> numDeleted,
            "numTargetRowsInserted" -> numInserted(),
            "numTargetRowsCopied" -> 0L,
            "numSourceRows" -> numSourceRows))
        mark("commit")
        return v
      } finally changed.unpersist(): Unit
    }

    // Phase 2: full-outer join of source vs touched rows; untouched files
    // are left alone entirely.
    // The join is evaluated twice (guard/metrics, then the rewrite) instead
    // of persisted: the guard projection only references the action tag and
    // target rid, so Catalyst prunes its evaluation down to the key columns
    // — far cheaper than materializing the full-width join, locally and at
    // scale. The source side is persisted above, so both evaluations see
    // identical source rows; the target side is immutable parquet.
    // Under deletion vectors, target rows keep their reader positions
    // (__file/__idx): matched rows are masked rather than rewritten, and
    // only updated + inserted rows are written — merge write volume becomes
    // proportional to CHANGED rows, not to the touched files' size.
    // row tracking: resolved ids ride the full-outer join as target-side
    // columns; they are null on insert (source-only) rows, which is
    // exactly the "resolve to the new file's fresh range" representation
    val rtG = table.rowsTracked(snap, touched)
    val tgtT = (if (rtG) {
        val p = table.posWithRowIds(snap, touched, schema)
        if (dvOn) p else p.drop("__file", "__idx")
      }
      else if (dvOn) table.readFilesMaskedPos(snap, touched, schema)
      else table.readFilesMasked(snap, touched, schema))
      .withColumn("__rid", monotonically_increasing_id())
      .withColumn("__tgt", lit(true)).alias("target")
    val srcT = src.withColumn("__src", lit(true)).alias("source")
    val joinedRaw = tgtT.join(srcT, condition, "full_outer")
    // With CDF on, the join feeds four sidecar selections plus guard and
    // rewrite — persist it. Without CDF, the guard's projection prunes to
    // the key columns, so re-evaluating beats materializing the full width.
    val joined =
      if (cdfOn) joinedRaw.persist(StorageLevel.MEMORY_AND_DISK) else joinedRaw
    var dvChangedRef: Option[DataFrame] = None
    try {
      val matched = col("target.__tgt").isNotNull && col("source.__src").isNotNull
      val srcOnly = col("target.__tgt").isNull
      val tgtOnly = col("target.__tgt").isNotNull && col("source.__src").isNull

      // (duplicate-source-match guard is fused into the rollup metrics job
      // below — one shuffle instead of two)

      // Which clause fires per row: "m<i>" / "i<j>" / "copy" / "drop".
      val actionCol = {
        var c: Column = null
        matchedClauses.zipWithIndex.foreach { case (cl, i) =>
          val p = matched && coalesce(cl.cond.getOrElse(lit(true)), lit(false))
          c = if (c == null) when(p, lit(s"m$i")) else c.when(p, lit(s"m$i"))
        }
        notMatchedClauses.zipWithIndex.foreach { case (cl, j) =>
          val p = srcOnly && coalesce(cl.cond.getOrElse(lit(true)), lit(false))
          c = if (c == null) when(p, lit(s"i$j")) else c.when(p, lit(s"i$j"))
        }
        notMatchedBySourceClauses.zipWithIndex.foreach { case (cl, k) =>
          val p = tgtOnly && coalesce(cl.cond.getOrElse(lit(true)), lit(false))
          val tag = cl match {
            case _: NotMatchedBySourceUpdate => s"u$k"
            case _ => s"x$k"
          }
          c = if (c == null) when(p, lit(tag)) else c.when(p, lit(tag))
        }
        val tail = when(srcOnly, lit("drop")).otherwise(lit("copy"))
        if (c == null) tail else c.otherwise(tail)
      }
      val acted = joined.withColumn("__action", actionCol)

      def outCol(c: String): Column = {
        val dt = schema(c).dataType
        var expr: Column = null
        matchedClauses.zipWithIndex.foreach {
          case (MatchedUpdate(_, set), i) =>
            val v = set.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e }
              .getOrElse(col(s"target.$c")).cast(dt)
            expr = if (expr == null) when(col("__action") === s"m$i", v)
              else expr.when(col("__action") === s"m$i", v)
          case (_: MatchedDelete, _) => // row filtered out below
          case _ =>
        }
        notMatchedClauses.zipWithIndex.foreach { case (NotMatchedInsert(_, values), j) =>
          val v = values.collectFirst { case (k, e) if k.equalsIgnoreCase(c) => e }
            .map(_.cast(dt)).getOrElse(insertMissing(c, dt))
          expr = if (expr == null) when(col("__action") === s"i$j", v)
            else expr.when(col("__action") === s"i$j", v)
        }
        notMatchedBySourceClauses.zipWithIndex.foreach {
          case (NotMatchedBySourceUpdate(_, set), k) =>
            val v = set.collectFirst { case (kk, e) if kk.equalsIgnoreCase(c) => e }
              .getOrElse(col(s"target.$c")).cast(dt)
            expr = if (expr == null) when(col("__action") === s"u$k", v)
              else expr.when(col("__action") === s"u$k", v)
          case _ =>
        }
        val base = col(s"target.$c")
        (if (expr == null) base else expr.otherwise(base)).as(c, schema(c).metadata)
      }

      val nmbsUpdateTags = notMatchedBySourceClauses.zipWithIndex.collect {
        case (_: NotMatchedBySourceUpdate, k) => s"u$k"
      }
      val nmbsDeleteTags = notMatchedBySourceClauses.zipWithIndex.collect {
        case (_: NotMatchedBySourceDelete, k) => s"x$k"
      }
      // NMBS tags fold into the update/delete vectors so the keep-filter,
      // DV masking, CDF sidecars, and metrics all compose without special
      // cases (an NMBS update IS an update of an existing target row)
      val deleteTags = matchedClauses.zipWithIndex.collect {
        case (_: MatchedDelete, i) => s"m$i"
      } ++ nmbsDeleteTags
      val updateTags = (matchedClauses.zipWithIndex.collect {
        case (_: MatchedUpdate, i) => s"m$i"
      }) ++ nmbsUpdateTags
      val insertTags = notMatchedClauses.indices.map(j => s"i$j")

      // Guard fallback for the small-table path where the fused probe was
      // skipped: one narrow aggregation (column-pruned to the join keys).
      // Skipped entirely when the condition is a pure equi-conjunction and
      // the source keys are distinct — ambiguity is then impossible, which
      // the phase-0 source pass already established for free.
      if (!guardChecked && !srcKeysDistinct && matchedClauses.nonEmpty) {
        val r = joined
          .select(matched.as("__m"), col("target.__rid").as("__trid"))
          .filter(col("__m"))
          .agg(count(lit(1)).as("tocc"), count_distinct(col("__trid")).as("trids"))
          .collect().head
        if (r.getAs[Long]("tocc") > r.getAs[Long]("trids"))
          throw new IllegalStateException(
            "MERGE failed: multiple source rows matched the same target row " +
              "(same semantics as Delta's DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW_IN_MERGE)")
      }

      // Per-action metrics ride the rewrite job itself via Observation
      // (a CollectMetrics node ahead of the keep-filter) — no separate
      // metrics aggregation pass over the join.
      def tagCount(tags: Seq[String]): Column =
        if (tags.isEmpty) sum(lit(0L))
        else sum(when(col("__action").isin(tags: _*), 1L).otherwise(0L))
      val obs = org.apache.spark.sql.Observation()
      val observable = !LakeTable.onStreamExecutionThread
      val actedObs = if (!observable) acted else acted.observe(obs,
        tagCount(updateTags).as("updated"),
        tagCount(deleteTags).as("deleted"),
        tagCount(insertTags).as("inserted"),
        tagCount(Seq("copy")).as("copied"),
        tagCount(nmbsUpdateTags).as("nmbsUpdated"),
        tagCount(nmbsDeleteTags).as("nmbsDeleted"))

      // DV mode keeps only the rows that change (updates + inserts); the
      // rewrite mode keeps everything except dropped/deleted rows (copies
      // included, since their file is being replaced wholesale).
      // In DV mode the changed set (updates + deletes + inserts) is small by
      // construction — persist it ONCE so the data write and the mask-row
      // extraction don't each re-evaluate the full-outer join over the
      // touched files (a third full-table pass measured at ~40% of DV-merge
      // wall time at the 10M-row strain shape).
      val keepPred =
        if (dvOn) col("__action").isin((updateTags ++ insertTags): _*)
        else !col("__action").isin(("drop" +: deleteTags): _*)
      // materialized-id passthrough (row tracking): updates/copies keep
      // their id, copies alone keep the commit version, inserts stay null
      val rtExtraG: Seq[Column] = if (!rtG) Nil else Seq(
        col(s"target.${RowTracking.MatRowId}").as(RowTracking.MatRowId),
        when(col("__action") === "copy", col(s"target.${RowTracking.MatRcv}"))
          .otherwise(lit(null).cast(org.apache.spark.sql.types.LongType))
          .as(RowTracking.MatRcv))
      val dvChanged =
        if (!dvOn) None
        else Some(actedObs
          .filter(col("__action").isin((updateTags ++ deleteTags ++ insertTags): _*))
          .select(schema.fieldNames.toIndexedSeq.map(outCol) ++ Seq(
            col("target.__file").as("__file"), col("target.__idx").as("__idx"),
            col("__action")) ++
            (if (rtG) Seq(col(s"target.${RowTracking.MatRowId}")
              .as(RowTracking.MatRowId)) else Nil): _*)
          .persist(StorageLevel.MEMORY_AND_DISK))
      dvChangedRef = dvChanged
      val rewritten = dvChanged match {
        case Some(ch) => ch.filter(keepPred)
          .select(schema.fieldNames.toIndexedSeq.map(c =>
            col(c).as(c, schema(c).metadata)) ++
            (if (rtG) Seq(col(RowTracking.MatRowId)) else Nil): _*)
        case None => actedObs.filter(keepPred)
          .select(schema.fieldNames.toIndexedSeq.map(outCol) ++ rtExtraG: _*)
      }

      val sidecars = if (!cdfOn) Nil else {
        val metaCols = Seq("__rid", "__tgt", "__src", "__action")
        // row tracking: pre/post/delete images carry the TARGET row's
        // resolved id (updates keep ids); insert images are null — a fresh
        // row's id is assigned at commit, after this sidecar is staged
        val tgtId: Seq[Column] = if (!rtG) Nil else Seq(
          col(s"target.${RowTracking.MatRowId}").as(Cdf.RowIdCol))
        val nullId: Seq[Column] = if (!rtG) Nil else Seq(
          lit(null).cast(org.apache.spark.sql.types.LongType).as(Cdf.RowIdCol))
        val pre = acted.filter(col("__action").isin(updateTags: _*))
          .select(schema.fieldNames.toIndexedSeq.map(c => col(s"target.$c").as(c)) ++
            tgtId: _*)
          .withColumn("_change_type", lit("update_preimage"))
        val post = acted.filter(col("__action").isin(updateTags: _*))
          .select(schema.fieldNames.toIndexedSeq.map(outCol) ++ tgtId: _*)
          .withColumn("_change_type", lit("update_postimage"))
        val del = acted.filter(col("__action").isin(deleteTags: _*))
          .select(schema.fieldNames.toIndexedSeq.map(c => col(s"target.$c").as(c)) ++
            tgtId: _*)
          .withColumn("_change_type", lit("delete"))
        val ins = acted.filter(col("__action").isin(insertTags: _*))
          .select(schema.fieldNames.toIndexedSeq.map(outCol) ++ nullId: _*)
          .withColumn("_change_type", lit("insert"))
        table.writeCdfSidecar(pre.unionByName(post).unionByName(del).unionByName(ins))
      }

      val adds = table.stageWrite(rewritten, snap.metadata.partitionColumns)
      // the rewrite job has run; observed metrics are available (sum over an
      // empty plan is null -> 0). On a foreachBatch thread the observation
      // can never complete — recount per action with one narrow job instead.
      lazy val observed = obs.get
      lazy val recount: Map[String, Long] =
        acted.select(col("__action")).groupBy("__action").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      def metric(k: String): Long =
        if (observable) observed.get(k) match {
          case Some(l: java.lang.Long) => l.longValue()
          case _ => 0L
        }
        else {
          val tags = k match {
            case "updated" => updateTags
            case "deleted" => deleteTags
            case "inserted" => insertTags
            case "nmbsUpdated" => nmbsUpdateTags
            case "nmbsDeleted" => nmbsDeleteTags
            case _ => Seq("copy")
          }
          tags.map(t => recount.getOrElse(t, 0L)).sum
        }
      val metrics = Map(
        "numTargetRowsUpdated" -> metric("updated"),
        "numTargetRowsDeleted" -> metric("deleted"),
        "numTargetRowsInserted" -> metric("inserted"),
        "numTargetRowsCopied" -> (if (dvOn) 0L else metric("copied")),
        "numSourceRows" -> numSourceRows) ++
        (if (nmbsOn) Map(
          "numTargetRowsNotMatchedBySourceUpdated" -> metric("nmbsUpdated"),
          "numTargetRowsNotMatchedBySourceDeleted" -> metric("nmbsDeleted"))
        else Map.empty)
      val params = Map("predicate" -> condition.toString,
        "matchedClauses" -> matchedClauses.size.toString,
        "notMatchedClauses" -> notMatchedClauses.size.toString) ++
        (if (nmbsOn) Map("notMatchedBySourceClauses" ->
          notMatchedBySourceClauses.size.toString)
        else Map.empty) ++ txnParams
      if (dvOn) {
        // matched (updated or deleted) target rows join their files' vectors
        // — read from the persisted changed set, not the join
        val maskedRows = dvChanged.get
          .filter(col("__action").isin((updateTags ++ deleteTags): _*))
          .select(col("__file"), col("__idx"))
        table.maskAndCommit(snap, "MERGE", params, touched, maskedRows, adds,
          evolution ++ sidecars, _ => metrics)
      } else {
        table.commitRewrite(snap, "MERGE", params, touched, adds,
          evolution ++ sidecars, metrics)
      }
    } finally {
      if (cdfOn) joined.unpersist(): Unit
      dvChangedRef.foreach(_.unpersist(): Unit)
    }
    } finally {
      src.unpersist()
      prevPreferSmj match {
        case Some(v) => spark.conf.set("spark.sql.join.preferSortMergeJoin", v)
        case None => spark.conf.unset("spark.sql.join.preferSortMergeJoin")
      }
    }
  }
}

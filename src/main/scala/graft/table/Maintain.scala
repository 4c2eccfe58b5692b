package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

import graft.log._

/** Table maintenance: OPTIMIZE (small-file compaction) and Z-ORDER
  * clustering (M8/M9, src/data_processor.py:202-231, src/delta_utils.py:295-335).
  *
  * Both are data-identical rewrites: same rows, better file layout. Z-order
  * tightens per-file min/max ranges on the clustering columns so
  * [[graft.log.Pruner]] can skip most files for point/range predicates —
  * the engine's substitute for Delta's data skipping.
  */
trait MaintenanceSupport { self: LakeTable =>

  /** Maintenance read: the three rewrites here (compact / cluster / purge)
    * are data-identical, so under row tracking they read with each row's
    * id and commit-version MATERIALIZED as physical parquet columns — the
    * rewritten files carry row identity forward and a compaction does not
    * disturb `_row_id` (the Delta rowTracking preservation rule). Plain
    * masked read otherwise. */
  private[table] def rewriteRead(snap: graft.log.Snapshot, files: Seq[AddFile]): DataFrame =
    if (rowsTracked(snap, files))
      posWithRowIds(snap, files).drop("__file", "__idx")
    else readFilesMasked(snap, files, snap.schema)

  /** Bin-pack files smaller than `targetFileSize` into ~target-sized files.
    * One distributed job: small files are read together and repartitioned on
    * the partition columns so each output task writes into few hive dirs. */
  def optimizeCompact(
      targetFileSize: Long = 128L * 1024 * 1024,
      where: Option[Column] = None): Long = {
    val snap = snapshot()
    // `where` bounds maintenance to matching partitions (OPTIMIZE WHERE):
    // at scale you compact the partitions that just received writes, not the
    // table. Conservative local pruning is safe — compaction is
    // data-identical, extra files just get packed too.
    val scoped = where.map(p => partitionPrune(snap, snap.files, Seq(p)))
      .getOrElse(snap.files)
    val small = scoped.filter(_.size < targetFileSize)
    // group by partition dir: compaction only helps where >1 small file coexists
    val byPart = small.groupBy(_.partitionValues).filter(_._2.size > 1)
    val doomed = byPart.values.flatten.toSeq
    if (doomed.isEmpty) return snap.version
    val totalBytes = doomed.map(_.size).sum
    val n = math.max(1, (totalBytes.toDouble / targetFileSize).ceil.toInt)
    val df = rewriteRead(snap, doomed)
    val pcols = snap.metadata.partitionColumns
    val packed =
      if (pcols.nonEmpty) df.repartition(n, pcols.map(col): _*)
      else df.repartition(n)
    val adds = stageWrite(packed, pcols)
    commitRewrite(snap, "OPTIMIZE", Map("targetFileSize" -> targetFileSize.toString),
      doomed, adds, Nil, Map(
        "numFilesRemoved" -> doomed.size.toLong,
        "numFilesAdded" -> adds.size.toLong))
  }

  /** OPTIMIZE ZORDER BY (cols): rewrite live files clustered on the
    * interleaved z-value of `cols`, range-partitioned so each output file
    * covers a tight z-range (→ tight min/max stats → file skipping).
    * INCREMENTAL by default: files already tagged as curve-ordered for the
    * same column set (a prior OPTIMIZE's outputs, clustered-ingest writes)
    * are left in place and only the unclustered remainder is rewritten —
    * Delta liquid clustering's property, which is what keeps re-OPTIMIZE
    * of a 100 TB table proportional to NEW data, not table size. Each
    * pass's outputs have tight per-file ranges, so skipping holds even
    * though ranges may overlap ACROSS passes; `full = true` forces the
    * single-pass global rewrite. */
  def optimizeZOrder(
      cols: Seq[String],
      targetFileSize: Long = 128L * 1024 * 1024,
      where: Option[Column] = None,
      full: Boolean = false): Long =
    clusterRewrite(cols, curve = "zorder", targetFileSize, where, full)

  /** OPTIMIZE … CLUSTER BY (cols): same rewrite shape, but ordered on the
    * Hilbert-curve position of the bucketed dimensions instead of the
    * z-value — consecutive curve cells are always adjacent, so range files
    * get min/max boxes at least as tight on every clustering column (the
    * key Delta's liquid clustering uses for the same reason). Incremental
    * like [[optimizeZOrder]]. */
  def optimizeHilbert(
      cols: Seq[String],
      targetFileSize: Long = 128L * 1024 * 1024,
      where: Option[Column] = None,
      full: Boolean = false): Long =
    clusterRewrite(cols, curve = "hilbert", targetFileSize, where, full)

  /** The `clusteredBy` provenance tag value for (curve, cols). */
  private[table] def clusterTag(curve: String, cols: Seq[String]): String =
    s"$curve:${cols.map(_.toLowerCase).mkString(",")}"

  private def clusterRewrite(
      cols: Seq[String],
      curve: String,
      targetFileSize: Long,
      where: Option[Column],
      full: Boolean): Long = {
    val snap = snapshot()
    require(cols.nonEmpty && cols.size <= 4, s"$curve clustering needs 1-4 columns")
    val missing = cols.filterNot(snap.schema.fieldNames.contains)
    require(missing.isEmpty, s"$curve columns not in schema: ${missing.mkString(",")}")
    val inScope = where.map(p => partitionPrune(snap, snap.files, Seq(p)))
      .getOrElse(snap.files)
    val tag = clusterTag(curve, cols)
    // incremental: skip files a prior pass (or clustered ingest) already
    // wrote in THIS curve order over THIS column set; a masked file's
    // layout is still valid, so DVs don't force a rewrite here
    val scoped = if (full) inScope else inScope.filter(!_.tag("clusteredBy").contains(tag))
    if (scoped.isEmpty) return snap.version
    val df = rewriteRead(snap, scoped)
    val typed = cols.map(c => col(c) -> snap.schema(c).dataType)
    val key = if (curve == "hilbert") ZOrder.hvalue(df, typed) else ZOrder.zvalue(df, typed)
    val totalBytes = scoped.map(_.size).sum
    val n = math.max(1, (totalBytes.toDouble / targetFileSize).ceil.toInt)
    val clustered = df.withColumn("__z", key)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val adds = stageWrite(clustered, snap.metadata.partitionColumns)
      .map(a => a.copy(tags = Option(a.tags).getOrElse(Map.empty) + ("clusteredBy" -> tag)))
    val params =
      (if (curve == "hilbert") Map("clusterBy" -> cols.mkString(","), "curve" -> "hilbert")
      else Map("zOrderBy" -> cols.mkString(","))) +
        ("incremental" -> (!full).toString)
    commitRewrite(snap, "OPTIMIZE", params,
      scoped, adds, Nil, Map(
        "numFilesRemoved" -> scoped.size.toLong,
        "numFilesAdded" -> adds.size.toLong,
        "numFilesSkippedAlreadyClustered" -> (inScope.size - scoped.size).toLong))
  }

  /** GENERATE symlink_format_manifest (Delta's external-reader interop):
    * write, per partition directory, a text file listing the absolute URIs
    * of the snapshot's live data files under
    * `_symlink_format_manifest/<partition>/manifest`. Engines that cannot
    * read the transaction log (Presto/Trino/Athena Hive connectors, or any
    * tool that consumes file lists) then see EXACTLY the current snapshot
    * — never uncommitted, compacted-away, or tombstoned files. Tables with
    * live deletion vectors refuse (a manifest reader cannot apply row
    * masks — Delta errors identically); run [[reorgPurge]] first. Stale
    * manifest entries from prior generations are replaced wholesale. */
  def generateSymlinkManifest(): java.nio.file.Path = {
    val snap = snapshot()
    require(snap.dvs.isEmpty,
      "GENERATE symlink_format_manifest is not supported with live deletion " +
        "vectors (external readers cannot apply row masks) — run REORG APPLY (PURGE) first")
    val root = dir.resolve("_symlink_format_manifest")
    // Build the full manifest tree in a generation directory, then publish
    // it by ATOMIC SYMLINK SWAP: `_symlink_format_manifest` is a symlink to
    // the live generation, replaced with a single rename. External readers
    // therefore always see a complete manifest — the previous generation
    // until the swap instant, the new one after; a crash at ANY point leaves
    // at most a STALE manifest, never a missing or half-populated one.
    // (Tables whose manifest predates the symlink layout take one legacy
    // two-step retire below, once.)
    // Start-of-run sweep: generations/staging/retired dirs orphaned by a
    // crashed prior run are reclaimable because the live generation is
    // exactly the one the current link names — but ONLY once they are old
    // enough that no racing GENERATE can still be building them. Without
    // the age threshold two concurrent runs would delete each other's
    // in-flight staging mid-build; with it, a racing run's fresh dirs are
    // untouchable and a crashed run's orphans are reclaimed by any run an
    // hour later. (The manifest is derived data, so the worst cost of a
    // conservative skip is a lingering orphan until the next run.)
    val sweepAgeMs = 60L * 60 * 1000L
    def oldEnough(n: String): Boolean =
      scala.util.Try(
        java.nio.file.Files.getLastModifiedTime(dir.resolve(n),
          java.nio.file.LinkOption.NOFOLLOW_LINKS).toMillis)
        .toOption.forall(System.currentTimeMillis() - _ > sweepAgeMs)
    val liveGen: Option[String] =
      if (java.nio.file.Files.isSymbolicLink(root))
        Some(java.nio.file.Files.readSymbolicLink(root).getFileName.toString)
      else None
    listDirNames(dir)
      .filter(n => n.startsWith("_symlink_format_manifest.") &&
        !liveGen.contains(n) && oldEnough(n))
      .foreach(n => graft.log.TxLog.deleteRecursively(dir.resolve(n)))
    val staging = dir.resolve(s"_symlink_format_manifest.gen-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(staging) // empty table → empty tree
    // group by LOGICAL partition (write batches land in distinct physical
    // uuid dirs — a hive-layout consumer wants one manifest per partition)
    val pcols = snap.metadata.partitionColumns
    // hive-style escaping for partition VALUES: '/', '=', '%' and control
    // chars would otherwise corrupt the manifest directory structure
    def esc(s: String): String = s.flatMap { c =>
      if (c == '/' || c == '=' || c == '%' || c == '\\' || c < ' ')
        f"%%${c.toInt}%02X"
      else c.toString
    }
    snap.files.groupBy(_.partitionValues).foreach { case (pv, files) =>
      val rel = pcols.map(c =>
        s"$c=${pv.get(c).map(esc).getOrElse("__HIVE_DEFAULT_PARTITION__")}")
      val out = rel.foldLeft(staging)(_.resolve(_))
      java.nio.file.Files.createDirectories(out)
      val body = files.map(f => dir.resolve(f.path).toUri.toString)
        .sorted.mkString("", "\n", "\n")
      java.nio.file.Files.write(out.resolve("manifest"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // The swap: stage a symlink beside the root, then rename it over the
    // root — rename over an existing symlink is atomic, so there is NO
    // window with a missing manifest. A pre-symlink-layout real directory
    // at the root cannot be renamed over; retire it first (one legacy
    // two-step per table — the retired copy is swept by the next run if
    // this one crashes between the two renames).
    var retiredName: Option[String] = None
    if (java.nio.file.Files.exists(root,
        java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !java.nio.file.Files.isSymbolicLink(root)) {
      val retired = dir.resolve(s"_symlink_format_manifest.old-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.move(root, retired)
      retiredName = Some(retired.getFileName.toString)
    }
    val tmpLink = dir.resolve(s"_symlink_format_manifest.link-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createSymbolicLink(tmpLink, staging.getFileName)
    java.nio.file.Files.move(tmpLink, root,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // Reclaim what THIS run is sure about: the generation it just replaced
    // and the legacy dir it just retired (both complete, published state —
    // ours to retire), plus anything old enough to be a crashed run's
    // orphan. A racing run's fresh staging survives (same guard as above).
    listDirNames(dir)
      .filter(n => n.startsWith("_symlink_format_manifest.") &&
        n != staging.getFileName.toString &&
        (liveGen.contains(n) || retiredName.contains(n) || oldEnough(n)))
      .foreach(n => graft.log.TxLog.deleteRecursively(dir.resolve(n)))
    root
  }

  private def listDirNames(d: java.nio.file.Path): Seq[String] = {
    if (!java.nio.file.Files.isDirectory(d)) return Seq.empty
    val s = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSeq
    } finally s.close()
  }

  /** REORG TABLE … APPLY (PURGE) analogue (Delta's deletion-vector purge):
    * rewrite files whose masked fraction is ≥ `minMaskedFraction`,
    * materializing the masks into clean files and dropping the vectors —
    * the maintenance valve that keeps per-file mask cardinality (and with
    * it every masked read's filter work) bounded as DV DML accumulates.
    * `0.0` rewrites every file carrying a mask. Unreferenced dv dirs are
    * tombstoned by [[LakeTable.commitRewrite]] and reclaimed by VACUUM. */
  def reorgPurge(
      minMaskedFraction: Double = 0.0,
      targetFileSize: Long = 128L * 1024 * 1024,
      where: Option[Column] = None): Long = {
    val snap = snapshot()
    // WHERE bounds maintenance to matching partitions (as in OPTIMIZE):
    // conservative pruning is safe — purging is data-identical
    val scoped = where.map(p => partitionPrune(snap, snap.files, Seq(p)))
      .getOrElse(snap.files)
    val doomed = scoped.filter { f =>
      snap.dvs.get(f.path).exists { d =>
        d.numDeleted > 0 &&
          (f.numRecords <= 0 ||
            d.numDeleted.toDouble / f.numRecords >= minMaskedFraction)
      }
    }
    if (doomed.isEmpty) return snap.version
    val df = rewriteRead(snap, doomed)
    val totalBytes = doomed.map(_.size).sum
    val n = math.max(1, (totalBytes.toDouble / targetFileSize).ceil.toInt)
    val pcols = snap.metadata.partitionColumns
    val packed =
      if (pcols.nonEmpty) df.repartition(n, pcols.map(col): _*)
      else df.repartition(n)
    val adds = stageWrite(packed, pcols)
    commitRewrite(snap, "REORG",
      Map("applyPurge" -> "true", "minMaskedFraction" -> minMaskedFraction.toString),
      doomed, adds, Nil, Map(
        "numFilesRemoved" -> doomed.size.toLong,
        "numFilesAdded" -> adds.size.toLong,
        "numDeletionVectorsRemoved" -> doomed.size.toLong))
  }
}

/** Z-value construction from built-in, codegen-friendly expressions only
  * (shiftright/shiftleft/bitwise and/or — no UDFs; SURVEY §2.12 notes the
  * z-order key is the lone custom-expression candidate, and even it is
  * expressible with builtins).
  *
  * Each column is mapped to an 8-bit bucket id — numerics/dates/timestamps
  * via `width_bucket` over the column's global min/max (one tiny agg job),
  * strings via a hash bucket (no range locality, but equal values cluster) —
  * then the bucket bits of the k columns are interleaved into one long.
  */
object ZOrder {

  private[table] val Bits = 8 // 256 buckets per dimension

  def zvalue(df: DataFrame, cols: Seq[(Column, DataType)]): Column = {
    val k = cols.size
    // bucket expressions hoisted OUT of the bit loop: buckets() runs the
    // global min/max bounds aggregation, and evaluating it per bit ran
    // that driver agg job 8× per z-order (r14: measured 8 identical
    // `collect at Maintain.scala` jobs, ~0.6 s of the q16 gate; one is
    // enough — the expressions are pure given the bounds)
    val bs = buckets(df, cols).zipWithIndex
    // interleave: bit b of column i lands at position b*k + i
    val terms = for {
      b <- 0 until Bits
      (bc, i) <- bs
    } yield shiftleft(shiftright(bc, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve position of the same per-dimension buckets — the
    * clustering key with no interleave discontinuities (see
    * [[graft.functions.HilbertCurve]]). */
  def hvalue(df: DataFrame, cols: Seq[(Column, DataType)]): Column =
    graft.functions.HilbertCurve.indexColumn(Bits, buckets(df, cols))

  /** Per-dimension 8-bit bucket ids shared by both curves. */
  private def buckets(df: DataFrame, cols: Seq[(Column, DataType)]): Seq[Column] = {
    def isString(dt: DataType): Boolean = dt.isInstanceOf[StringType]
    val boundedCols = cols.zipWithIndex.filter {
      case ((_, dt), _) => isRangeable(dt) || isString(dt)
    }
    val bounds: Map[Int, (Any, Any)] =
      if (boundedCols.isEmpty) Map.empty
      else {
        val aggs = boundedCols.flatMap { case ((c, dt), i) =>
          if (isString(dt)) Seq(min(c).as(s"mn$i"), max(c).as(s"mx$i"))
          else Seq(min(toDouble(c, dt)).as(s"mn$i"), max(toDouble(c, dt)).as(s"mx$i"))
        }
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        boundedCols.map { case (_, i) =>
          i -> ((r.get(r.fieldIndex(s"mn$i")), r.get(r.fieldIndex(s"mx$i"))))
        }.toMap
      }
    cols.zipWithIndex.map { case ((c, dt), i) =>
      if (isRangeable(dt)) {
        val mn = Option(bounds(i)._1).map(_.toString.toDouble).getOrElse(0.0)
        val mx0 = Option(bounds(i)._2).map(_.toString.toDouble).getOrElse(1.0)
        val mx = if (mx0 > mn) mx0 else mn + 1.0
        // width_bucket yields 1..n (0/n+1 out of range); clamp to 0..255
        least(lit(255L).cast(LongType),
          greatest(lit(0L), width_bucket(toDouble(c, dt), lit(mn), lit(mx), lit(256)) - 1))
      } else if (isString(dt)) {
        // Delta z-orders strings by a truncated prefix, not a hash: bucket
        // by the character at the first position where the column's values
        // actually differ (global common prefix of min/max, from the same
        // bounds pass). A hash bucket sprays lexicographic neighbors apart
        // — per-file min/max never tighten and prefix/range predicates
        // skip nothing. All-identical or all-null columns collapse to one
        // bucket: nothing to discriminate.
        (Option(bounds(i)._1).map(_.toString), Option(bounds(i)._2).map(_.toString)) match {
          case (Some(mn), Some(mx)) =>
            val cp = mn.zip(mx).takeWhile { case (a, b) => a == b }.length
            least(lit(255L), greatest(lit(0L),
              coalesce(ascii(substring(c, cp + 1, 1)), lit(0)).cast(LongType)))
          case _ => lit(0L)
        }
      } else {
        pmod(hash(c), lit(256)).cast(LongType)
      }
    }
  }

  private def isRangeable(dt: DataType): Boolean = dt match {
    case _: NumericType | _: DateType | _: TimestampType => true
    case _ => false
  }

  private def toDouble(c: Column, dt: DataType): Column = dt match {
    // ANSI mode forbids date->int / relies on unix_* instead
    case _: DateType => unix_date(c).cast(DoubleType)
    case _: TimestampType => unix_micros(c).cast(DoubleType)
    case _ => c.cast(DoubleType)
  }
}

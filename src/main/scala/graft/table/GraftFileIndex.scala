package graft.table

import java.nio.file.{Path => NioPath}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.log.{AddFile, BloomIndex, Pruner}

/** Planning-time file skipping wired into Catalyst itself: Spark's
  * `FileSourceStrategy` pushes every supported predicate of a query into
  * `listFiles(partitionFilters, dataFilters)`, and this index answers from
  * the transaction log's per-file footer stats — so `table.toDf
  * .filter(...)`, temp views, and `spark.sql` over graft tables all skip
  * files without going through the explicit `read(filters)` API. This is
  * the same integration point Delta's file index uses.
  *
  * The snapshot's file list is captured at construction: the returned
  * DataFrame is a consistent snapshot read no matter how long planning or
  * execution takes (and no directory listing ever happens — rootPaths exist
  * only for display).
  *
  * Partition columns need no special casing: graft keeps them as real data
  * columns (the `__p_` copies only shape the directory layout), so their
  * footer stats are ordinary min=max-per-file entries and the one Pruner
  * covers both partition pruning and data skipping.
  */
class GraftFileIndex(
    tableDir: NioPath,
    files: Seq[AddFile],
    schema: StructType,
    absPath: AddFile => String,
    bloom: BloomIndex = BloomIndex.disabled)
  extends FileIndex {

  override val rootPaths: Seq[HPath] = Seq(new HPath(tableDir.toUri))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = files.map(_.size).sum

  /** Log-exact row count of the captured snapshot's files (no DV masks —
    * DV tables plan a mask join above the relation, so the metadata-only
    * count rule never sees a bare relation for them). */
  private[graft] def totalRecords: Long = files.map(_.numRecords).sum

  private[graft] def addFiles: Seq[AddFile] = files
  private[graft] def tableSchema: StructType = schema

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] = files.map(absPath).toArray

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val preds = (partitionFilters ++ dataFilters).map(Pruner.normalize)
    val kept =
      if (preds.isEmpty) files
      else files.filter(f => preds.forall(p => Pruner.mightMatch(f, p, schema, bloom)))
    val statuses = kept.map { f =>
      new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime,
        new HPath(new java.io.File(absPath(f)).toURI))
    }
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
  }
}

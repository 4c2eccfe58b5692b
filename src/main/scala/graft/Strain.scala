package graft
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.table.LakeTable

/** Scale strain harness: the BENCH ops shapes at an arbitrary row count
  * (STRAIN_ROWS, default 5M; the round-6 evidence run uses 100M = 10× the
  * bench strain) — write, full-scan agg, rewrite-mode MERGE, DV MERGE,
  * REORG APPLY (PURGE). The point is not the absolute numbers but their
  * SHAPE vs the 10M run: linear wall growth, flat per-row cost, a driver
  * whose file lists grow with #files only, and no OOM at 10× — the local
  * stand-in for the 1000-executor claim. */
object Strain {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(32, "strain")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[strain] $label%-28s ${s}%8.2f s"); (a, s)
    }
    val n = sys.env.getOrElse("STRAIN_ROWS", "5000000").toLong
    val gen = spark.range(n)
      .withColumn("user_id", concat(lit("user_"), col("id") % 100000))
      .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
      .withColumn("day", date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("id") % 30).cast("int")))
    val dir = Files.createTempDirectory("strain").resolve("t").toString
    // row tracking ON: the write path pays the id-assignment arithmetic
    // (driver-side, O(#files)) and the resolution leg below proves the
    // broadcast-map claim at strain scale
    val t = LakeTable.create(spark, dir, gen.schema,
      properties = Map("graft.enableRowTracking" -> "true"))
    val (_, wSec) = timed(s"write $n rows")(t.append(gen))
    println(f"[strain] write_rows_per_sec=${n / wSec}%.0f files=${t.snapshot().numFiles}")
    timed("full read agg")(t.read().agg(sum("amount")).collect())
    // row-id resolution at scale: ids resolve via ONE broadcast of the
    // per-file base map (O(#files) driver bytes) — the scan itself never
    // shuffles; distinct-count forces every id to materialize
    val (rids, ridSec) = timed(s"withRowIds distinct over $n")(
      t.withRowIds().agg(countDistinct("_row_id")).collect()(0).getLong(0))
    require(rids == n, s"row-id resolution lost rows: $rids of $n")
    println(f"[strain] rowid_resolve_rows_per_sec=${n / ridSec}%.0f")

    def src(tag: String) = spark.range(0, n, 10)
      .withColumn("user_id", concat(lit(tag), col("id")))
      .withColumn("amount", lit(java.math.BigDecimal.valueOf(1)).cast("decimal(18,2)"))
      .withColumn("day", lit(java.sql.Date.valueOf("2024-02-01")))
    val (_, mSec) = timed(s"merge ${n / 10} upserts (rewrite)")(
      t.merge(src("u_"), col("target.id") === col("source.id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    println(f"[strain] merge_rows_per_sec=${n / 10 / mSec}%.0f")

    t.setProperties(Map("graft.enableDeletionVectors" -> "true"))
    val (_, dvSec) = timed(s"merge ${n / 10} upserts (DV)")(
      t.merge(src("v_"), col("target.id") === col("source.id"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    println(f"[strain] dv_merge_rows_per_sec=${n / 10 / dvSec}%.0f")
    val snapDv = t.snapshot()
    // vectors from one commit share a dvPath dir — walk each dir once
    val dvBytes = snapDv.dvs.values.map(_.dvPath).toSet.toSeq.map { rel: String =>
      val p = java.nio.file.Paths.get(dir, rel)
      val s = java.nio.file.Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } finally s.close()
    }.sum
    println(s"[strain] dv_masked_files=${snapDv.dvs.size} dv_bytes=$dvBytes")

    timed("delete 1% (DV)")(t.delete(col("id") % 100 === 7))
    val (_, reorgSec) = timed("reorg purge")(t.reorgPurge())
    println(f"[strain] reorg_sec=${reorgSec}%.2f vectors_after=${t.snapshot().dvs.size}")
    println(s"[strain] files=${t.snapshot().numFiles} rows=${t.read().count()}")
    timed("zorder (incremental)")(t.optimizeZOrder(Seq("user_id", "day")))
    timed("point query after zorder")(t.read(Seq(col("user_id") === "user_777")).count())
    // UniForm export at METADATA scale: file count is the export's only
    // cost axis (manifest rows, no Spark job), so strain it directly with
    // a many-small-files table — the 100 TB shape is millions of files,
    // and the claim that must hold is first export O(live files), every
    // re-export O(churn) via manifest reuse
    val mfiles = sys.env.getOrElse("STRAIN_EXPORT_FILES", "20000").toInt
    val dir2 = Files.createTempDirectory("strain-export").resolve("t").toString
    val gen2 = spark.range(mfiles.toLong)
      .withColumn("payload", concat(lit("row_"), col("id")))
    val t2 = LakeTable.create(spark, dir2, gen2.schema,
      properties = Map("graft.uniform.manifestMaxEntries" -> "100000"))
    timed(s"write $mfiles one-row files")(t2.append(gen2.repartition(mfiles)))
    val (_, expSec) = timed(s"uniform export ($mfiles files)")(
      t2.generateIcebergMetadata(recordCommit = false))
    t2.append(spark.range(mfiles.toLong, mfiles + 1L)
      .withColumn("payload", lit("tail")).coalesce(1))
    val (_, expIncrSec) = timed("uniform re-export after 1-file append")(
      t2.generateIcebergMetadata(recordCommit = false))
    println(f"[strain] uniform_export_sec=$expSec%.2f " +
      f"uniform_incr_export_sec=$expIncrSec%.2f files=$mfiles")
    graft.log.TxLog.deleteRecursively(java.nio.file.Paths.get(dir2).getParent)
    spark.stop()
    graft.log.TxLog.deleteRecursively(java.nio.file.Paths.get(dir).getParent)
  }
}

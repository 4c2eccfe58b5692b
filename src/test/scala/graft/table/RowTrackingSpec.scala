package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.TxLog

/** Row tracking: stable table-unique row ids (baseRowId + materialization
  * across rewrites + the domain-metadata high-water mark). The invariants:
  * (1) ids are unique and dense per allocation; (2) data-identical
  * rewrites (OPTIMIZE/Z-ORDER/REORG) preserve every (id → row) pairing;
  * (3) DV DML never moves ids; (4) ids are NEVER reused, across deletes,
  * restores, checkpoints, and clones. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private val rtProps = Map("graft.enableRowTracking" -> "true")

  private def freshTable(prefix: String,
      props: Map[String, String] = rtProps): LakeTable = {
    val dir = tmpDir(prefix).resolve("t").toString
    LakeTable.create(spark, dir,
      StructType(Seq(
        StructField("id", LongType), StructField("name", StringType))),
      partitionColumns = Nil, properties = props)
  }

  private def oneFile(ids: Range) =
    ids.map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(1).sortWithinPartitions("id")

  private def pairs(t: LakeTable): Map[Long, Long] =
    t.withRowIds().select(col("_row_id"), col("id"))
      .as[(Long, Long)].collect().toMap

  test("append assigns dense unique ids; second append continues the range") {
    val t = freshTable("rt-basic")
    t.append(oneFile(0 until 40))
    t.append(oneFile(40 until 100))
    val p = pairs(t)
    p.size shouldBe 100
    p.keySet shouldBe (0L until 100L).toSet
    // single sorted file per append → id order is insertion order
    p(0L) shouldBe 0L
    p(39L) shouldBe 39L
    val proto = t.log.snapshot().protocol
    proto.writerSet should contain allOf ("rowTracking", "domainMetadata")
  }

  test("OPTIMIZE compaction preserves every (row_id -> row) pairing") {
    val t = freshTable("rt-compact")
    t.append(oneFile(0 until 30))
    t.append(oneFile(30 until 50))
    val before = pairs(t)
    t.optimizeCompact() should be > 2L
    t.log.snapshot().files.size shouldBe 1
    pairs(t) shouldBe before
    // and the compacted FILE got a fresh base while rows kept materialized
    // ids — a further compaction round-trips too
    t.append(oneFile(50 until 60))
    t.optimizeCompact()
    pairs(t).filterKeys(_ < 50).toMap shouldBe before
  }

  test("Z-ORDER rewrite preserves ids under reordering") {
    val t = freshTable("rt-zorder")
    t.append(oneFile(0 until 64))
    t.append(oneFile(64 until 128))
    val before = pairs(t)
    t.optimizeZOrder(Seq("id"), full = true)
    pairs(t) shouldBe before
  }

  test("DV delete keeps survivor ids; purge rewrite keeps them too") {
    val t = freshTable("rt-dv",
      rtProps + ("graft.enableDeletionVectors" -> "true"))
    t.append(oneFile(0 until 50))
    val before = pairs(t)
    t.delete(col("id") % 5 === 0)
    val after = pairs(t)
    after.size shouldBe 40
    after.foreach { case (rid, id) => before(rid) shouldBe id }
    t.reorgPurge(0.0)
    t.log.snapshot().dvs shouldBe empty
    pairs(t) shouldBe after
  }

  test("ids are never reused: delete-then-append allocates above the mark") {
    val t = freshTable("rt-reuse",
      rtProps + ("graft.enableDeletionVectors" -> "false"))
    t.append(oneFile(0 until 20))
    t.delete(lit(true)) // rewrite-mode full delete drops every file
    t.read().count() shouldBe 0
    t.append(oneFile(100 until 110))
    val p = pairs(t)
    p.keys.min should be >= 20L // old range stays burned
    p.size shouldBe 10
  }

  test("rewrite-mode UPDATE preserves ids; only updated rows bump commit version") {
    val t = freshTable("rt-upd",
      rtProps + ("graft.enableDeletionVectors" -> "false"))
    t.append(oneFile(0 until 30))
    t.append(oneFile(30 until 60))
    val before = pairs(t)
    val v = t.update(col("id") < 10, Map("name" -> lit("x")))
    pairs(t) shouldBe before // every row keeps its id through the rewrite
    val rcv = t.withRowIds().select(col("id"), col("_row_commit_version"))
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach(i => rcv(i) shouldBe v)   // updated: bumped
    (10L until 30L).foreach(i => rcv(i) shouldBe 1L) // co-located survivors: kept
    (30L until 60L).foreach(i => rcv(i) shouldBe 2L) // untouched file: kept
  }

  test("rewrite-mode DELETE preserves survivor ids and commit versions") {
    val t = freshTable("rt-del",
      rtProps + ("graft.enableDeletionVectors" -> "false"))
    t.append(oneFile(0 until 40))
    val before = pairs(t)
    t.delete(col("id") % 4 === 0)
    val after = pairs(t)
    after.size shouldBe 30
    after.foreach { case (rid, id) => before(rid) shouldBe id }
  }

  test("DV-mode UPDATE: post-image rows keep their ids with a bumped version") {
    val t = freshTable("rt-dvupd",
      rtProps + ("graft.enableDeletionVectors" -> "true"))
    t.append(oneFile(0 until 25))
    val before = pairs(t)
    val v = t.update(col("id") % 5 === 1, Map("name" -> lit("upd")))
    pairs(t) shouldBe before // mask+append moved rows, never ids
    val rcv = t.withRowIds().select(col("id"), col("_row_commit_version"))
      .as[(Long, Long)].collect().toMap
    (0L until 25L).foreach { i =>
      rcv(i) shouldBe (if (i % 5 == 1) v else 1L)
    }
  }

  private def rcvMap(t: LakeTable): Map[Long, Long] =
    t.withRowIds().select(col("id"), col("_row_commit_version"))
      .as[(Long, Long)].collect().toMap

  private def mergeCase(t: LakeTable): Long = {
    t.append(oneFile(0 until 30)) // v1
    val src = (20 until 40).map(i => (i.toLong, s"s$i")).toDF("id", "name")
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
  }

  private def assertMergePreserved(t: LakeTable, v: Long): Unit = {
    val p = pairs(t)
    p.size shouldBe 40
    p.keySet.size shouldBe 40 // unique, inserts included
    // every pre-existing row (copied or updated) keeps its id
    val idsBefore = (0L until 30L)
    idsBefore.foreach(i => p.values.toSet should contain(i))
    val rcv = rcvMap(t)
    (0L until 20L).foreach(i => rcv(i) shouldBe 1L) // copies keep version
    (20L until 40L).foreach(i => rcv(i) shouldBe v) // updates+inserts bump
  }

  test("MERGE (low-shuffle path) preserves target ids; inserts get fresh ones") {
    val t = freshTable("rt-merge")
    val before = { t.append(oneFile(0 until 30)); pairs(t) }
    val src = (20 until 40).map(i => (i.toLong, s"s$i")).toDF("id", "name")
    val v = t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val p = pairs(t)
    before.foreach { case (rid, id) => p(rid) shouldBe id }
    assertMergePreserved(t, v)
  }

  test("MERGE (DV low-shuffle path) preserves ids under mask+append") {
    val t = freshTable("rt-merge-dv",
      rtProps + ("graft.enableDeletionVectors" -> "true"))
    val v = mergeCase(t)
    assertMergePreserved(t, v)
  }

  test("MERGE (general full-outer path, CDF on) preserves ids") {
    val t = freshTable("rt-merge-cdf",
      rtProps + ("graft.enableChangeDataFeed" -> "true"))
    val v = mergeCase(t)
    assertMergePreserved(t, v)
  }

  test("enabling on an existing table backfills metadata-only") {
    val t = freshTable("rt-backfill", Map.empty)
    t.append(oneFile(0 until 25))
    t.append(oneFile(25 until 45))
    val filesBefore = t.log.snapshot().files.map(_.path).toSet
    t.setProperties(rtProps)
    // same physical files — the enable commit re-emitted actions only
    val snap = t.log.snapshot()
    snap.files.map(_.path).toSet shouldBe filesBefore
    snap.files.foreach(_.baseRowId should not be null)
    val p = pairs(t)
    p.size shouldBe 45
    p.keySet shouldBe (0L until 45L).toSet
  }

  test("RESTORE keeps the restored rows' original ids and never reuses") {
    val t = freshTable("rt-restore")
    t.append(oneFile(0 until 10))   // v1: ids 0..9
    val v1 = t.version
    t.append(oneFile(10 until 30))  // v2: ids 10..29
    t.restoreToVersion(v1)
    pairs(t) shouldBe (0L until 10L).map(i => i -> i).toMap
    t.append(oneFile(50 until 55))
    // the restored-away range 10..29 stays burned
    pairs(t).keys.max should be >= 30L
  }

  test("high-water mark survives checkpointed snapshot resolution") {
    val t = freshTable("rt-ckpt", rtProps + ("graft.checkpointInterval" -> "2"))
    (0 until 6).foreach(i => t.append(oneFile(i * 10 until (i + 1) * 10)))
    t.log.listCheckpoints() should not be empty
    // a fresh TxLog resolves from the newest checkpoint — the domain must
    // ride it, or the next allocation would reuse ids
    val t2 = LakeTable.forPath(spark, t.dir.toString)
    t2.append(oneFile(100 until 105))
    val p = pairs(t2)
    p.size shouldBe 65
    p.keySet.size shouldBe 65
    p.keySet shouldBe (0L until 65L).toSet
  }

  test("shallow clone carries ids and the high-water mark") {
    val t = freshTable("rt-clone")
    t.append(oneFile(0 until 30))
    val cdir = tmpDir("rt-clone-tgt").resolve("c").toString
    val c = t.cloneTo(cdir, shallow = true)
    val cp = c.withRowIds().select(col("_row_id"), col("id"))
      .as[(Long, Long)].collect().toMap
    cp shouldBe pairs(t)
    c.append(oneFile(100 until 110))
    val cp2 = c.withRowIds().select(col("_row_id")).as[Long].collect()
    cp2.length shouldBe 40
    cp2.toSet.size shouldBe 40 // clone allocations continue above the mark
  }

  test("row commit version tracks the producing commit and survives OPTIMIZE") {
    val t = freshTable("rt-rcv")
    t.append(oneFile(0 until 10)) // v1
    t.append(oneFile(10 until 20)) // v2
    val rcv = t.withRowIds().select(col("id"), col("_row_commit_version"))
      .as[(Long, Long)].collect().toMap
    (0L until 10L).foreach(i => rcv(i) shouldBe 1L)
    (10L until 20L).foreach(i => rcv(i) shouldBe 2L)
    t.optimizeCompact()
    val rcv2 = t.withRowIds().select(col("id"), col("_row_commit_version"))
      .as[(Long, Long)].collect().toMap
    rcv2 shouldBe rcv // preserved through the rewrite, not bumped
  }

  test("withRowIds refuses when row tracking is off") {
    val t = freshTable("rt-off", Map.empty)
    t.append(oneFile(0 until 5))
    val e = intercept[IllegalArgumentException](t.withRowIds())
    e.getMessage should include("row tracking is not enabled")
  }
}

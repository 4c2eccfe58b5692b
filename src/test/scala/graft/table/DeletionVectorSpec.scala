package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion-vector DELETE: rows are masked, not rewritten. Covers masking
  * correctness, accumulation, interplay with UPDATE/MERGE/OPTIMIZE/
  * RESTORE/CLONE/VACUUM/CDF/time travel, and escaped paths. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private val dvProps = Map("graft.enableDeletionVectors" -> "true")

  private def freshTable(name: String, props: Map[String, String] = dvProps): LakeTable = {
    val df = (0 until 300).map(i => (i.toLong, s"n$i", i % 3)).toDF("id", "name", "b")
    val t = LakeTable.create(spark, tmpDir(name).resolve("t").toString, df.schema,
      properties = props)
    // several files so pruning/probing paths engage
    (0 until 3).foreach(k => t.append(df.filter(col("id") % 3 === k)))
    t
  }

  test("DV delete masks rows without rewriting data files") {
    val t = freshTable("dv-basic")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.delete(col("id") < 50L)
    t.snapshot().files.map(_.path).toSet shouldBe filesBefore // no rewrite
    t.snapshot().dvs should not be empty
    t.read().count() shouldBe 250
    t.read().filter(col("id") < 50L).count() shouldBe 0
    // commit metrics carry the masked-row count
    t.history(Some(1)).select("operationMetrics").collect()
      .head.getMap[String, String](0)("numDeletedRows") shouldBe "50"
    // snapshot row accounting reflects masks
    t.snapshot().numRecords shouldBe 250
  }

  test("successive DV deletes accumulate; old vectors get tombstoned and vacuumed") {
    val t = freshTable("dv-accum")
    t.delete(col("id") < 50L)
    t.delete(col("id") >= 50L && col("id") < 80L)
    t.read().count() shouldBe 220
    // one vector per touched file, all pointing at the latest dv dir
    val dvDirs = t.snapshot().dvs.values.map(_.dvPath).toSet
    dvDirs.size shouldBe 1
    // the replaced vector dir is tombstoned: a zero-retention vacuum
    // removes it while the live vector survives
    val removed = t.vacuum(retainHours = 0.0)
    removed.foreach(p => p should include("/dv/"))
    t.read().count() shouldBe 220
    t.read().filter(col("id") < 80L).count() shouldBe 0
  }

  test("filters + pruning still correct on masked tables") {
    val t = freshTable("dv-filter")
    t.delete(col("id") % 2 === 0)
    t.read(Seq(col("id") < 100L)).count() shouldBe 50
    t.read(Seq(col("b") === 1)).as[(Long, String, Int)].collect()
      .foreach { case (id, _, b) => { b shouldBe 1; (id % 2) shouldBe 1L } }
  }

  test("DV UPDATE masks old versions and appends only the changed rows") {
    val t = freshTable("dv-upd-mode")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    t.update(col("id") < 30L, Map("name" -> lit("upd")))
    // original files untouched; exactly one small appended file set
    filesBefore.subsetOf(t.snapshot().files.map(_.path).toSet) shouldBe true
    val newFiles = t.snapshot().files.map(_.path).toSet.diff(filesBefore)
    newFiles should not be empty
    t.read().count() shouldBe 300
    t.read().filter(col("name") === "upd").count() shouldBe 30
    t.read().filter(col("id") < 30L && col("name") =!= "upd").count() shouldBe 0
    t.history(Some(1)).select("operationMetrics").collect()
      .head.getMap[String, String](0)("numUpdatedRows") shouldBe "30"
    // idempotent-ish second update over the same predicate: masks accumulate
    // on the original files AND on the appended file's rows
    t.update(col("id") < 30L, Map("name" -> lit("upd2")))
    t.read().count() shouldBe 300
    t.read().filter(col("name") === "upd2").count() shouldBe 30
  }

  test("DV UPDATE with CDF emits pre/post images") {
    val t = freshTable("dv-upd-cdf",
      dvProps + ("graft.enableChangeDataFeed" -> "true"))
    t.update(col("id") < 10L, Map("name" -> lit("u")))
    val v = t.version
    val ch = t.changes(v, Some(v))
    ch.filter(col("_change_type") === "update_preimage").count() shouldBe 10
    ch.filter(col("_change_type") === "update_postimage").count() shouldBe 10
  }

  test("UPDATE after DV delete does not resurrect masked rows") {
    val t = freshTable("dv-update")
    t.delete(col("id") < 100L)
    t.update(col("id") >= 100L && col("id") < 150L, Map("name" -> lit("upd")))
    t.read().count() shouldBe 200
    t.read().filter(col("name") === "upd").count() shouldBe 50
    t.read().filter(col("id") < 100L).count() shouldBe 0
    // rewritten files dropped their vectors
    val livePaths = t.snapshot().files.map(_.path).toSet
    t.snapshot().dvs.keySet.foreach(k => livePaths should contain(k))
  }

  test("MERGE after DV delete treats masked rows as absent") {
    val t = freshTable("dv-merge")
    t.delete(col("id") < 10L)
    val src = (5 until 15).map(i => (i.toLong, "merged", 0)).toDF("id", "name", "b")
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    // ids 5..9 were masked -> re-inserted (290 live + 5); 10..14 matched -> updated
    t.read().filter(col("name") === "merged").count() shouldBe 10
    t.read().count() shouldBe 295
  }

  test("DV MERGE masks matched rows and writes only changed rows") {
    val t = freshTable("dv-merge2")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    // ids 280..299 match (update), 300..320 are new (insert)
    val src = (280 to 320).map(i => (i.toLong, "m", 9)).toDF("id", "name", "b")
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    // no touched file was rewritten — matched rows were masked instead
    filesBefore.subsetOf(t.snapshot().files.map(_.path).toSet) shouldBe true
    t.snapshot().dvs should not be empty
    t.read().count() shouldBe 321
    t.read().filter(col("name") === "m").count() shouldBe 41
    val m = t.history(Some(1)).select("operationMetrics").collect()
      .head.getMap[String, String](0)
    m("numTargetRowsUpdated") shouldBe "20"
    m("numTargetRowsInserted") shouldBe "21"
    m("numTargetRowsCopied") shouldBe "0"
    // whenMatchedDelete under DV masks without writing
    t.merge(src.filter(col("id") < 290), col("target.id") === col("source.id"))
      .whenMatchedDelete().execute()
    t.read().count() shouldBe 311
    t.read().filter(col("id") >= 280 && col("id") < 290).count() shouldBe 0
  }

  test("OPTIMIZE materializes masks; time travel and RESTORE keep DV state") {
    val t = freshTable("dv-opt")
    val vBefore = t.version
    t.delete(col("id") < 30L)
    val vMasked = t.version
    t.optimizeCompact()
    t.read().count() shouldBe 270
    t.snapshot().dvs shouldBe empty // compaction rewrote masked files
    // time travel: before the delete all rows; at the delete the mask applies
    t.versionAsOf(vBefore).count() shouldBe 300
    t.versionAsOf(vMasked).count() shouldBe 270
    // restore to the masked version keeps the mask; to before clears it
    t.restoreToVersion(vMasked)
    t.read().count() shouldBe 270
    t.restoreToVersion(vBefore)
    t.read().count() shouldBe 300
  }

  test("distributed anti-join fallback path (broadcastMaxMasks=0) reads identically") {
    val t = freshTable("dv-fallback")
    t.delete(col("id") % 7 === 3)
    t.update(col("id") % 11 === 5, Map("name" -> concat(col("name"), lit("!"))))
    val broadcastRows = t.read().orderBy("id").collect()
    spark.conf.set("graft.dv.broadcastMaxMasks", "0")
    try {
      // fresh table handle: the broadcast cache must not serve this read
      val t2 = LakeTable.forPath(spark, t.dir.toString)
      val fallbackRows = t2.read().orderBy("id").collect()
      fallbackRows shouldBe broadcastRows
      t2.toDf.count() shouldBe broadcastRows.length.toLong
    } finally spark.conf.unset("graft.dv.broadcastMaxMasks")
  }

  test("MERGE with whenNotMatchedBySource under DVs masks instead of rewriting") {
    val t = freshTable("dv-nmbs")
    val filesBefore = t.snapshot().files.map(_.path).toSet
    val src = (0 until 300 by 2).map(i => (i.toLong, s"s$i", i % 3)).toDF("id", "name", "b")
    t.merge(src, col("target.id") === col("source.id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedBySourceDelete(Some(col("target.id") >= 200L))
      .execute()
    // evens updated (150), odds < 200 kept (100), odds >= 200 deleted (50)
    t.read().count() shouldBe 250
    t.read().filter(col("id") % 2 === 0 && !col("name").startsWith("s")).count() shouldBe 0
    t.read().filter(col("id") % 2 === 1 && col("id") >= 200L).count() shouldBe 0
    // the original files survive — changed rows were masked + re-appended
    filesBefore.subsetOf(t.snapshot().files.map(_.path).toSet) shouldBe true
    t.snapshot().dvs should not be empty
  }

  test("REORG APPLY (PURGE) materializes masks into clean files") {
    val t = freshTable("dv-reorg")
    t.delete(col("id") < 30L)
    t.delete(col("id") >= 270L)
    t.snapshot().dvs should not be empty
    val v = t.reorgPurge()
    v should be > 0L
    t.snapshot().dvs shouldBe empty
    t.read().count() shouldBe 240
    t.read().filter(col("id") < 30L || col("id") >= 270L).count() shouldBe 0
    // the purge commit is a REORG in the history
    t.history(Some(1)).select("operation").collect().head.getString(0) shouldBe "REORG"
    // purged dv dirs are tombstoned → zero-retention vacuum reclaims them
    t.vacuum(retainHours = 0.0).exists(_.contains("/dv/")) shouldBe true
    t.read().count() shouldBe 240
  }

  test("REORG via SQL + fraction threshold only rewrites heavily-masked files") {
    val t = freshTable("dv-reorg-thr")
    // id%3==0 lands in file 0: mask most of one file, a sliver of others
    t.delete(col("id") % 3 === 0 && col("id") < 270L) // 90 rows in file 0
    t.delete(col("id") === 1L) // 1 row in file 1
    val masked = t.snapshot().dvs.size
    masked should be >= 2
    t.reorgPurge(minMaskedFraction = 0.5)
    // only the heavily-masked file was rewritten; the sliver mask remains
    t.snapshot().dvs.size should be < masked
    t.snapshot().dvs should not be empty
    t.read().count() shouldBe 209
    // SQL form purges the rest
    val sql = GraftSql(spark)
    sql.run(s"REORG TABLE ${t.dir} APPLY (PURGE)")
    t.snapshot().dvs shouldBe empty
    t.read().count() shouldBe 209
  }

  test("REORG WHERE scopes the purge to matching partitions") {
    val df = (0 until 300).map(i => (i.toLong, s"n$i", i % 3)).toDF("id", "name", "b")
    val t = LakeTable.create(spark,
      tmpDir("dv-reorg-where").resolve("t").toString, df.schema,
      partitionColumns = Seq("b"), properties = dvProps)
    t.append(df)
    t.delete(col("id") < 30L) // masks land in every partition
    val maskedBefore = t.snapshot().dvs.size
    maskedBefore should be >= 3
    GraftSql(spark).run(s"REORG TABLE ${t.dir} WHERE b = 1 APPLY (PURGE)")
    // only partition b=1 was purged; other partitions keep their vectors
    val remaining = t.snapshot().dvs.size
    remaining should be < maskedBefore
    remaining should be >= 1
    t.read().count() shouldBe 270
    t.read().filter(col("id") < 30L).count() shouldBe 0
  }

  test("auto-purge property compacts vectors past the fraction threshold") {
    val t = freshTable("dv-autopurge",
      dvProps + ("graft.autoOptimize.purgeDvFraction" -> "0.25"))
    t.delete(col("id") < 150L) // 50% of every file masked → purge fires
    t.snapshot().dvs shouldBe empty
    t.read().count() shouldBe 150
    t.history(Some(1)).select("operation").collect().head.getString(0) shouldBe "REORG"
  }

  test("CDF emits delete rows for DV deletes; synthesis respects masks") {
    val t = freshTable("dv-cdf",
      dvProps + ("graft.enableChangeDataFeed" -> "true"))
    t.delete(col("id") < 20L)
    val v = t.version
    val ch = t.changes(v, Some(v))
    ch.filter(col("_change_type") === "delete").count() shouldBe 20
    // overwrite after the delete: synthesized delete events only cover live rows
    t.overwrite(Seq((999L, "x", 0)).toDF("id", "name", "b"))
    val ov = t.changes(t.version, Some(t.version))
    ov.filter(col("_change_type") === "delete").count() shouldBe 280
  }

  test("shallow clone carries vectors; deep clone materializes them") {
    val t = freshTable("dv-clone")
    t.delete(col("id") < 40L)
    val sh = t.cloneTo(tmpDir("dv-clone-sh").resolve("c").toString, shallow = true)
    sh.read().count() shouldBe 260
    val dp = t.cloneTo(tmpDir("dv-clone-dp").resolve("c").toString, shallow = false)
    dp.read().count() shouldBe 260
    dp.snapshot().dvs shouldBe empty
  }

  test("DV delete on escaped paths (spaces, '=', '%') masks correctly") {
    val df = (0 until 200).map(i => (i.toLong, Seq("a b", "x=y", "p%q", "c:d")(i % 4)))
      .toDF("id", "cat")
    val t = LakeTable.create(spark,
      tmpDir("dv-esc").resolve("t dir").toString, df.schema,
      partitionColumns = Seq("cat"), properties = dvProps)
    (0 until 2).foreach(k => t.append(df.filter(col("id") % 2 === k)))
    t.delete(col("id") < 100L)
    t.read().count() shouldBe 100
    t.read().filter(col("id") < 100L).count() shouldBe 0
  }

  test("checkpointed snapshots preserve vectors (log replay across checkpoints)") {
    val t = freshTable("dv-ckpt")
    t.delete(col("id") < 25L)
    // force past a checkpoint boundary (every 10 commits)
    (0 until 9).foreach(_ => t.setProperties(Map("tick" -> System.nanoTime().toString)))
    t.log.listCheckpoints() should not be empty
    // a fresh instance resolves through the checkpoint
    val t2 = LakeTable.forPath(spark, t.dir.toString)
    t2.read().count() shouldBe 275
    t2.snapshot().dvs should not be empty
  }
}

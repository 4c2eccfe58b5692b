package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DROP FEATURE (Delta 3.4's feature removal): a capability leaves the
  * protocol only when nothing depends on it anymore; deletionVectors
  * additionally requires TRUNCATE HISTORY (historical commits carry DV
  * actions an old reader would choke on). Invariants: the live state
  * survives truncation bit-for-bit, DESCRIBE HISTORY survives (the
  * boundary checkpoint carries the commit infos), and reads below the
  * boundary refuse with a clean missing-version error. */
class DropFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String, props: Map[String, String]): LakeTable =
    LakeTable.create(spark, tmpDir(prefix).resolve("t").toString,
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))),
      partitionColumns = Nil, properties = props)

  test("checkConstraints drops once no constraint remains; refuses while one lives") {
    val t = fresh("df-ck", Map.empty)
    t.addConstraint("kpos", "k >= 0")
    t.log.snapshot().protocol.writerSet should contain("checkConstraints")
    an[IllegalArgumentException] should be thrownBy t.dropFeature("checkConstraints")
    t.dropConstraint("kpos")
    t.dropFeature("checkConstraints")
    t.log.snapshot().protocol.writerSet should not contain "checkConstraints"
    // re-adding a constraint re-stamps the feature (adoption is normal)
    t.addConstraint("kpos2", "k >= 0")
    t.log.snapshot().protocol.writerSet should contain("checkConstraints")
  }

  test("deletionVectors: purge + property-off + TRUNCATE HISTORY, via SQL") {
    val t = fresh("df-dv", Map("graft.enableDeletionVectors" -> "true"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    t.delete(col("k") === 2) // DV mask + historical DV action
    val sql = GraftSql(spark)
    // property still on
    an[IllegalArgumentException] should be thrownBy
      t.dropFeature("deletionVectors", truncateHistory = true)
    t.setProperties(Map("graft.enableDeletionVectors" -> "false"))
    // live mask still present
    an[IllegalArgumentException] should be thrownBy
      t.dropFeature("deletionVectors", truncateHistory = true)
    t.reorgPurge()
    // history still carries DV actions: plain drop refuses
    an[IllegalArgumentException] should be thrownBy t.dropFeature("deletionVectors")
    val before = t.read().orderBy("k").as[(Long, String)].collect()
    val historyBefore = t.history().count()
    sql.run(s"ALTER TABLE '${t.dir}' DROP FEATURE deletionVectors TRUNCATE HISTORY")
    val t2 = LakeTable.forPath(spark, t.dir.toString) // fresh replay: checkpoint-based
    t2.log.snapshot().protocol.writerSet should not contain "deletionVectors"
    t2.log.snapshot().protocol.readerSet should not contain "deletionVectors"
    t2.read().orderBy("k").as[(Long, String)].collect() shouldBe before
    // DESCRIBE HISTORY survives the truncation (checkpoint carries commits)
    t2.history().count() shouldBe historyBefore + 1 // + the DROP FEATURE commit
    // below-boundary reads refuse cleanly
    an[IllegalArgumentException] should be thrownBy t2.versionAsOf(1).collect()
    // the boundary is the earliest version now
    val earliest = t2.log.listVersions().head
    earliest should be > 0L
    // and the table keeps working
    t2.append(Seq((4L, "d")).toDF("k", "v"))
    t2.read().count() shouldBe 3
  }

  test("typeWidening drops only while unused; inCommitTimestamp needs property off") {
    val t = fresh("df-tw", Map(
      "graft.enableTypeWidening" -> "true",
      "graft.enableInCommitTimestamps" -> "true"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    an[IllegalArgumentException] should be thrownBy t.dropFeature("typeWidening")
    an[IllegalArgumentException] should be thrownBy t.dropFeature("inCommitTimestamp")
    t.setProperties(Map(
      "graft.enableTypeWidening" -> "false",
      "graft.enableInCommitTimestamps" -> "false"))
    t.dropFeature("typeWidening")
    t.dropFeature("inCommitTimestamp")
    val p = t.log.snapshot().protocol
    p.writerSet should not contain "typeWidening"
    p.writerSet should not contain "inCommitTimestamp"
    // a table that APPLIED a widen refuses the plain drop (needs TRUNCATE
    // HISTORY — the rewrite+sweep path, covered below)
    val t2 = fresh("df-tw2", Map("graft.enableTypeWidening" -> "true"))
    t2.addColumns(Seq(StructField("n", IntegerType)))
    t2.widenColumn("n", LongType)
    t2.setProperties(Map("graft.enableTypeWidening" -> "false"))
    an[IllegalArgumentException] should be thrownBy t2.dropFeature("typeWidening")
    // contract features refuse (their traces ARE the data contract)
    val t3 = fresh("df-rt", Map("graft.enableRowTracking" -> "true"))
    an[UnsupportedOperationException] should be thrownBy t3.dropFeature("rowTracking")
    // and an absent feature refuses by name
    an[IllegalArgumentException] should be thrownBy t2.dropFeature("columnMapping")
  }

  test("typeWidening TRUNCATE HISTORY: rewrites stale-typed files, clears records, sweeps history") {
    import graft.log.{Stats, TypeWidening}
    val t = LakeTable.create(spark, tmpDir("df-tw-th").resolve("t").toString,
      StructType(Seq(StructField("k", LongType), StructField("v", IntegerType),
        StructField("r", FloatType))),
      partitionColumns = Nil, properties = Map("graft.enableTypeWidening" -> "true"))
    t.append(Seq((1L, 10, 0.1f), (2L, 20, 0.25f)).toDF("k", "v", "r")) // pre-widen (INT/FLOAT parquet)
    t.widenColumn("v", LongType)
    t.widenColumn("r", DoubleType) // stat-lossy: pruning disabled for stale files
    t.append(Seq((3L, Int.MaxValue.toLong + 5L, 0.5d)).toDF("k", "v", "r")) // post-widen, tagged
    val snap0 = t.log.snapshot()
    // the post-widen file's change-count tags prove a current-type write
    val tagged = snap0.files.filter(f =>
      f.tag(TypeWidening.tagKey(snap0.schema("v"))).contains("1") &&
        f.tag(TypeWidening.tagKey(snap0.schema("r"))).contains("1")).map(_.path)
    tagged should have size 1
    // property still on → refuse even with TRUNCATE HISTORY
    an[IllegalArgumentException] should be thrownBy
      t.dropFeature("typeWidening", truncateHistory = true)
    t.setProperties(Map("graft.enableTypeWidening" -> "false"))
    // applied changes → the plain drop refuses and names the escape hatch
    val e = the[IllegalArgumentException] thrownBy t.dropFeature("typeWidening")
    e.getMessage should include("TRUNCATE HISTORY")
    val before = t.read().orderBy("k").as[(Long, Long, Double)].collect()
    t.dropFeature("typeWidening", truncateHistory = true)
    val t2 = LakeTable.forPath(spark, t.dir.toString) // fresh checkpoint-based replay
    val snap = t2.log.snapshot()
    snap.protocol.writerSet should not contain "typeWidening"
    snap.protocol.readerSet should not contain "typeWidening"
    // the change records left with the feature
    TypeWidening.hasChanges(snap.schema("v")) shouldBe false
    TypeWidening.hasChanges(snap.schema("r")) shouldBe false
    // live state bit-identical
    t2.read().orderBy("k").as[(Long, Long, Double)].collect() shouldBe before
    // the current-type file was left in place; only the stale file rewrote
    snap.files.map(_.path) should contain allElementsOf tagged
    // EVERY live file now physically carries the current types — no file
    // needs the widening conversion an old reader lacks
    snap.files.foreach { f =>
      val ps = spark.read.parquet(t2.dir.resolve(f.path).toString).schema
      withClue(s"${f.path}: ") {
        ps("v").dataType shouldBe LongType
        ps("r").dataType shouldBe DoubleType
      }
    }
    // pruning is re-enabled: exact min/max on the float→double column again
    Stats.exactBounds(snap.files, snap.schema("r")) should not be None
    // history below the boundary swept (the pre-widen schema is unreadable)
    an[IllegalArgumentException] should be thrownBy t2.versionAsOf(0).collect()
    // and the table keeps working
    t2.append(Seq((4L, 40L, 1.5d)).toDF("k", "v", "r"))
    t2.read().count() shouldBe 4
  }

  test("truncation works on the in-memory store (object-store semantics)") {
    val prev = graft.log.LogStore.default
    graft.log.LogStore.default = new graft.log.InMemoryLogStore
    try {
      val t = fresh("df-mem", Map("graft.enableDeletionVectors" -> "true"))
      t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      t.delete(col("k") === 2)
      t.setProperties(Map("graft.enableDeletionVectors" -> "false"))
      t.reorgPurge()
      t.dropFeature("deletionVectors", truncateHistory = true)
      val t2 = LakeTable.forPath(spark, t.dir.toString)
      t2.read().as[(Long, String)].collect() shouldBe Array((1L, "a"))
      t2.log.snapshot().protocol.writerSet should not contain "deletionVectors"
    } finally graft.log.LogStore.default = prev
  }
}

package graft.table

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec

/** Whole-table lifecycle fuzz: random interleavings of append / UPDATE /
  * DELETE / OPTIMIZE / Z-ORDER / RESTORE / reopen, checked row-for-row
  * against an in-memory model after every step, with a per-version model
  * history so RESTORE is verified against the exact state the table had at
  * that version. Runs in both rewrite and deletion-vector modes, with a
  * small checkpoint interval so restores and replays cross checkpoint
  * boundaries. A closing VACUUM(0) must not disturb the live state. The
  * single-op fuzzes (MergeFuzz, DvFuzz, OverwriteFuzz, NativeDmlFuzz)
  * guard each operator's semantics; this one guards their COMPOSITION —
  * log replay, snapshot caching, tombstones and DV masks interacting
  * across an arbitrary history. */
class LifecycleFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def runFuzz(seed: Int, dv: Boolean): Unit = {
    val rnd = new Random(seed)
    val dir = tmpDir(s"lifefuzz-$seed-$dv").resolve("t").toString
    var model: Map[Long, Long] = Map.empty // id -> v
    var nextId = 0L
    def mk(n: Int): Seq[(Long, Long)] = (0 until n).map { _ =>
      val id = nextId; nextId += 1
      (id, rnd.nextInt(1000).toLong)
    }
    var table = LakeTable.create(spark, dir,
      Seq((0L, 0L)).toDF("id", "v").schema,
      properties = Map(
        "graft.checkpointInterval" -> "3",
        "graft.enableDeletionVectors" -> dv.toString))
    // model state AS OF each committed version (v0 = empty)
    val history = scala.collection.mutable.Map[Long, Map[Long, Long]](
      table.version -> model)

    def record(): Unit = history(table.version) = model
    def check(clue: String): Unit = {
      // core-column integrity; evolved extras are checked in the evolution op
      val got = table.read().select("id", "v").as[(Long, Long)].collect().toMap
      withClue(s"seed=$seed dv=$dv $clue: ") { got shouldBe model }
    }
    // writes always carry the CURRENT schema (evolved extras as NULLs) —
    // the production writer shape after an ALTER TABLE
    def df(rows: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame = {
      var d = rows.toDF("id", "v")
      table.schema.fieldNames.filterNot(Set("id", "v")).foreach { c =>
        d = d.withColumn(c, lit(null).cast("string"))
      }
      d
    }

    for (step <- 0 until 18) {
      rnd.nextInt(11) match {
        case 0 | 1 => // append
          val rows = mk(rnd.nextInt(40) + 1)
          table.append(df(rows))
          model ++= rows
        case 2 => // predicate update
          val (k, r, d) = (rnd.nextInt(5) + 2, rnd.nextInt(3), rnd.nextInt(50) + 1)
          table.update(col("id") % k === r, Map("v" -> (col("v") + d)))
          model = model.map { case (id, v) =>
            id -> (if (id % k == r) v + d else v)
          }
        case 3 => // predicate delete
          val (k, r) = (rnd.nextInt(6) + 3, rnd.nextInt(3))
          table.delete(col("id") % k === r)
          model = model.filter { case (id, _) => id % k != r }
        case 4 => // compaction: data-identical
          table.optimizeCompact(targetFileSize = 32 * 1024): Unit
        case 5 => // clustering rewrite: data-identical
          table.optimizeZOrder(Seq("id", "v"), targetFileSize = 32 * 1024): Unit
        case 6 => // restore to a random earlier version
          val versions = history.keys.toSeq.sorted
          val target = versions(rnd.nextInt(versions.size))
          table.restoreToVersion(target)
          model = history(target)
        case 7 => // reopen: full log/checkpoint replay, fresh caches
          table = LakeTable.forPath(spark, dir)
        case 8 => // full overwrite: tombstones everything live
          val rows = mk(rnd.nextInt(25) + 1)
          table.overwrite(df(rows))
          model = rows.toMap
        case 9 => // idempotent append: the replayed twin must be a no-op
          val rows = mk(rnd.nextInt(20) + 1)
          val ver = step.toLong
          table.appendStream(df(rows), "fuzz-app", ver)
          table.appendStream(df(rows), "fuzz-app", ver) // replay
          model ++= rows
        case 10 => // schema evolution: metadata-only ADD COLUMNS; old rows
          // must read the new column as NULL (and RESTORE may later revert
          // the schema wholesale — the core columns must survive both)
          val cName = s"c$step" // step-unique: re-adding after a restore is new
          table.addColumns(Seq(
            org.apache.spark.sql.types.StructField(cName,
              org.apache.spark.sql.types.StringType)))
          table.read().filter(col(cName).isNotNull).count() shouldBe 0
      }
      record()
      check(s"step $step")
    }
    // a zero-retention vacuum reclaims history but must not touch the live
    // snapshot (restore targets are gone afterwards, by contract)
    table.vacuum(retainHours = 0.0)
    check("after vacuum")
    if (dv) table.reorgPurge(): Unit
    check("after reorg")
  }

  test("random lifecycle interleavings match the per-version model (rewrite mode)") {
    Seq(11, 23).foreach(runFuzz(_, dv = false))
  }

  test("random lifecycle interleavings match the per-version model (DV mode)") {
    Seq(11, 23).foreach(runFuzz(_, dv = true))
  }
}

package graft.log

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** Differential fuzz for the `_last_checkpoint` fast path: under
  * randomized histories of commits, checkpoints (all three layouts:
  * single, multi-part, v2 sidecars), truncations, and pointer /
  * checkpoint corruption, resolution THROUGH the pointer must equal
  * resolution with the pointer hidden (the listing-scan path) — same
  * version, same live files, same commit history, at HEAD and at random
  * time-travel targets. The pointer is an optimization; this is the spec
  * that keeps it one. */
class PointerEquivalenceFuzzSpec extends AnyFunSuite with Matchers {

  /** Store view that hides `_last_checkpoint` — reads of it fail, so the
    * wrapped TxLog is forced onto the listing-scan path. */
  private class PointerBlindStore(inner: LogStore) extends LogStore {
    def listFileNames(dir: java.nio.file.Path): Seq[String] =
      inner.listFileNames(dir).filterNot(_ == "_last_checkpoint")
    override def listFileNamesAfter(dir: java.nio.file.Path, startAfter: String): Seq[String] =
      inner.listFileNamesAfter(dir, startAfter).filterNot(_ == "_last_checkpoint")
    def read(path: java.nio.file.Path): Seq[String] = {
      require(path.getFileName.toString != "_last_checkpoint", "hidden")
      inner.read(path)
    }
    def writeAtomic(path: java.nio.file.Path, body: Array[Byte], overwrite: Boolean): Boolean =
      inner.writeAtomic(path, body, overwrite)
    def delete(path: java.nio.file.Path): Boolean = inner.delete(path)
  }

  private def runFuzz(seed: Int): Unit = {
    val rnd = new Random(seed)
    val dir = java.nio.file.Paths.get(s"/fuzz/ptr-$seed/t")
    val store = new InMemoryLogStore
    val log = new TxLog(dir, store)
    val blind = new TxLog(dir, new PointerBlindStore(store))
    // checkpoint layout varies by seed: default / multi-part / v2
    val props: Map[String, String] = seed % 3 match {
      case 0 => Map.empty
      case 1 => Map("graft.checkpoint.partSize" -> "3")
      case _ => Map("graft.checkpoint.v2" -> "true", "graft.checkpoint.v2.buckets" -> "3")
    }
    val meta = Metadata("t", null,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.LongType))).json,
      Nil, props, 0L)
    log.commit(v => Seq(meta, CommitInfo(v, v, "CREATE", Map.empty, Map.empty, -1)))
    var floor = 0L // truncation boundary: targets below are gone by contract
    def check(clue: String): Unit = {
      val a = log.snapshot()     // pointer path (when the pointer is usable)
      val b = blind.snapshot()   // forced scan path
      withClue(s"seed=$seed $clue HEAD: ") {
        a.version shouldBe b.version
        a.files.map(_.path).sorted shouldBe b.files.map(_.path).sorted
        a.commits.map(_.version) shouldBe b.commits.map(_.version)
        a.metadata shouldBe b.metadata
      }
      val latest = a.version
      if (latest > floor) {
        val t = floor + rnd.nextInt((latest - floor + 1).toInt)
        withClue(s"seed=$seed $clue travel v$t: ") {
          val ta = log.snapshot(Some(t)); val tb = blind.snapshot(Some(t))
          ta.files.map(_.path).sorted shouldBe tb.files.map(_.path).sorted
          ta.commits.map(_.version) shouldBe tb.commits.map(_.version)
        }
      }
      withClue(s"seed=$seed $clue latestVersion: ") {
        log.latestVersion() shouldBe blind.latestVersion()
      }
    }
    for (step <- 0 until 40) {
      rnd.nextInt(8) match {
        case 0 | 1 | 2 | 3 => // commit: add a file, sometimes remove one
          log.commit { v =>
            val adds = Seq(AddFile(s"data/f-$step-${rnd.nextInt(1000)}.parquet",
              Map.empty, 1L, 1L, Map.empty, 0L))
            val removes = if (rnd.nextBoolean()) Nil else {
              val live = log.snapshot().files
              if (live.isEmpty) Nil
              else Seq(RemoveFile(live(rnd.nextInt(live.size)).path, v))
            }
            CommitInfo(v, v, "WRITE", Map.empty, Map.empty, v - 1,
              commitId = s"c-$seed-$step") +: (adds ++ removes)
          }: Unit
        case 4 => // checkpoint at head (idempotent, any layout)
          log.writeCheckpoint(log.latestVersion().get)
        case 5 => // corrupt or drop the pointer: fast path must fall back
          if (rnd.nextBoolean())
            store.writeAtomic(dir.resolve("_txlog/_last_checkpoint"),
              "garbage".getBytes("UTF-8"), overwrite = true): Unit
          else store.delete(dir.resolve("_txlog/_last_checkpoint")): Unit
        case 6 => // truncate history behind a fresh boundary checkpoint
          val v = log.latestVersion().get
          log.truncateBefore(v)
          floor = v
        case 7 => // corrupt the NEWEST checkpoint's file(s): both paths
          // must fall back identically (older checkpoint or full replay)
          log.listCheckpoints().lastOption.foreach { cp =>
            if (cp > floor) { // never corrupt the truncation boundary:
              // below-boundary versions are GONE, the boundary checkpoint
              // is the only source for them — by contract it must survive
              store.listFileNames(dir.resolve("_txlog"))
                .filter(_.startsWith(f"$cp%020d.checkpoint"))
                .foreach(n => store.writeAtomic(dir.resolve(s"_txlog/$n"),
                  "torn\n".getBytes("UTF-8"), overwrite = true): Unit)
            }
          }
      }
      check(s"step $step")
    }
  }

  test("pointer-path resolution equals scan-path resolution under randomized histories") {
    Seq(101, 202, 303, 404, 505, 606).foreach(runFuzz)
  }
}

package graft.log

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The commit protocol end-to-end on [[S3LogStore]] over the contract fake
  * — put-if-absent via conditional PUT, complete lexicographic listing
  * (full and StartAfter-tail forms), NoSuchKey gets — including every
  * lying-outcome the real store produces. With this green (plus the
  * LakeTable-level S3 leg of the concurrency matrix), the production
  * binding is the thin SDK adapter in src/aws with no protocol logic
  * left to get wrong. */
class S3LogStoreSpec extends AnyFunSuite with Matchers {

  private def meta = Metadata(
    id = "t", name = null,
    schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType))).json,
    partitionColumns = Nil, properties = Map.empty, createdTime = 0L)

  private def ci(v: Long, op: String) =
    CommitInfo(v, v, op, Map.empty, Map.empty, v - 1, commitId = s"c-$op")

  private def dir = java.nio.file.Paths.get("/bucket/tables/t")

  test("commits, checkpoints, and snapshot replay run end-to-end on the S3 surface") {
    val client = new S3ClientFake
    val log = new TxLog(dir, new S3LogStore(client))
    log.commit(v => Seq(meta, ci(v, "CREATE")))
    (1 to 12).foreach(i => log.commit(v => Seq(ci(v, s"A$i"))))
    log.latestVersion() shouldBe Some(12L)
    log.writeCheckpoint(10L)
    log.listCheckpoints() shouldBe Seq(10L)
    val snap = log.snapshot()
    snap.version shouldBe 12L
    snap.commits.size shouldBe 13
    // keys live under the stripped table prefix, flat in the log dir
    client.list("bucket/tables/t/_txlog/").size shouldBe
      15 // 13 commits + 1 checkpoint + _last_checkpoint pointer
  }

  test("pointer-based resolution issues ZERO full-history LISTs, only tail LISTs") {
    val client = new S3ClientFake
    val log = new TxLog(dir, new S3LogStore(client))
    log.commit(v => Seq(meta, ci(v, "CREATE")))
    (1 to 12).foreach(i => log.commit(v => Seq(ci(v, s"A$i"))))
    log.writeCheckpoint(10L)
    // a fresh reader resolving the latest snapshot: the pointer GET + the
    // checkpoint read + StartAfter tail LISTs — never a full-history LIST.
    // At millions of commits this is the difference between 2 requests and
    // thousands of paginated LIST pages per resolution.
    val reader = new TxLog(dir, new S3LogStore(client))
    client.fullLists.set(0); client.tailLists.set(0)
    val snap = reader.snapshot()
    snap.version shouldBe 12L
    snap.commits.size shouldBe 13
    client.fullLists.get() shouldBe 0
    client.tailLists.get() should be >= 1
    // latestVersion rides the same tail
    client.fullLists.set(0)
    reader.latestVersion() shouldBe Some(12L)
    client.fullLists.get() shouldBe 0
  }

  test("each lying conditional-PUT outcome recovers exactly-once") {
    val client = new S3ClientFake
    val log = new TxLog(dir, new S3LogStore(client))
    log.commit(v => Seq(meta, ci(v, "CREATE")))
    client.nextPutLandsThenThrows = true
    log.commit(v => Seq(ci(v, "LAND-THROW"))) shouldBe 1L
    client.nextPutLandsThen412s = true
    log.commit(v => Seq(ci(v, "LAND-412"))) shouldBe 2L
    client.nextPutThrowsBeforeLanding = true // retried, lands at 3
    log.commit(v => Seq(ci(v, "BLIP"))) shouldBe 3L
    log.listVersions() shouldBe (0L to 3L)
    (1L to 3L).map(v => log.readVersion(v)
      .collectFirst { case c: CommitInfo => c.operation }.get) shouldBe
      Seq("LAND-THROW", "LAND-412", "BLIP")
  }

  test("chaos fuzz: 6 contended writers through a 10%-fault S3 stay exactly-once and gapless") {
    val client = new S3ClientFake().chaos(20260814L, 10)
    val store = new S3LogStore(client)
    new TxLog(dir, store).commit(v => Seq(meta, ci(v, "CREATE")))
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 6).map { t =>
      new Thread(() => {
        start.await()
        try (1 to 10).foreach { i =>
          val log = new TxLog(dir, store)
          val v = log.commit(v =>
            Seq(CommitInfo(v, v, s"W$t-$i", Map.empty, Map.empty, v - 1,
              commitId = s"W$t-$i")))
          // concurrent checkpointers ride the same chaos: idempotent
          // overwrite publishes + a best-effort pointer; one writer also
          // CORRUPTS the pointer mid-contention — resolution must degrade
          // to the scan path, never misresolve
          if (v % 7 == 0) scala.util.Try(log.writeCheckpoint(v)): Unit
          if (t == 1 && i == 5)
            client.put("bucket/tables/t/_txlog/_last_checkpoint",
              "NOT JSON".getBytes("UTF-8"))
        } catch { case _: Throwable => errs.incrementAndGet(): Unit }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    errs.get() shouldBe 0
    // verify through a CLEAN client holding the same landed bytes (the
    // chaos client keeps lying on reads, which is its job, not ours)
    val clean = new S3ClientFake
    client.list("bucket/tables/t/_txlog/").foreach { k =>
      var bytes: Array[Byte] = null
      while (bytes == null) { // ride out chaos GET faults
        try bytes = client.get(k) catch { case _: RuntimeException => }
      }
      clean.put(k, bytes)
    }
    val cleanLog = new TxLog(dir, new S3LogStore(clean))
    cleanLog.listVersions() shouldBe (0L to 60L)
    val ops = (0L to 60L).flatMap(v => cleanLog.readVersion(v)
      .collectFirst { case c: CommitInfo => c.operation })
    ops.size shouldBe 61
    ops.distinct.size shouldBe 61
    // full resolution agrees regardless of what the chaos run left in the
    // pointer or in racing checkpoints — commits are the source of truth
    cleanLog.snapshot().version shouldBe 60L
    cleanLog.snapshot().commits.size shouldBe 61
  }
}

package graft.log

import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The pluggable commit-storage seam: every byte of log IO must flow
  * through the [[LogStore]] a TxLog is constructed with, and the
  * put-if-absent contract must hold — that is all an S3 implementation
  * has to supply to make the table multi-writer-safe on an object store. */
class LogStoreSpec extends AnyFunSuite with Matchers {

  /** Interposing store: delegates to the local impl, counts every call. */
  private class CountingStore extends LogStore {
    val lists = new AtomicInteger; val reads = new AtomicInteger
    val casWrites = new AtomicInteger; val overwrites = new AtomicInteger
    def listFileNames(dir: Path): Seq[String] =
      { lists.incrementAndGet(); LocalLogStore.listFileNames(dir) }
    def read(path: Path): Seq[String] =
      { reads.incrementAndGet(); LocalLogStore.read(path) }
    def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean = {
      (if (overwrite) overwrites else casWrites).incrementAndGet()
      LocalLogStore.writeAtomic(path, body, overwrite)
    }
    def delete(path: Path): Boolean = LocalLogStore.delete(path)
  }

  private def meta = Metadata(
    id = "t", name = null,
    schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType))).json,
    partitionColumns = Nil, properties = Map.empty, createdTime = 0L)

  private def ci(v: Long, op: String, ts: Long) =
    CommitInfo(v, ts, op, Map.empty, Map.empty, v - 1)

  test("all log IO flows through the injected store; CAS loser retries") {
    val dir = Files.createTempDirectory("logstore")
    val store = new CountingStore
    val log = new TxLog(dir, store)
    log.commit(v => Seq(meta, ci(v, "CREATE", 0L)))
    store.casWrites.get() shouldBe 1
    store.lists.get() should be >= 1

    // claim the next version out from under a commit attempt: the seam's
    // put-if-absent must report the loss and the retry loop must land on
    // the version after
    val rival = new TxLog(dir, LocalLogStore)
    var poisoned = false
    val contended = new CountingStore {
      override def writeAtomic(path: Path, body: Array[Byte], overwrite: Boolean): Boolean = {
        if (!poisoned && !overwrite) {
          poisoned = true
          rival.tryCommit(1L, Seq(ci(1L, "RIVAL", 1L))) shouldBe true
        }
        super.writeAtomic(path, body, overwrite)
      }
    }
    val log2 = new TxLog(dir, contended)
    val v = log2.commit(v => Seq(ci(v, "APPEND", 2L)))
    v shouldBe 2L
    contended.casWrites.get() shouldBe 2 // lost v1, won v2
    log2.listVersions() shouldBe Seq(0L, 1L, 2L)
    log2.readVersion(2L).collectFirst { case c: CommitInfo => c.operation }
      .get shouldBe "APPEND"

    // checkpoints publish through the seam's overwrite mode
    val log3 = new TxLog(dir, store)
    log3.writeCheckpoint(2L)
    store.overwrites.get() shouldBe 2 // the checkpoint + its pointer
    log3.listCheckpoints() shouldBe Seq(2L)
    log3.snapshot().version shouldBe 2L
  }

  // The object-store-shaped store itself lives in src/main
  // (graft.log.InMemoryLogStore) — it is the reference implementation an
  // S3 conditional-PUT store is written against. This suite proves the
  // commit protocol end-to-end on it; ConcurrencyStressSpec runs the full
  // multi-writer LakeTable matrix through the same store.
  test("the commit protocol runs end-to-end on a filesystem-free object store") {
    // the table "directory" never exists on disk — every log byte lives in
    // the store; only the protocol's own semantics are in play
    val dir = java.nio.file.Paths.get("/nonexistent/mem-table")
    val store = new InMemoryLogStore
    val log = new TxLog(dir, store)
    log.commit(v => Seq(meta, ci(v, "CREATE", 0L)))
    (1 to 25).foreach { i =>
      log.commit(v => Seq(ci(v, "APPEND", i.toLong)))
    }
    log.latestVersion() shouldBe Some(25L)
    // checkpoints write and replay through the same three store calls
    log.writeCheckpoint(20L)
    log.listCheckpoints() shouldBe Seq(20L)
    val snap = log.snapshot()
    snap.version shouldBe 25L
    snap.commits.size shouldBe 26
    // contended writers: 8 threads × 5 commits each, every version claimed
    // exactly once through putIfAbsent alone
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 8).map { t =>
      new Thread(() => {
        start.await()
        try (1 to 5).foreach { i =>
          new TxLog(dir, store).commit(v => Seq(ci(v, s"W$t-$i", v))): Unit
        } catch { case _: Throwable => errs.incrementAndGet(): Unit }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    errs.get() shouldBe 0
    log.latestVersion() shouldBe Some(65L)
    log.listVersions() shouldBe (0L to 65L)
  }

  test("ambiguous CAS outcomes recover instead of double-committing") {
    // The S3 reality the seam must survive: a conditional PUT can LAND and
    // then report failure — response timeout (exception) or the SDK's own
    // retry observing the first attempt's object (412 -> false). A retry
    // loop that trusts the lie re-commits the same actions at the next
    // version. tryCommitRecovering re-reads the version and recognizes its
    // own landed commit.
    val dir = java.nio.file.Paths.get("/nonexistent/flaky-table")
    val inner = new InMemoryLogStore
    var failMode: String = null // one-shot: "throw" | "false"
    val store = new LogStore {
      def listFileNames(d: Path): Seq[String] = inner.listFileNames(d)
      def read(p: Path): Seq[String] = inner.read(p)
      def delete(p: Path): Boolean = inner.delete(p)
      def writeAtomic(p: Path, b: Array[Byte], ow: Boolean): Boolean = {
        val ok = inner.writeAtomic(p, b, ow)
        if (ok && !ow && failMode != null) {
          val m = failMode; failMode = null
          if (m == "throw") throw new RuntimeException("simulated response timeout")
          else return false
        }
        ok
      }
    }
    val log = new TxLog(dir, store)
    log.commit(v => Seq(meta, ci(v, "CREATE", 0L)))
    failMode = "throw" // PUT lands, then the store call throws
    log.commit(v => Seq(ci(v, "APPEND-A", 1L))) shouldBe 1L
    log.latestVersion() shouldBe Some(1L) // NOT re-committed at v2
    failMode = "false" // PUT lands, then the CAS claims it lost
    log.commit(v => Seq(ci(v, "APPEND-B", 2L))) shouldBe 2L
    log.latestVersion() shouldBe Some(2L)
    (0L to 2L).map(v => log.readVersion(v)
      .collectFirst { case c: CommitInfo => c.operation }.get) shouldBe
      Seq("CREATE", "APPEND-A", "APPEND-B")
    // a transient PRE-landing failure is retried, not fatal
    var drops = 2
    val dropping = new LogStore {
      def listFileNames(d: Path): Seq[String] = inner.listFileNames(d)
      def read(p: Path): Seq[String] = inner.read(p)
      def delete(p: Path): Boolean = inner.delete(p)
      def writeAtomic(p: Path, b: Array[Byte], ow: Boolean): Boolean = {
        if (!ow && drops > 0) { drops -= 1; throw new RuntimeException("store blip") }
        inner.writeAtomic(p, b, ow)
      }
    }
    new TxLog(dir, dropping).commit(v => Seq(ci(v, "APPEND-C", 3L))) shouldBe 3L
    log.listVersions() shouldBe (0L to 3L)
  }

  test("landed PUT whose recovery READS also fail does not double-commit (commitId sweep)") {
    // The double-failure case: the conditional PUT lands, the store call
    // throws, AND the recovery read of that version keeps failing for a few
    // rounds. A loop that treats the unreadable version as a lost race would
    // re-resolve and commit the SAME logical actions at the next version.
    // The retry loop must instead hold off new attempts until the contested
    // version is readable and recognize its own landed commit by commitId.
    val dir = java.nio.file.Paths.get("/nonexistent/doublefail-table")
    val inner = new InMemoryLogStore
    var armTrap = false
    var failReads = 0
    var trapped: Path = null
    val store = new LogStore {
      def listFileNames(d: Path): Seq[String] = inner.listFileNames(d)
      def delete(p: Path): Boolean = inner.delete(p)
      def read(p: Path): Seq[String] = {
        if (p == trapped && failReads > 0) {
          failReads -= 1; throw new RuntimeException("simulated read blip")
        }
        inner.read(p)
      }
      def writeAtomic(p: Path, b: Array[Byte], ow: Boolean): Boolean = {
        val ok = inner.writeAtomic(p, b, ow)
        if (ok && !ow && armTrap) {
          armTrap = false; trapped = p; failReads = 3
          throw new RuntimeException("simulated response timeout")
        }
        ok
      }
    }
    val log = new TxLog(dir, store)
    log.commit(v => Seq(meta, ci(v, "CREATE", 0L)))
    armTrap = true
    val id = "stable-logical-commit-1"
    log.commit(v => Seq(ci(v, "APPEND-X", 1L).copy(commitId = id))) shouldBe 1L
    // exactly once: the landed version was recognized, nothing at v2
    log.latestVersion() shouldBe Some(1L)
    log.readVersion(1L).collectFirst { case c: CommitInfo => c.commitId }
      .get shouldBe id
  }

  test("fault-injection fuzz: contended writers through a randomly lying store stay exactly-once") {
    // Every negative CAS outcome a real object store can produce, thrown at
    // random under contention: land-then-throw, land-then-false,
    // throw-before-landing. The invariant that must survive all of it:
    // every logical commit lands EXACTLY once and versions are gapless.
    // ... and (new) transiently-failing READS, so even the recovery read of
    // a landed-but-lied-about version can fail — the commitId sweep must
    // hold off new attempts rather than double-commit.
    val dir = java.nio.file.Paths.get("/nonexistent/fuzz-table")
    val inner = new InMemoryLogStore
    val rnd = new java.util.Random(20260814L)
    val store = new LogStore {
      def listFileNames(d: Path): Seq[String] = inner.listFileNames(d)
      def delete(p: Path): Boolean = inner.delete(p)
      def read(p: Path): Seq[String] = {
        if (rnd.synchronized(rnd.nextInt(10)) == 0)
          throw new RuntimeException("read blip")
        inner.read(p)
      }
      def writeAtomic(p: Path, b: Array[Byte], ow: Boolean): Boolean = {
        if (ow) return inner.writeAtomic(p, b, ow)
        val roll = rnd.synchronized(rnd.nextInt(10))
        if (roll == 0) throw new RuntimeException("blip before landing")
        val ok = inner.writeAtomic(p, b, ow)
        if (ok && roll == 1) throw new RuntimeException("timeout after landing")
        if (ok && roll == 2) return false
        ok
      }
    }
    new TxLog(dir, store).commit(v => Seq(meta, ci(v, "CREATE", 0L)))
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 6).map { t =>
      new Thread(() => {
        start.await()
        try (1 to 10).foreach { i =>
          new TxLog(dir, store).commit(v =>
            Seq(ci(v, s"W$t-$i", v).copy(commitId = s"W$t-$i"))): Unit
        } catch { case _: Throwable => errs.incrementAndGet(): Unit }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    errs.get() shouldBe 0
    val honest = new TxLog(dir, inner)
    honest.listVersions() shouldBe (0L to 60L) // gapless: 1 create + 60 commits
    // every logical commit appears EXACTLY once across the whole log
    val ops = (0L to 60L).flatMap(v => honest.readVersion(v)
      .collectFirst { case c: CommitInfo => c.operation })
    ops.size shouldBe 61
    ops.distinct.size shouldBe 61
  }

  test("listFileNamesAfter returns exactly the strictly-later names on every store") {
    val stores: Seq[(String, LogStore, java.nio.file.Path)] = Seq(
      ("local", LocalLogStore, Files.createTempDirectory("lfa-local")),
      ("mem", new InMemoryLogStore, java.nio.file.Paths.get("/lfa/mem")),
      ("s3", new S3LogStore(new S3ClientFake),
        java.nio.file.Paths.get("/lfa/s3")))
    for ((name, store, dir) <- stores) {
      val names = Seq("00000000000000000003.json", "00000000000000000010.json",
        "00000000000000000010.checkpoint.json", "00000000000000000011.json",
        "_last_checkpoint")
      names.foreach(n =>
        store.writeAtomic(dir.resolve(n), "x\n".getBytes("UTF-8"), overwrite = true))
      withClue(s"store=$name: ") {
        store.listFileNamesAfter(dir, "00000000000000000010.json").sorted shouldBe
          Seq("00000000000000000011.json", "_last_checkpoint")
        store.listFileNamesAfter(dir, "").sorted shouldBe names.sorted
        store.listFileNamesAfter(dir, "zzz") shouldBe empty
      }
    }
  }

  test("minor log compactions write, resolve, and truncate on every store") {
    val stores: Seq[(String, LogStore, java.nio.file.Path)] = Seq(
      ("local", LocalLogStore, Files.createTempDirectory("compact-local")),
      ("mem", new InMemoryLogStore, java.nio.file.Paths.get("/compact/mem")),
      ("s3", new S3LogStore(new S3ClientFake),
        java.nio.file.Paths.get("/compact/s3")))
    for ((name, store, dir) <- stores) withClue(s"store=$name: ") {
      val log = new TxLog(dir, store)
      log.commit(v => Seq(meta, ci(v, "CREATE", 0L)))
      (1 to 9).foreach(i => log.commit(v => Seq(ci(v, s"APPEND-$i", i.toLong))))
      log.writeCompacted(1L, 5L)
      log.writeCompacted(6L, 9L)
      // the compacted names never parse as commit versions
      log.listVersions() shouldBe (0L to 9L)
      log.latestVersion() shouldBe Some(9L)
      // resolution through the ranges equals per-commit replay
      val snap = log.snapshot()
      snap.version shouldBe 9L
      snap.commits.map(_.version) shouldBe (0L to 9L)
      snap.commits.map(_.operation) shouldBe
        ("CREATE" +: (1 to 9).map(i => s"APPEND-$i"))
      // truncation sweeps ranges starting below the boundary; a range
      // starting AT the boundary survives (its whole span is still live)
      log.truncateBefore(6L)
      store.listFileNames(log.logDir).filter(_.endsWith(".compacted.json")) shouldBe
        Seq(f"${6L}%020d.${9L}%020d.compacted.json")
      log.snapshot().commits.map(_.version) shouldBe (0L to 9L)
    }
  }

  test("writeAtomic(overwrite=false) is a true put-if-absent under racing writers") {
    val dir = Files.createTempDirectory("logstore-race")
    val target = dir.resolve("00000000000000000000.json")
    val start = new java.util.concurrent.CountDownLatch(1)
    val wins = new AtomicInteger
    val threads = (1 to 16).map { i =>
      new Thread(() => {
        start.await()
        if (LocalLogStore.writeAtomic(target, s"writer-$i\n".getBytes("UTF-8"),
            overwrite = false)) wins.incrementAndGet(): Unit
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    wins.get() shouldBe 1
    // the published content is exactly ONE writer's body, never interleaved
    val body = LocalLogStore.read(target)
    body should have size 1
    body.head should startWith("writer-")
  }
}

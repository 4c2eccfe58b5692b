package graft.table

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.{InMemoryLogStore, LocalLogStore, LogStore}

/** Multi-writer stress over the CAS commit protocol: every commit must land
  * exactly once (optimistic retry with jittered backoff absorbs lost
  * races), readers racing the writers must only ever observe committed
  * atomic states, and writers on disjoint partitions must not
  * false-conflict.
  *
  * The matrix runs three times — once per [[LogStore]] implementation:
  * [[ConcurrencyStressSpec]] on the local filesystem (hard-link CAS),
  * [[InMemoryConcurrencyStressSpec]] on the filesystem-free object store
  * (pure putIfAbsent, the regime where CAS latency is near zero and
  * contention is at its worst), and [[S3ConcurrencyStressSpec]] on
  * [[graft.log.S3LogStore]] over the S3 contract fake (conditional PUT +
  * listing, the production bucket surface). The protocol's portability
  * claim is this CI matrix, not a comment. */
abstract class ConcurrencyStressBase extends SparkSpec {
  import spark.implicits._

  /** The store every table in this suite commits through. */
  protected def store: LogStore

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    LogStore.default = store
  }
  override protected def afterAll(): Unit = {
    LogStore.default = LocalLogStore
    super.afterAll()
  }

  private def mk(prefix: String, partitionBy: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): LakeTable =
    LakeTable.create(spark, tmpDir(prefix).resolve("t").toString,
      StructType(Seq(
        StructField("id", LongType),
        StructField("p", StringType),
        StructField("v", LongType))),
      partitionColumns = partitionBy, properties = props)

  private def batch(ids: Range, p: String) =
    ids.map(i => (i.toLong, p, i.toLong % 7)).toDF("id", "p", "v")

  /** Run one task per writer on real threads, starting together; rethrow
    * the first failure. */
  private def race(tasks: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(tasks.size)
    val go = new CountDownLatch(1)
    val err = new AtomicReference[Throwable]
    tasks.foreach { t =>
      pool.execute { () =>
        go.await()
        try t() catch { case e: Throwable => err.compareAndSet(null, e): Unit }
      }
    }
    go.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "stress tasks hung")
    if (err.get() != null) throw err.get()
  }

  test("20 interleaved appends from 4 writers all land exactly once") {
    val t = mk("conc-appends")
    race((0 until 4).map { w => () =>
      (0 until 5).foreach { i =>
        t.append(batch(w * 1000 + i * 100 until w * 1000 + i * 100 + 100, s"p$w"))
      }
    })
    t.version shouldBe 20
    t.read().count() shouldBe 2000
    t.read().select("id").distinct().count() shouldBe 2000 // no double-commit
    val hist = t.history(None)
    hist.count() shouldBe 21 // create + 20 appends
    hist.select("version").as[Long].collect().toSet shouldBe (0L to 20L).toSet
  }

  test("checkpoints racing contended writers never corrupt replay") {
    // checkpoint publication is overwrite-mode and content-deterministic, so
    // a checkpointer racing live commits (and other checkpointers) must be
    // harmless: every later replay — from whatever checkpoint is newest —
    // reconstructs the same state the per-version files define
    val t = mk("conc-ckpt")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ckptErrs = new java.util.concurrent.atomic.AtomicInteger
    val checkpointer = new Thread(() => {
      while (!stop.get()) {
        try {
          val v = t.version
          if (v >= 0) t.log.writeCheckpoint(v)
        } catch { case _: Throwable => ckptErrs.incrementAndGet(): Unit }
        Thread.sleep(5)
      }
    })
    checkpointer.start()
    race((0 until 4).map { w => () =>
      (0 until 5).foreach { i =>
        t.append(batch(w * 1000 + i * 100 until w * 1000 + i * 100 + 100, s"p$w"))
      }
    })
    stop.set(true); checkpointer.join()
    ckptErrs.get() shouldBe 0
    t.version shouldBe 20
    // a FRESH resolution replays from the newest checkpoint + log tail
    val fresh = LakeTable.forPath(spark, t.dir.toString)
    fresh.read().count() shouldBe 2000
    fresh.read().select("id").distinct().count() shouldBe 2000
    fresh.snapshot().commits.size shouldBe 21
    // time travel back through checkpointed history still works
    fresh.versionAsOf(10).count() shouldBe 1000
  }

  test("a reader racing the writers only observes committed atomic states") {
    val t = mk("conc-reader")
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val reader = new Thread(() => {
      while (!done.get()) seen.add(t.read().count())
    })
    reader.start()
    try race((0 until 4).map { w => () =>
      (0 until 3).foreach { i =>
        t.append(batch(w * 1000 + i * 100 until w * 1000 + i * 100 + 100, s"p$w"))
      }
    }) finally { done.set(true); reader.join() }
    t.read().count() shouldBe 1200
    // atomicity: each append is all-or-nothing, so every observed count is
    // a multiple of the batch size — a torn read would break this
    seen.forEach(c => withClue(s"observed count $c: ") { c % 100 shouldBe 0 })
  }

  test("DV deletes on disjoint partitions run concurrently without conflict") {
    val t = mk("conc-dv", partitionBy = Seq("p"),
      props = Map("graft.enableDeletionVectors" -> "true"))
    (0 until 4).foreach(w => t.append(batch(w * 1000 until w * 1000 + 200, s"p$w")))
    val filesBefore = t.snapshot().files.map(_.path).toSet
    race((0 until 4).map { w => () =>
      t.delete(col("p") === s"p$w" && col("id") % 2 === 0): Unit
    })
    t.version shouldBe 8 // 4 appends + 4 DV deletes, none lost or doubled
    t.read().count() shouldBe 400
    t.read().filter(col("id") % 2 === 0).count() shouldBe 0
    // every delete masked rather than rewrote: the original files all live
    t.snapshot().files.map(_.path).toSet shouldBe filesBefore
    t.snapshot().dvs should not be empty
  }

  test("OPTIMIZE racing appends: both land, no rows lost or doubled") {
    // appends only ADD files, so they can never content-conflict with a
    // compaction that rewrites the pre-existing set — the optimistic retry
    // must absorb the interleaving without either side aborting
    val t = mk("conc-optimize")
    (0 until 6).foreach(i => t.append(batch(i * 100 until i * 100 + 100, "p0")))
    race(Seq(
      () => { t.optimizeCompact(): Unit },
      () => (0 until 3).foreach { i =>
        t.append(batch(1000 + i * 100 until 1000 + i * 100 + 100, "p0"))
      }))
    t.read().count() shouldBe 900
    t.read().select("id").distinct().count() shouldBe 900
    t.history(None).filter(col("operation") === "OPTIMIZE").count() shouldBe 1
  }

  test("OPTIMIZE racing a same-file DELETE: loser aborts loudly, rows stay consistent") {
    // both sides rewrite the SAME files — deleted rows must never resurrect
    // through a compaction that staged its output before the delete landed
    val t = mk("conc-opt-del")
    (0 until 4).foreach(i => t.append(batch(i * 100 until i * 100 + 100, "p0")))
    val aborted = new java.util.concurrent.atomic.AtomicInteger
    race(Seq(
      () => try { t.optimizeCompact(): Unit }
        catch { case _: java.util.ConcurrentModificationException =>
          aborted.incrementAndGet(): Unit },
      () => try { t.delete(col("id") % 2 === 0): Unit }
        catch { case _: java.util.ConcurrentModificationException =>
          aborted.incrementAndGet(): Unit }))
    aborted.get() should be <= 1 // serialized cleanly, or one loud loser
    val n = t.read().count()
    if (aborted.get() == 0) n shouldBe 200 // both applied
    else (n == 200L || n == 400L) shouldBe true // delete OR optimize lost whole
    // a resurrected even id would show here regardless of interleaving
    if (n == 200) t.read().filter(col("id") % 2 === 0).count() shouldBe 0
  }

  test("OPTIMIZE WHERE on disjoint partitions runs concurrently without conflict") {
    // each compaction touches only its own partition's files — the
    // touched-file liveness check must not false-conflict across them
    val t = mk("conc-opt-disjoint", partitionBy = Seq("p"))
    (0 until 4).foreach { w =>
      (0 until 3).foreach(i =>
        t.append(batch(w * 1000 + i * 100 until w * 1000 + i * 100 + 100, s"p$w")))
    }
    race((0 until 4).map { w => () =>
      t.optimizeCompact(where = Some(col("p") === s"p$w")): Unit
    })
    t.read().count() shouldBe 1200
    t.history(None).filter(col("operation") === "OPTIMIZE").count() shouldBe 4
    // each partition compacted down to one file
    t.showPartitions().collect().foreach(r =>
      r.getAs[Long]("numFiles") shouldBe 1L)
  }

  test("a CAS that lands but reports failure applies the commit exactly once") {
    // One-shot liar: the underlying store's CAS succeeds, the caller is
    // told it lost — the S3 conditional-PUT ambiguity. The commit's
    // commitId lets the retry loop recognize its own landed write; without
    // recovery the append would double-apply at the next version.
    class LiarStore(inner: LogStore) extends LogStore {
      @volatile var armed = false
      def listFileNames(d: java.nio.file.Path): Seq[String] = inner.listFileNames(d)
      def read(p: java.nio.file.Path): Seq[String] = inner.read(p)
      def delete(p: java.nio.file.Path): Boolean = inner.delete(p)
      def writeAtomic(p: java.nio.file.Path, b: Array[Byte], ow: Boolean): Boolean = {
        val ok = inner.writeAtomic(p, b, ow)
        if (ok && !ow && armed) { armed = false; false } else ok
      }
    }
    val prev = LogStore.default
    val liar = new LiarStore(prev)
    LogStore.default = liar
    try {
      val t = mk("cas-liar") // v0 commit, liar unarmed
      liar.armed = true
      t.append(batch(0 until 100, "p0"))
      t.version shouldBe 1
      t.read().count() shouldBe 100 // exactly once — not 200
      t.history(None).count() shouldBe 2 // create + one append
    } finally LogStore.default = prev
  }

  test("conflicting same-file DV writers: one wins, one aborts, state stays sane") {
    val t = mk("conc-dv-conflict",
      props = Map("graft.enableDeletionVectors" -> "true"))
    t.append(batch(0 until 1000, "p0")) // one partition -> shared files
    val failures = new java.util.concurrent.atomic.AtomicInteger
    race((0 until 2).map { w => () =>
      try t.delete(col("id") % 2 === w.toLong): Unit
      catch { case _: java.util.ConcurrentModificationException =>
        failures.incrementAndGet(): Unit }
    })
    // two legal outcomes, depending on interleaving: the deletes serialized
    // cleanly (both landed — the second rebuilt on the first's snapshot) or
    // they truly raced and the loser aborted with a DV conflict. What must
    // NEVER happen is a lost update: masks silently dropped or doubled.
    failures.get() match {
      case 0 => t.read().count() shouldBe 0 // both landed
      case 1 =>
        t.read().count() shouldBe 500
        val winner = if (t.read().filter(col("id") % 2 === 0).count() == 0) 0 else 1
        // the loser retried on a fresh snapshot succeeds
        t.delete(col("id") % 2 === (1L - winner))
        t.read().count() shouldBe 0
      case n => fail(s"both writers aborted ($n failures)")
    }
  }
}

/** The stress matrix on the default local-filesystem store. */
class ConcurrencyStressSpec extends ConcurrencyStressBase {
  protected def store: LogStore = LocalLogStore
}

/** The same matrix with every log byte routed through the
  * filesystem-free object store — fast-CAS contention, no IO jitter to
  * accidentally de-synchronize writers. Data parquet files still land on
  * local disk (they are the data plane); only the transaction log is
  * virtualized, which is exactly the split an S3 deployment has. */
class InMemoryConcurrencyStressSpec extends ConcurrencyStressBase {
  protected def store: LogStore = new InMemoryLogStore
}

/** Third leg: the same matrix through [[graft.log.S3LogStore]] over the
  * S3 contract fake — the conditional-PUT surface a production bucket
  * exposes, proven at the LakeTable level, not just the TxLog level. */
class S3ConcurrencyStressSpec extends ConcurrencyStressBase {
  protected def store: LogStore =
    new graft.log.S3LogStore(new graft.log.S3ClientFake)
}

package graft.table

import java.sql.Timestamp
import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.transform.Scd2

/** Randomized invariant tests for the table format (SURVEY §5): MERGE
  * idempotence, snapshot isolation under later writes, SCD2 dimension
  * invariants, and concurrent-append safety (M17). Seeds are fixed so runs
  * are deterministic.
  */
class InvariantsSpec extends SparkSpec {
  import spark.implicits._

  private def randomRows(rnd: Random, n: Int): Seq[(Long, String, Long)] =
    Seq.fill(n)((rnd.nextInt(40).toLong, rnd.alphanumeric.take(6).mkString, rnd.nextInt(1000).toLong))

  test("property: upsert-all MERGE is idempotent (same source twice = same state)") {
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val t = LakeTable.createFrom(spark, tmpDir(s"pi-$seed").resolve("t").toString,
        randomRows(rnd, 30).distinctBy(_._1).toDF("k", "v", "n"))
      val src = randomRows(rnd, 25).distinctBy(_._1).toDF("k", "v", "n")
      def upsert(): Unit = {
        t.merge(src, col("target.k") === col("source.k"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute(): Unit
      }
      upsert()
      val after1 = t.read().orderBy("k", "v", "n").collect().toSeq
      upsert()
      val after2 = t.read().orderBy("k", "v", "n").collect().toSeq
      withClue(s"seed=$seed: ") { after2 shouldBe after1 }
    }
  }

  test("property: a snapshot read at version v is stable under later writes") {
    val rnd = new Random(7)
    val t = LakeTable.createFrom(spark, tmpDir("pi-snap").resolve("t").toString,
      randomRows(rnd, 40).toDF("k", "v", "n"))
    val v = t.version
    val frozen = t.versionAsOf(v).orderBy("k", "v", "n").collect().toSeq
    // later writes of every flavor
    t.append(randomRows(rnd, 10).toDF("k", "v", "n"))
    t.delete(col("k") < 10)
    t.update(col("k") > 30, Map("n" -> lit(0L)))
    t.optimizeCompact()
    val again = t.versionAsOf(v).orderBy("k", "v", "n").collect().toSeq
    again shouldBe frozen
  }

  test("property: SCD2 keeps <=1 current row per key and point-in-time uniqueness") {
    val rnd = new Random(11)
    def batch(n: Int) = Seq.fill(n)(
      (rnd.nextInt(15).toLong, rnd.alphanumeric.take(4).mkString)).distinctBy(_._1)
    val t0 = new Timestamp(1700000000000L)
    val t = Scd2.initialize(spark, tmpDir("pi-scd2").resolve("t").toString,
      batch(10).toDF("k", "v"), trackedCols = Seq("v"), ts = t0)
    val stamps = (1 to 4).map(i => new Timestamp(1700000000000L + i * 3600000L))
    stamps.foreach(ts => Scd2.upsert(t, batch(12).toDF("k", "v"),
      keyCols = Seq("k"), trackedCols = Seq("v"), ts = ts))

    val dim = t.read()
    // <=1 current row per key
    dim.filter(col("is_current")).groupBy("k").count()
      .filter(col("count") > 1).count() shouldBe 0
    // non-current rows are properly closed
    dim.filter(!col("is_current") && col("effective_end").isNull).count() shouldBe 0
    // at any sampled instant, at most one version per key is effective
    (t0 +: stamps).foreach { ts =>
      Scd2.asOf(t, new Timestamp(ts.getTime + 1)).groupBy("k").count()
        .filter(col("count") > 1).count() shouldBe 0
    }
  }

  test("property: concurrent appends all land exactly once (M17)") {
    val t = LakeTable.create(spark, tmpDir("pi-conc").resolve("t").toString,
      Seq((1L, "x")).toDF("k", "v").schema)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val writers = (1 to 8).map { i =>
        Future {
          t.append(Seq((i.toLong, s"w$i")).toDF("k", "v").coalesce(1))
        }
      }
      Await.result(Future.sequence(writers), Duration.Inf)
    } finally pool.shutdown()
    t.read().count() shouldBe 8
    t.read().select("k").as[Long].collect().sorted shouldBe (1L to 8L)
    // one commit per writer, strictly increasing versions
    t.snapshot().commits.map(_.version) shouldBe t.snapshot().commits.map(_.version).sorted
    t.version shouldBe 8L
  }

  test("property: concurrent mergeSchema appends never clobber each other's columns") {
    val t = LakeTable.create(spark, tmpDir("pi-schema-race").resolve("t").toString,
      Seq((1L, "x")).toDF("k", "v").schema)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val rounds = 6
    try {
      (0 until rounds).foreach { r =>
        // barrier per round maximizes CAS collisions; on a lost race the
        // retry closure must re-merge against the fresh schema, not re-emit
        // the stale merge (which would drop the winner's new column)
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val writers = Seq("a", "b").map { w =>
          Future {
            val df = Seq((1L, "x", 1L)).toDF("k", "v", s"c_${w}_$r")
            barrier.await()
            t.append(df, mergeSchema = true)
          }
        }
        Await.result(Future.sequence(writers), Duration.Inf)
      }
    } finally pool.shutdown()
    val names = t.schema.fieldNames.toSet
    (0 until rounds).foreach { r =>
      names should contain(s"c_a_$r")
      names should contain(s"c_b_$r")
    }
  }

  test("stale DML rewrite fails on a concurrent metadata change") {
    val t = LakeTable.createFrom(spark, tmpDir("pi-meta-conflict").resolve("t").toString,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    val stale = t.snapshot()
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("extra",
      org.apache.spark.sql.types.LongType)))
    an[java.util.ConcurrentModificationException] should be thrownBy {
      t.commitRewrite(stale, "UPDATE", Map.empty, Nil, Nil, Nil, Map.empty)
    }
  }

  test("conflicting file rewrites are detected, disjoint ones are not") {
    val t = LakeTable.createFrom(spark, tmpDir("pi-conflict").resolve("t").toString,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    val stale = t.snapshot()
    t.update(col("k") === 1L, Map("v" -> lit("first"))) // rewrites the only file
    // a writer that planned against the stale snapshot and targets the same
    // (now removed) files must fail instead of resurrecting them
    an[java.util.ConcurrentModificationException] should be thrownBy {
      t.commitRewrite(stale, "UPDATE", Map.empty, stale.files, Nil, Nil, Map.empty)
    }
    // a stale writer touching NO overlapping files commits fine (append-like)
    noException should be thrownBy {
      t.commitRewrite(stale, "WRITE", Map.empty, Nil, Nil, Nil, Map.empty)
    }
  }

  test("stale rewrite fails when a deletion vector landed on its files meanwhile") {
    val t = LakeTable.create(spark,
      tmpDir("pi-dvconf").resolve("t").toString,
      Seq((1L, "a")).toDF("k", "v").schema,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1))
    val stale = t.snapshot()
    t.delete(col("k") === 5L) // DV commit: same file paths, new mask
    // an OPTIMIZE/REORG planned against the stale (unmasked) snapshot would
    // resurrect the deleted row — must conflict, not commit
    an[java.util.ConcurrentModificationException] should be thrownBy {
      t.commitRewrite(stale, "OPTIMIZE", Map.empty, stale.files, Nil, Nil, Map.empty)
    }
    t.read().count() shouldBe 9
  }

  test("property: RESTORE round-trips through arbitrary DML") {
    val rnd = new Random(23)
    val t = LakeTable.createFrom(spark, tmpDir("pi-restore").resolve("t").toString,
      randomRows(rnd, 30).toDF("k", "v", "n"))
    val v = t.version
    val before = t.read().orderBy("k", "v", "n").collect().toSeq
    t.delete(col("k") % 2 === 0)
    t.append(randomRows(rnd, 5).toDF("k", "v", "n"))
    t.update(col("k") > 20, Map("v" -> lit("mutated")))
    t.restoreToVersion(v)
    t.read().orderBy("k", "v", "n").collect().toSeq shouldBe before
  }
}

package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized differential fuzz of the persisted BM25 index lifecycle:
  * random batches, random idempotent REPLAYS, random df-caps, and a final
  * concurrent-append round — after every history the index search must be
  * score-identical to [[TextAnalysis.bm25TopK]] over the logical corpus
  * (minus capped terms), and the stats properties must equal the model's.
  * This is the same differential discipline as `LifecycleFuzzSpec`, aimed
  * at the new appendWithProps commit shape: a torn postings/stats commit,
  * a double-applied replay, or a lost concurrent stat update all diverge
  * from the model and fail here.
  */
class Bm25IndexFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu")

  private def docsOf(rng: Random, ids: Range): Seq[(Long, String)] =
    ids.map { i =>
      val n = rng.nextInt(8) // may be 0 -> empty doc (counts toward N)
      (i.toLong, Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
    }

  private def runFuzz(seed: Int): Unit = {
    val rng = new Random(seed)
    val dfCap = if (rng.nextBoolean()) Long.MaxValue else 3L + rng.nextInt(5)
    val base = docsOf(rng, 0 until (5 + rng.nextInt(15)))
    val dir = tmpDir(s"bm25fuzz$seed").resolve("t").toString
    val idx = TextAnalysis.buildBm25Index(spark, dir,
      base.toDF("doc_id", "text"), buckets = 1 + rng.nextInt(8),
      dfCap = dfCap)
    var corpus = base
    var nextId = 1000L
    // model of the stats properties (exact longs)
    def tok(s: String) = s.trim.split("\\s+").filter(_.nonEmpty)
    var modelDocs = base.size.toLong
    var modelLen = base.map(d => tok(d._2).length.toLong).sum

    (0 until 4 + rng.nextInt(4)).foreach { round =>
      val batch = docsOf(rng, 0 until (1 + rng.nextInt(6)))
        .map { case (_, t) => val id = nextId; nextId += 1; (id, t) }
      val withId = rng.nextBoolean()
      val bid = if (withId) Some(s"b$round") else None
      TextAnalysis.appendBm25Batch(idx, batch.toDF("doc_id", "text"),
        batchId = bid)
      corpus ++= batch
      modelDocs += batch.size
      modelLen += batch.map(d => tok(d._2).length.toLong).sum
      // random replay: with a batchId it must be a FULL no-op; without one
      // we must NOT replay (it would double) — flip a coin only when safe
      if (withId && rng.nextBoolean()) {
        TextAnalysis.appendBm25Batch(idx, batch.toDF("doc_id", "text"),
          batchId = bid)
      }
      withClue(s"seed=$seed round=$round stats diverged: ") {
        idx.properties("graft.bm25.numDocs").toLong shouldBe modelDocs
        idx.properties("graft.bm25.totalLen").toLong shouldBe modelLen
      }
    }

    // concurrent appends: all stat deltas must land
    val conc = (0 until 3).map { i =>
      docsOf(rng, 0 until 2).map { case (_, t) =>
        val id = nextId; nextId += 1; (id, t)
      }
    }
    val threads = conc.zipWithIndex.map { case (b, i) =>
      new Thread(() => TextAnalysis.appendBm25Batch(
        graft.table.LakeTable.forPath(spark, dir),
        b.toDF("doc_id", "text"), batchId = Some(s"conc$i")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    corpus ++= conc.flatten
    modelDocs += conc.map(_.size).sum
    modelLen += conc.flatten.map(d => tok(d._2).length.toLong).sum
    withClue(s"seed=$seed concurrent stats diverged: ") {
      idx.properties("graft.bm25.numDocs").toLong shouldBe modelDocs
      idx.properties("graft.bm25.totalLen").toLong shouldBe modelLen
    }

    // differential search: index == direct scan over the corpus with the
    // FROZEN capped terms excluded (drop them from query AND corpus text
    // on the reference side only for scoring via absent postings: the
    // reference uses bm25TopK over the corpus with capped tokens REMOVED
    // from text, which changes doc length — so instead compare against
    // an UNCAPPED reference only when no cap was set, else check the
    // structural cap contracts)
    val queries = docsOf(rng, 0 until 3).map { case (_, t) =>
      val id = nextId; nextId += 1; (id, t)
    }
    val viaIndex = TextAnalysis.bm25SearchIndex(idx,
      queries.toDF("doc_id", "text"), k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    if (dfCap == Long.MaxValue) {
      val direct = TextAnalysis.bm25TopK(corpus.toDF("doc_id", "text"),
        queries.toDF("doc_id", "text"), k = 5)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
      withClue(s"seed=$seed search diverged from direct scan: ") {
        viaIndex shouldBe direct
      }
    } else {
      val capped = idx.properties.getOrElse("graft.bm25.cappedTerms", "")
        .split("\\s+").filter(_.nonEmpty).toSet
      withClue(s"seed=$seed capped terms leaked into the index: ") {
        idx.toDf.filter(col("term").isin(capped.toSeq: _*)).count() shouldBe 0L
      }
      // capped-term-only queries match nothing
      if (capped.nonEmpty) {
        TextAnalysis.bm25SearchIndex(idx,
          Seq((9999L, capped.head)).toDF("doc_id", "text"), k = 3)
          .count() shouldBe 0L
      }
      // search still returns well-formed dense rankings
      viaIndex.groupBy(_._1).foreach { case (_, rows) =>
        rows.map(_._4).sorted shouldBe (1 to rows.length).toArray
      }
    }
  }

  test("bm25 index lifecycle fuzz: random batches, replays, caps, and " +
    "concurrency match the model") {
    Seq(7, 19, 41).foreach(runFuzz)
  }
}

package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.transform.Silver

/** New-in-round-2 pipeline operators: deterministic splits/samples,
  * benchmark decontamination, PII redaction, currency conversion. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("trainTestSplit is deterministic, partition-independent, ~fraction") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.trainTestSplit(df, "id", 0.9)
    val s2 = Sampling.trainTestSplit(df.repartition(13), "id", 0.9)
    // same assignment regardless of partitioning / run
    s1.orderBy("id").collect() shouldBe s2.orderBy("id").sort("id").collect()
    val train = s1.filter(col("split") === "train").count()
    train.toDouble / 10000 shouldBe 0.9 +- 0.02
    // stratification for free: fraction holds within an arbitrary stratum
    val stratum = s1.filter(col("id") % 7 === 0)
    stratum.filter(col("split") === "train").count().toDouble /
      stratum.count() shouldBe 0.9 +- 0.04
  }

  test("deterministicSample keeps a stable subset") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().sorted
    val b = Sampling.deterministicSample(df.repartition(7), "id", 0.25).as[Long].collect().sorted
    a shouldBe b
    a.length.toDouble / 5000 shouldBe 0.25 +- 0.03
  }

  test("containmentPairs finds planted contamination via inverted index") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // superset: containment 1.0
      (2L, "alpha beta gamma delta unrelated words here"),        // partial
      (3L, "totally different text with nothing shared at all")
    ).toDF("doc_id", "text")
    // bench has 6 shingles; doc1 contains all 6, doc2 contains 2 (0.333)
    val out = Dedup.containmentPairs(corpus, bench, minContainment = 0.3)
      .orderBy("train_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    out.head.getDouble(2) shouldBe 1.0
    out(1).getDouble(2) shouldBe 0.333333
  }

  test("redactPii removes planted PII and counts match") {
    val df = Seq(
      (1L, "mail me at a.b+c@test.org or 192.168.0.1 card 1234567812345678 ssn 123-45-6789"),
      (2L, "nothing sensitive here 123")
    ).toDF("id", "text")
    val red = df.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .orderBy("id").as[(Long, String)].collect()
    red(0)._2 shouldBe "mail me at <EMAIL> or <IP> card <CARD> ssn <SSN>"
    red(1)._2 shouldBe "nothing sensitive here 123"
    val counts = TextAnalysis.piiCounts(col("text"))
      .foldLeft(df)((d, c) => d.withColumn(c._1, c._2))
    counts.filter(col("id") === 1).select("email_count", "ipv4_count", "ssn_count", "card_count")
      .as[(Long, Long, Long, Long)].head() shouldBe ((1L, 1L, 1L, 1L))
  }

  test("mixtureSample applies per-group rates deterministically") {
    val df = spark.range(9000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp"))
    val rates = Map("0" -> 0.9, "1" -> 0.2)
    val out = Sampling.mixtureSample(df, "id", "grp", rates, defaultRate = 0.0)
    val out2 = Sampling.mixtureSample(df.repartition(11), "id", "grp", rates)
    out.orderBy("id").collect() shouldBe out2.orderBy("id").collect()
    def kept(g: String) = out.filter(col("grp") === g).count().toDouble / 3000
    kept("0") shouldBe 0.9 +- 0.03
    kept("1") shouldBe 0.2 +- 0.03
    kept("2") shouldBe 0.0
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureSample(df, "id", "grp", Map("0" -> 1.0))
  }

  test("budgetedMixture fills each domain to within one doc of its budget") {
    val df = spark.range(600).select(col("id"),
      (col("id") % 3).cast("string").as("source"),
      (col("id") % 7 + 1).as("tok")) // 1..7 tokens per row
    val budgets = Map("0" -> 200L, "1" -> 50L)
    val out = Sampling.budgetedMixture(df, col("tok"), budgets,
      keyCol = "id", groupCol = "source")
    // every admitted doc started under budget; totals overshoot < one doc
    def total(g: String) = out.filter(col("source") === g)
      .agg(sum("token_count")).as[Long].head()
    total("0") should (be >= 200L and be < 207L)
    total("1") should (be >= 50L and be < 57L)
    out.filter(col("source") === "2").count() shouldBe 0 // default budget 0
    // prefix property: a bigger budget extends the same subset
    val more = Sampling.budgetedMixture(df, col("tok"),
      Map("0" -> 400L, "1" -> 50L), keyCol = "id", groupCol = "source")
    val small = out.select("id").as[Long].collect().toSet
    val big = more.select("id").as[Long].collect().toSet
    small.subsetOf(big) shouldBe true
    // partition-independence
    val repart = Sampling.budgetedMixture(df.repartition(13), col("tok"),
      budgets, keyCol = "id", groupCol = "source")
    repart.select("id").as[Long].collect().toSet shouldBe small
  }

  test("alphaMixture flattens quotas toward tail sources; fill is stable md5 prefix") {
    val docs = (Seq.tabulate(80)(i => (i.toLong, "big")) ++
      Seq.tabulate(20)(i => (100L + i, "small"))).toDF("doc_id", "source")
    // alpha = 1: proportional (80/20 of a 50-doc budget -> 40/10)
    val prop = graft.sampling.Sampling.alphaMixture(docs, budget = 50, alpha = 1.0)
    prop.groupBy("source").count().as[(String, Long)].collect().toMap shouldBe
      Map("big" -> 40L, "small" -> 10L)
    // alpha = 0: uniform per source (25/25)
    val flat = graft.sampling.Sampling.alphaMixture(docs, budget = 50, alpha = 0.0)
    flat.groupBy("source").count().as[(String, Long)].collect().toMap shouldBe
      Map("big" -> 25L, "small" -> 20L) // small has only 20 docs
    // 0 < alpha < 1 sits between: small's share grows vs proportional
    val mid = graft.sampling.Sampling.alphaMixture(docs, budget = 50, alpha = 0.5)
    val midCounts = mid.groupBy("source").count().as[(String, Long)].collect().toMap
    midCounts("small") should be > 10L
    midCounts("big") should be > midCounts("small")
    // a bigger budget extends the SAME per-source prefix (stable md5 order)
    val small50 = mid.filter(col("source") === "big").select("doc_id")
      .as[Long].collect().toSet
    val mid80 = graft.sampling.Sampling.alphaMixture(docs, budget = 80, alpha = 0.5)
    small50.subsetOf(mid80.filter(col("source") === "big").select("doc_id")
      .as[Long].collect().toSet) shouldBe true
  }

  test("alphaMixture: NULL source keys form one quota-bearing group; empty input is empty") {
    // 30 null-source docs + 70 "a" docs, alpha=1, budget 10 -> 3/7 split
    val docs = (Seq.tabulate(30)(i => (i.toLong, null: String)) ++
      Seq.tabulate(70)(i => (100L + i, "a"))).toDF("doc_id", "source")
    val out = graft.sampling.Sampling.alphaMixture(docs, budget = 10, alpha = 1.0)
    out.filter(col("source").isNull).count() shouldBe 3
    out.filter(col("source") === "a").count() shouldBe 7
    // determinism across partitionings (null group shuffles like any other)
    val repart = graft.sampling.Sampling.alphaMixture(
      docs.repartition(7), budget = 10, alpha = 1.0)
    repart.select("doc_id").as[Long].collect().toSet shouldBe
      out.select("doc_id").as[Long].collect().toSet
    // empty input: no groups, no quota, no rows — and no 0/0 blowup
    val empty = graft.sampling.Sampling.alphaMixture(
      docs.limit(0), budget = 10, alpha = 0.5)
    empty.count() shouldBe 0
  }

  test("vocabulary builds ranked token counts; threshold and cap apply") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana apple date"),
      (3L, ""),
      (4L, "cherry banana apple")).toDF("doc_id", "text")
    // model: apple=4, banana=3, cherry=2, date=1
    val all = graft.text.TextAnalysis.vocabulary(docs, topK = 10)
      .orderBy("rank").as[(String, Long, Int)].collect().toSeq
    all shouldBe Seq(("apple", 4L, 1), ("banana", 3L, 2), ("cherry", 2L, 3), ("date", 1L, 4))
    // minCount drops the tail; topK caps the head; ties rank by term
    graft.text.TextAnalysis.vocabulary(docs, minCount = 2)
      .count() shouldBe 3
    val top2 = graft.text.TextAnalysis.vocabulary(docs, topK = 2)
    top2.orderBy("rank").as[(String, Long, Int)].collect().map(_._1).toSeq shouldBe
      Seq("apple", "banana")
    // the single-task rank window is BOUNDED by contract: a finite topK is
    // applied before it as a distributed TakeOrderedAndProject, and the
    // unbounded (minCount = 1, topK = unbounded) combination refuses loudly
    top2.queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
    val e = intercept[IllegalArgumentException] {
      graft.text.TextAnalysis.vocabulary(docs)
    }
    e.getMessage should include("topK")
  }

  test("curriculumShards: score-blind assignment, best-first in-shard order") {
    val docs = Seq.tabulate(60)(i => (i.toLong, (i % 10).toDouble))
      .toDF("doc_id", "q")
    val out = graft.sampling.Sampling.curriculumShards(
      docs, numShards = 3, scoreCol = col("q"))
    out.count() shouldBe 60
    // positions are a gapless 0..n-1 sequence per shard
    out.groupBy("shard").agg(count(lit(1)).as("n"), max("curriculum_pos").as("mx"))
      .collect().foreach(r =>
        r.getAs[Long]("mx") shouldBe r.getAs[Long]("n") - 1)
    // within a shard, score never increases as position advances
    val rows = out.select("shard", "curriculum_pos", "score")
      .as[(Int, Long, Double)].collect()
      .groupBy(_._1).values
    rows.foreach { shard =>
      val ordered = shard.sortBy(_._2).map(_._3)
      ordered.zip(ordered.tail).foreach { case (a, b) => a should be >= b }
    }
    // assignment ignores the score: same shards as shardCorpus
    val plain = graft.sampling.Sampling.shardCorpus(docs, 3)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    out.select("doc_id", "shard").as[(Long, Int)].collect().toMap shouldBe plain
  }

  test("oovReport: per-source token coverage against a vocabulary") {
    val docs = Seq(
      (1L, "a b c a", "s1"),
      (2L, "a x", "s1"),
      (3L, "", "s2"),
      (4L, "y y b", "s2")).toDF("doc_id", "text", "source")
    val vocab = Seq("a", "b").toDF("term")
    val out = graft.text.TextAnalysis.oovReport(docs, vocab).orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    out shouldBe Seq(("s1", 6L, 2L, 0.333333), ("s2", 3L, 2L, 0.666667))
  }

  test("marginMining suppresses hub vectors that plain cosine would pick") {
    // corpus label 1: a "hub" equally close to EVERY query (cos = 1/sqrt(3)
    // ~ 0.577 to each) and a "partner" whose only affinity is query 0 at
    // cos = 0.5. Raw cosine ranks the hub first for query 0 (0.577 > 0.5);
    // the ratio margin divides the hub's score by its crowded neighborhood
    // (avg_c = 0.577) while the partner's neighborhood is sparse
    // (avg_c = 0.25), so the mutual pair (q0, partner) wins:
    // margin(q0,hub) = 0.577/0.558 ~ 1.03 < margin(q0,partner) = 0.5/0.394 ~ 1.27.
    val emb = Seq(
      // queries, label 0, mutually orthogonal
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 1f, 0f), 0),
      (10L, Array(1f, 1f, 1f, 0f), 1), // hub
      (11L, Array(0.5f, 0f, 0f, 0.866025f), 1) // partner of q0 only
    ).toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb.filter(col("vec_id") >= 10)
    val out = graft.similarity.Similarity
      .marginMining(corpus, queries, k = 2, minMargin = 0.0, bits = 0) // exact tier
      .orderBy("query_id").collect()
    out.length shouldBe 3
    // query 0 mines the partner despite the hub's higher raw cosine
    out.head.getAs[Long]("query_id") shouldBe 0L
    out.head.getAs[Long]("neighbor_id") shouldBe 11L
    // queries 1 and 2 have no partner — the hub is their honest best
    out(1).getAs[Long]("neighbor_id") shouldBe 10L
    out(2).getAs[Long]("neighbor_id") shouldBe 10L
    out.foreach(r => assert(!r.getAs[Double]("margin").isNaN))
  }

  test("marginMining's pruned tier joins on cells: no nested-loop scan, margins on kNN lists") {
    // pruned (default) tier: the candidate join is a broadcast EQUI-join on
    // the sign-bit cell — the plan must carry no BroadcastNestedLoopJoin /
    // CartesianProduct, and the windows see only probed-cell candidates
    val emb = Seq(
      (0L, Array(1f, 1f, 1f, 1f), 0), // query: cell 15, probes {15,14,13,11,7}
      (10L, Array(0.9f, 1f, 1f, 1f), 1), // cell 15 — probed, cos ~ 0.998
      (11L, Array(-1f, -1f, -1f, 1f), 1), // cell 8 — NOT probed (hamming 3)
      (12L, Array(1f, 1f, 1f, -1f), 1) // cell 7 — probed, cos = 0.5
    ).toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") === 0)
    val corpus = emb.filter(col("vec_id") >= 10)
    val mined = graft.similarity.Similarity
      .marginMining(corpus, queries, k = 2, minMargin = 0.0)
    val plan = mined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val rows = mined.collect()
    rows.length shouldBe 1
    // vec 11 is outside the probed neighborhood: even though its cosine is
    // defined, it never becomes a candidate; the best probed candidate wins
    rows.head.getAs[Long]("neighbor_id") shouldBe 10L
  }

  test("hardNegatives pruned tier (bits > 0) equi-joins on cells like marginMining") {
    val emb = Seq(
      (0L, Array(1f, 1f, 1f, 1f), 0), // query: cell 15, probes hamming<=1
      (10L, Array(0.9f, 1f, 1f, 1f), 1), // cell 15 — probed
      (11L, Array(-1f, -1f, -1f, 1f), 1), // cell 8 — NOT probed
      (12L, Array(1f, 1f, 1f, -1f), 1) // cell 7 — probed
    ).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity.hardNegatives(
      emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") === 0),
      k = 5, bits = 4)
    val plan = out.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    // only the probed neighborhood is mined
    out.select("neighbor_id").as[Long].collect().sorted shouldBe Array(10L, 12L)
  }

  test("dsirSelect ranks target-distribution-like docs first, exact and deterministic") {
    // target: 30 docs over a small shared vocabulary; corpus: 10 docs that
    // share it and 30 noise docs with per-doc-unique tokens (plus one
    // empty). Importance weights must put every target-like doc ahead of
    // every noise doc, with positive scores for the former.
    val target = (0 until 30).map(i => (1000L + i, "alpha beta gamma delta", "tgt"))
      .toDF("doc_id", "text", "source")
    val corpus = ((0 until 10).map(i => (i.toLong, "alpha beta gamma", "w")) ++
      (10 until 40).map(i => (i.toLong, s"zeta$i eta$i theta$i", "w")) :+
      ((40L, "", "w"))).toDF("doc_id", "text", "source")
    val out = Sampling.dsirSelect(corpus, target, budget = 10)
      .as[(Long, Double, Int)].collect()
    out.length shouldBe 10
    out.map(_._1).toSet shouldBe (0L until 10L).toSet
    out.foreach(_._2 should be > 0.0)
    out.map(_._3).sorted shouldBe (1 to 10).toArray
    // deterministic: a second run returns the identical selection
    Sampling.dsirSelect(corpus, target, budget = 10)
      .as[(Long, Double, Int)].collect().sortBy(_._3) shouldBe out.sortBy(_._3)
  }

  test("bm25TopK: rare-term matches outrank common-term matches; tf saturates") {
    // 'apple' appears in most docs (low idf), 'cherry' in exactly one
    // (high idf): for the query "apple cherry" the cherry doc must win
    // even though other docs repeat apple many times (k1 saturation)
    val corpus = (
      Seq((1L, "apple banana"), (2L, "apple apple apple apple apple"),
        (3L, "cherry banana"), (4L, "apple pear"), (5L, "apple plum")) ++
        (6 until 20).map(i => (i.toLong, s"apple filler$i"))
      ).toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry")).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.bm25TopK(corpus, queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    out.length shouldBe 3
    out.head._1 shouldBe 100L
    out.head._2 shouldBe 3L // the cherry doc
    // repeated 'apple' saturates: doc 2 cannot beat the rare-term match
    out.head._3 should be > out(1)._3
    // every score positive, ranks dense
    out.foreach(_._3 should be > 0.0)
    out.map(_._4) shouldBe Array(1, 2, 3)
    // deterministic across runs
    graft.text.TextAnalysis.bm25TopK(corpus, queries, k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4) shouldBe out
  }

  test("bm25TopK plan: every join is broadcast — the corpus never shuffles on term") {
    // the Zipf-skewed term key must never be a shuffle-join key: the query
    // side broadcasts into the postings, and df (query terms only) is a
    // bounded broadcast frame. A refactor that reintroduces the
    // postings-by-term shuffle (the round-9 defect) fails here.
    val corpus = (0 until 200)
      .map(i => (i.toLong, s"alpha beta w$i x${i % 7} y${i % 3}"))
      .toDF("doc_id", "text")
    val queries = Seq((900L, "alpha x3"), (901L, "beta y1")).toDF("doc_id", "text")
    val plan = graft.text.TextAnalysis.bm25TopK(corpus, queries, k = 5)
      .queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
      "BroadcastNestedLoopJoin").foreach { op =>
      withClue(s"$op in bm25 plan:\n$plan\n") { plan.contains(op) shouldBe false }
    }
  }

  test("persisted BM25 index: build + incremental append is score-identical " +
    "to the direct scan at non-default k1/b") {
    val base = (
      Seq((1L, "apple banana"), (2L, "apple apple apple apple apple"),
        (3L, "cherry banana"), (4L, "apple pear"), (5L, "apple plum")) ++
        (6 until 20).map(i => (i.toLong, s"apple filler$i"))
      ).toDF("doc_id", "text")
    val batch = Seq((20L, "cherry plum"), (21L, "banana cherry cherry"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, "apple cherry"), (101L, "banana plum"))
      .toDF("doc_id", "text")
    val dir = tmpDir("bm25idx").resolve("t").toString
    val idx = graft.text.TextAnalysis.buildBm25Index(spark, dir, base, buckets = 8)
    graft.text.TextAnalysis.appendBm25Batch(idx, batch)
    // non-default parameters: the micro-unit discipline must hold under
    // parameter variation, not just the k1=1.2/b=0.75 defaults q103 pins
    val viaIndex = graft.text.TextAnalysis
      .bm25SearchIndex(idx, queries, k = 4, k1 = 1.5, b = 0.4)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val direct = graft.text.TextAnalysis
      .bm25TopK(base.union(batch), queries, k = 4, k1 = 1.5, b = 0.4)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    viaIndex shouldBe direct
    // the appended docs are live (cherry-rich doc 21 wins the cherry query)
    viaIndex.filter(_._1 == 100L).head._2 shouldBe 21L
  }

  test("persisted BM25 index search reads ONLY the probed buckets' files") {
    val corpus = (0 until 64)
      .map(i => (i.toLong, s"alpha w$i x${i % 7} y${i % 3} z${i % 5}"))
      .toDF("doc_id", "text")
    val dir = tmpDir("bm25idx-prune").resolve("t").toString
    val idx = graft.text.TextAnalysis.buildBm25Index(spark, dir, corpus, buckets = 16)
    val all = idx.toDf.inputFiles
    all.length should be >= 16 // one+ file per populated bucket partition
    val out = graft.text.TextAnalysis.bm25SearchIndex(idx,
      Seq((900L, "alpha")).toDF("doc_id", "text"), k = 3)
    out.count() shouldBe 3
    // the single-term query resolves to ONE bucket; the pruned file-index
    // path (what bm25SearchIndex's toDf.filter hits at execution through
    // GraftFileIndex.listFiles) reads only that bucket's files — the
    // corpus parquet is never rescanned (index files only by construction)
    val bucket = Seq("alpha").toDF("term")
      .select(pmod(hash(col("term")), lit(16))).collect()(0).getInt(0)
    val pruned = idx.read(Seq(col("bucket") === bucket)).inputFiles
    pruned.length should be >= 1
    pruned.length should be < all.length
    pruned.foreach(_ should include(s"bucket=$bucket"))
  }

  test("BM25 index append is atomic (one commit) and leaves no cached RDDs") {
    import graft.text.TextAnalysis
    val base = Seq((1L, "apple banana"), (2L, "cherry plum")).toDF("doc_id", "text")
    val batch = Seq((3L, "banana cherry cherry")).toDF("doc_id", "text")
    val dir = tmpDir("bm25idx-atomic").resolve("t").toString
    val idx = TextAnalysis.buildBm25Index(spark, dir, base, buckets = 4)
    val v0 = idx.version
    TextAnalysis.appendBm25Batch(idx, batch)
    // postings AND stats land in ONE commit: exactly one version advanced,
    // and the pre-append version still shows the OLD stats with the OLD
    // postings — no intermediate postings-without-stats state exists
    idx.version shouldBe v0 + 1
    idx.properties("graft.bm25.numDocs").toLong shouldBe 3L
    idx.properties("graft.bm25.totalLen").toLong shouldBe 7L
    // batch "banana cherry cherry" = 2 new (doc,term) postings rows
    idx.versionAsOf(v0).count() shouldBe idx.toDf.count() - 2
    // search leaves nothing pinned in the block manager (the r10 leak)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    TextAnalysis.bm25SearchIndex(idx,
      Seq((9L, "cherry")).toDF("doc_id", "text"), k = 2).collect()
    spark.sparkContext.getPersistentRDDs.size shouldBe cachedBefore
  }

  test("BM25 index append with a batchId is idempotent: replay is a full no-op") {
    import graft.text.TextAnalysis
    val base = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val batch = Seq((2L, "banana cherry")).toDF("doc_id", "text")
    val dir = tmpDir("bm25idx-idem").resolve("t").toString
    val idx = TextAnalysis.buildBm25Index(spark, dir, base, buckets = 4)
    TextAnalysis.appendBm25Batch(idx, batch, batchId = Some("b-1"))
    val v1 = idx.version
    val rows1 = idx.toDf.count()
    val stats1 = (idx.properties("graft.bm25.numDocs"),
      idx.properties("graft.bm25.totalLen"))
    // the crash-replay twin: same batchId → postings never duplicate and
    // the stats never double-advance (df would silently double otherwise)
    TextAnalysis.appendBm25Batch(idx, batch, batchId = Some("b-1"))
    idx.version shouldBe v1
    idx.toDf.count() shouldBe rows1
    (idx.properties("graft.bm25.numDocs"),
      idx.properties("graft.bm25.totalLen")) shouldBe stats1
    // a DIFFERENT batchId appends normally
    TextAnalysis.appendBm25Batch(idx,
      Seq((3L, "plum")).toDF("doc_id", "text"), batchId = Some("b-2"))
    idx.properties("graft.bm25.numDocs").toLong shouldBe 3L
  }

  test("BM25 concurrent appends: stats deltas both land (no lost update)") {
    import graft.text.TextAnalysis
    val base = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val dir = tmpDir("bm25idx-conc").resolve("t").toString
    val idx = TextAnalysis.buildBm25Index(spark, dir, base, buckets = 4)
    // two appenders race: the property delta recomputes from the FRESH
    // snapshot inside the CAS retry loop, so neither batch's numDocs /
    // totalLen advance is lost (the r10 read-modify-write hazard)
    val batches = Seq(
      Seq((10L, "cherry plum")).toDF("doc_id", "text"),
      Seq((11L, "fig date olive")).toDF("doc_id", "text"))
    val threads = batches.zipWithIndex.map { case (b, i) =>
      new Thread(() => TextAnalysis.appendBm25Batch(
        graft.table.LakeTable.forPath(spark, dir), b, batchId = Some(s"conc-$i")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val t = graft.table.LakeTable.forPath(spark, dir)
    t.properties("graft.bm25.numDocs").toLong shouldBe 3L
    t.properties("graft.bm25.totalLen").toLong shouldBe 2L + 2L + 3L
  }

  test("df-capped BM25 index: head terms pruned from postings and scoring") {
    import graft.text.TextAnalysis
    // 'common' is in every doc (df=8 > cap=6); 'rare*' terms survive
    val corpus = (1 to 8)
      .map(i => (i.toLong, s"common rare$i shared${i % 2}"))
      .toDF("doc_id", "text")
    val capDir = tmpDir("bm25idx-cap").resolve("t").toString
    val capIdx = TextAnalysis.buildBm25Index(spark, capDir, corpus,
      buckets = 4, dfCap = 6)
    val fullDir = tmpDir("bm25idx-full").resolve("t").toString
    val fullIdx = TextAnalysis.buildBm25Index(spark, fullDir, corpus, buckets = 4)
    // the cap is recorded, the capped list is exactly the Zipf head, and
    // the index physically shrinks (that is the point of the cap)
    capIdx.properties("graft.bm25.dfCap") shouldBe "6"
    capIdx.properties("graft.bm25.cappedTerms") shouldBe "common"
    capIdx.toDf.count() shouldBe fullIdx.toDf.count() - 8
    // stats are cap-independent: doc lengths still count capped tokens
    capIdx.properties("graft.bm25.numDocs") shouldBe
      fullIdx.properties("graft.bm25.numDocs")
    capIdx.properties("graft.bm25.totalLen") shouldBe
      fullIdx.properties("graft.bm25.totalLen")
    // scoring: a capped term contributes nothing, so a mixed query on the
    // capped index scores EXACTLY like the surviving terms alone on the
    // full index (same n/total/len/df for every surviving term)
    val mixed = TextAnalysis.bm25SearchIndex(capIdx,
      Seq((90L, "common rare3")).toDF("doc_id", "text"), k = 4)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    val survivingOnly = TextAnalysis.bm25SearchIndex(fullIdx,
      Seq((90L, "rare3")).toDF("doc_id", "text"), k = 4)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    mixed shouldBe survivingOnly
    // a query of ONLY capped terms matches nothing
    TextAnalysis.bm25SearchIndex(capIdx,
      Seq((91L, "common")).toDF("doc_id", "text"), k = 4).count() shouldBe 0L
    // appended batches drop the frozen capped terms too
    TextAnalysis.appendBm25Batch(capIdx,
      Seq((9L, "common rare9")).toDF("doc_id", "text"))
    capIdx.toDf.filter(col("term") === "common").count() shouldBe 0L
    capIdx.toDf.filter(col("term") === "rare9").count() shouldBe 1L
  }

  test("OPTIMIZE on a BM25 index table: search identical, pruning intact") {
    import graft.text.TextAnalysis
    // the steady-state shape: many small appends fragment the index, then
    // maintenance compacts it — scores, stats, and bucket pruning must all
    // survive (the index is a normal lake table, so OPTIMIZE just works)
    val base = Seq((1L, "apple banana"), (2L, "cherry plum")).toDF("doc_id", "text")
    val dir = tmpDir("bm25idx-opt").resolve("t").toString
    val idx = TextAnalysis.buildBm25Index(spark, dir, base, buckets = 4)
    (3 to 10).foreach { i =>
      TextAnalysis.appendBm25Batch(idx,
        Seq((i.toLong, s"apple plum w$i")).toDF("doc_id", "text"),
        batchId = Some(s"opt-$i"))
    }
    val queries = Seq((90L, "apple cherry"), (91L, "plum w7")).toDF("doc_id", "text")
    val before = TextAnalysis.bm25SearchIndex(idx, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val filesBefore = idx.toDf.inputFiles.length
    idx.optimizeCompact()
    idx.toDf.inputFiles.length should be < filesBefore
    // scores and stats identical through the rewrite
    TextAnalysis.bm25SearchIndex(idx, queries, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .sortBy(r => (r._1, r._4)) shouldBe before
    idx.properties("graft.bm25.numDocs").toLong shouldBe 10L
    // bucket partition pruning still engages on the compacted layout
    val all = idx.toDf.inputFiles.length
    val bucket = Seq(("apple", 1)).toDF("term", "x")
      .select(pmod(hash(col("term")), lit(4))).collect()(0).getInt(0)
    val pruned = idx.read(Seq(col("bucket") === bucket)).inputFiles.length
    pruned should be < all
    // and appends keep working after the rewrite (ledger included)
    TextAnalysis.appendBm25Batch(idx,
      Seq((11L, "banana")).toDF("doc_id", "text"), batchId = Some("opt-11"))
    TextAnalysis.appendBm25Batch(idx,
      Seq((11L, "banana")).toDF("doc_id", "text"), batchId = Some("opt-11"))
    idx.properties("graft.bm25.numDocs").toLong shouldBe 11L
  }

  test("rrfFuse at non-default rrfK: nano-unit sums replay exactly") {
    val sysA = Seq((9L, 1L, 1), (9L, 5L, 2), (9L, 2L, 3)).toDF("query_id", "doc_id", "rank")
    val sysB = Seq((9L, 3L, 1), (9L, 5L, 2), (9L, 4L, 3)).toDF("query_id", "doc_id", "rank")
    val out = graft.similarity.Similarity.rrfFuse(Seq(sysA, sysB), k = 3, rrfK = 10)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // smaller rrfK weights top ranks harder; consensus doc 5 still wins:
    // 2 * floor(1e9/12 + 0.5) vs doc 1's floor(1e9/11 + 0.5)
    out.map(_._2) shouldBe Array(5L, 1L, 3L)
    out.head._3 shouldBe (math.floor(1e9 / 12 + 0.5) * 2 / 1e9) +- 1e-12
    out(1)._3 shouldBe (math.floor(1e9 / 11 + 0.5) / 1e9) +- 1e-12
  }

  test("stratifiedSplit: EXACT floor(f*n) train rows in every stratum, deterministic") {
    // small uneven strata — exactly where the expectation-only hash split
    // misses its fraction
    val df = ((0 until 10).map(i => (i.toLong, "a")) ++
      (10 until 13).map(i => (i.toLong, "b")) ++
      (13 until 20).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val out = Sampling.stratifiedSplit(df, "doc_id", "source", trainFraction = 0.8)
      .as[(Long, String, String)].collect()
    out.length shouldBe 20
    val byGroup = out.groupBy(_._2).view.mapValues(_.count(_._3 == "train")).toMap
    byGroup shouldBe Map("a" -> 8, "b" -> 2, "c" -> 5) // floor(0.8 * {10,3,7})
    // deterministic: identical assignment on a second run
    Sampling.stratifiedSplit(df, "doc_id", "source", trainFraction = 0.8)
      .as[(Long, String, String)].collect().sortBy(_._1) shouldBe out.sortBy(_._1)
  }

  test("rrfFuse: consensus docs outrank single-system leaders; absent docs contribute nothing") {
    // doc 5 is rank 2 in BOTH systems -> 1/62 + 1/62 ~ 0.0323 beats doc 1
    // (rank 1 in one system only -> 1/61 ~ 0.0164)
    val sysA = Seq((9L, 1L, 1), (9L, 5L, 2), (9L, 2L, 3)).toDF("query_id", "doc_id", "rank")
    val sysB = Seq((9L, 3L, 1), (9L, 5L, 2), (9L, 4L, 3)).toDF("query_id", "doc_id", "rank")
    val out = graft.similarity.Similarity.rrfFuse(Seq(sysA, sysB), k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    out.map(_._2) shouldBe Array(5L, 1L, 3L) // consensus first, then rank-1s (doc_id tiebreak)
    out.head._3 shouldBe (math.floor(1e9 / 62 + 0.5) * 2 / 1e9) +- 1e-12
    // ranks dense, deterministic
    out.map(_._4) shouldBe Array(1, 2, 3)
  }

  test("perplexityTiers: per-language head/middle/tail thirds by LM perplexity") {
    val docs = (
      (0 until 3).map(i => (i.toLong, "the cat sat the cat sat the cat sat", "A")) ++
        (3 until 6).map(i => (i.toLong, s"the cat sat on mat$i", "A")) ++
        (6 until 9).map(i => (i.toLong, s"zx$i qw$i er$i ty$i", "A")) ++
        (9 until 12).map(i => (i.toLong, "le chat dort le chat dort", "B")) ++
        (12 until 15).map(i => (i.toLong, s"ab$i cd$i ef$i gh$i", "B"))
      ).toDF("doc_id", "text", "lang")
    val out = graft.text.TextAnalysis.perplexityTiers(docs)
      .select("doc_id", "lang", "tier").as[(Long, String, String)].collect()
    out.length shouldBe 15
    val byLang = out.groupBy(_._2)
    // A: 9 docs -> 3/3/3; repeated-common-bigram docs are the head,
    // all-unique-bigram docs the tail
    val a = byLang("A")
    a.count(_._3 == "head") shouldBe 3
    a.count(_._3 == "middle") shouldBe 3
    a.count(_._3 == "tail") shouldBe 3
    a.filter(_._3 == "head").map(_._1).toSet shouldBe Set(0L, 1L, 2L)
    a.filter(_._3 == "tail").map(_._1).toSet shouldBe Set(6L, 7L, 8L)
    // B: 6 docs -> 2/2/2; the clean docs fill the head, noisy fill the tail
    val bLang = byLang("B")
    bLang.count(_._3 == "head") shouldBe 2
    bLang.filter(_._3 == "head").map(_._1).forall(_ < 12L) shouldBe true
    bLang.filter(_._3 == "tail").map(_._1).forall(_ >= 12L) shouldBe true
  }

  test("dsirResample: Gumbel-top-k is deterministic; tiny temperature recovers top-k") {
    val target = (0 until 30).map(i => (1000L + i, "alpha beta gamma delta", "tgt"))
      .toDF("doc_id", "text", "source")
    val corpus = ((0 until 10).map(i => (i.toLong, "alpha beta gamma", "w")) ++
      (10 until 40).map(i => (i.toLong, s"zeta$i eta$i theta$i", "w")))
      .toDF("doc_id", "text", "source")
    // deterministic: two runs return the identical draw
    val a = Sampling.dsirResample(corpus, target, budget = 15, temperature = 1.0)
      .as[(Long, Double, Double, Int)].collect().sortBy(_._4)
    val b = Sampling.dsirResample(corpus, target, budget = 15, temperature = 1.0)
      .as[(Long, Double, Double, Int)].collect().sortBy(_._4)
    a shouldBe b
    a.length shouldBe 15
    a.map(_._4) shouldBe (1 to 15).toArray
    // T -> 0: the score term dominates the bounded Gumbel noise, so the
    // SELECTED SET equals the deterministic top-k's (order inside equal-
    // score groups is the noise's to pick)
    val tiny = Sampling.dsirResample(corpus, target, budget = 10, temperature = 1e-6)
      .select("doc_id").as[Long].collect().toSet
    val topk = Sampling.dsirSelect(corpus, target, budget = 10)
      .select("doc_id").as[Long].collect().toSet
    tiny shouldBe topk
    // larger T admits noise-lucky docs the pure top-k would exclude — the
    // draw must still be a valid sample (all from the corpus, dense ranks)
    val warm = Sampling.dsirResample(corpus, target, budget = 15, temperature = 5.0)
      .as[(Long, Double, Double, Int)].collect()
    warm.map(_._1).toSet.subsetOf((0L until 40L).toSet) shouldBe true
    warm.map(_._4).sorted shouldBe (1 to 15).toArray
  }

  test("trained-codebook pruned tier holds a recall bound against the exact tier") {
    // clustered data where a trained codebook is data-adaptive: 4 Gaussian
    // clusters in 8 dims, deterministic seed. The pruned tier routed
    // through sampled IVF centroids must recover most of the exact tier's
    // hard negatives, with the candidate join still a broadcast EQUI-join.
    val rnd = new scala.util.Random(7)
    def vec(c: Int): Array[Float] = Array.tabulate(8) { i =>
      ((if (i % 4 == c) 1.0 else 0.0) + rnd.nextGaussian() * 0.3).toFloat
    }
    val emb = (0 until 220).map(i => (i.toLong, vec(i % 4), i % 4))
      .toDF("vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
    val S = graft.similarity.Similarity
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(S.hardNegatives(corpus, queries, k = 5)) // bits=0 baseline
    val cents = S.sampleCentroids(corpus, nlist = 8)
    val prunedDf = S.hardNegatives(corpus, queries, k = 5, centroids = cents, nprobe = 3)
    prunedDf.queryExecution.executedPlan.toString should
      not include "BroadcastNestedLoopJoin"
    val pruned = topSets(prunedDf)
    val recall = exact.map { case (q, ex) =>
      pruned.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }.sum / exact.size
    withClue(s"recall=$recall: ") { recall should be >= 0.7 }
    // marginMining rides the same trained tier: sane mined pairs, equi-join
    val mined = S.marginMining(corpus, queries, k = 3, minMargin = 0.0,
      centroids = cents, nprobe = 3)
    mined.queryExecution.executedPlan.toString should
      not include "BroadcastNestedLoopJoin"
    val rows = mined.collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[Double]("margin").isNaN shouldBe false
      (r.getAs[Long]("neighbor_id") % 4) should not be (r.getAs[Long]("query_id") % 4)
    }
  }

  test("hardNegatives excludes the query's own label group and ranks by cosine") {
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0), // label 0 (positives)
      (2L, Array(0.8f, 0.2f), 1), (3L, Array(0f, 1f), 1), // label 1
      (4L, Array(0.7f, 0.3f), 2) // label 2
    ).toDF("vec_id", "embedding", "label")
    val out = graft.similarity.Similarity.hardNegatives(
      emb, emb.filter(col("vec_id") === 0), k = 2).collect()
    out.length shouldBe 2
    // own-label vec 1 (cosine ~0.994, the nearest overall) must NOT appear
    out.map(_.getAs[Long]("neighbor_id")).toSet shouldBe Set(2L, 4L)
    // ranked by cosine desc: 2 (0.970) before 4 (0.919)
    out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id")).toSeq shouldBe
      Seq(2L, 4L)
  }

  test("upsample emits floor(w) copies plus a stable fractional extra") {
    val df = spark.range(4000).toDF("id")
    val out = Sampling.upsample(df, "id", 2.5)
    out.count().toDouble / 4000 shouldBe 2.5 +- 0.1
    // every key appears at least twice, copy indexes are dense from 0
    val byKey = out.groupBy("id").agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
    byKey.filter(col("n") < 2 || col("n") > 3).count() shouldBe 0
    byKey.filter(col("mx") =!= col("n") - 1).count() shouldBe 0
    // weight < 1 degrades to deterministicSample with a copy tag
    val down = Sampling.upsample(df, "id", 0.25)
    down.count().toDouble / 4000 shouldBe 0.25 +- 0.03
  }

  test("packSequences cuts shards at the token budget in order") {
    val df = Seq(
      ("s", 1L, 40L), ("s", 2L, 50L), ("s", 3L, 20L), // cum-before 0,40,90
      ("s", 4L, 30L),                                 // cum-before 110 -> pack 1
      ("t", 1L, 250L)                                 // own shard, pack 0
    ).toDF("src", "id", "n")
    val out = Sampling.packSequences(df, "id", "n", "src", budget = 100L)
      .orderBy("src", "id")
      .select("src", "id", "pack_id", "pack_pos")
      .as[(String, Long, String, Int)].collect()
    out shouldBe Array(
      ("s", 1L, "s#0", 0), ("s", 2L, "s#0", 1), ("s", 3L, "s#0", 2),
      ("s", 4L, "s#1", 0), ("t", 1L, "t#0", 0))
  }

  test("sessionize splits on the gap rule and aggregates exactly") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    val events = Seq(
      // user 1: events at 0, 10, 29 min (one session), then 70 (gap 41 -> new)
      (1L, ts(0), 10L, "view", 1.0), (2L, ts(10), 10L, "click", 2.0),
      (3L, ts(29), 10L, "view", 3.0), (4L, ts(70), 10L, "purchase", 4.0),
      // user 2: single event
      (5L, ts(5), 20L, "view", 0.5)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.transform.Sessionize.summarize(events)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "session_events", "distinct_event_types",
        "session_value")
      .as[(Long, Long, Long, Long, Double)].collect()
    out shouldBe Array(
      (10L, 0L, 3L, 2L, 6.0), (10L, 1L, 1L, 1L, 4.0), (20L, 0L, 1L, 1L, 0.5))
    // a gap of exactly 30 minutes does NOT split (rule is strictly greater)
    val border = Seq((1L, ts(0), 1L, "a", 1.0), (2L, ts(30), 1L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    graft.transform.Sessionize.summarize(border).count() shouldBe 1
  }

  test("convertCurrency multiplies exactly and flags unknown currencies") {
    val df = Seq((1L, 100.50, "EUR"), (2L, 10.00, "USD"), (3L, 5.0, "XXX"))
      .toDF("id", "amount", "currency")
    val out = Silver.convertCurrency(df, "amount", "currency",
      Map("EUR" -> BigDecimal("1.10"), "GBP" -> BigDecimal("1.27")))
      .orderBy("id")
    val rows = out.select("amount_USD", "conversion_rate").collect()
    rows(0).getDecimal(0).toPlainString shouldBe "110.55"
    rows(1).getDecimal(0).toPlainString shouldBe "10.00"
    rows(2).isNullAt(0) shouldBe true
    rows(2).isNullAt(1) shouldBe true
  }
}

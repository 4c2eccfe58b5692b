package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.{Pq, Quantize, Similarity}
import graft.text.TextAnalysis

/** Training-data pipeline queries over the documents/embeddings tables:
  * dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * ANN search (brute-force + IVF), text analysis, multimodal features. */
object DataOps {

  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, sfDir))

  /** Full MinHash+LSH pipeline, exactly gated: banded-minhash candidates
    * over 3-gram shingles, exact Jaccard verification — output equals the
    * all-pairs shingle-Jaccard result (DuckDB-checkable) with no all-pairs
    * stage. [[Dedup.minhashLshPairs]] (estimate-only) remains the cheap
    * variant and is unit-tested against this one. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    // 32 hashes / 16 bands (r=2): a J=0.8 pair escapes banding with
    // probability (1-0.64)^16 ≈ 8e-8, and candidates are exact-verified,
    // so the output is the all-pairs result at half the signature cost
    Dedup.shingleJaccardLsh(Tables.documents(spark, sfDir), minJaccard = 0.8,
      numHashes = 32, bands = 16)
      .orderBy("a", "b")

  /** Near-dup clustering end-to-end: LSH pairs (q22's exact-verified
    * operator) → connected components → per-doc group id + canonical keep
    * flag. The oracle recomputes the clusters with a recursive CTE over
    * the same exact-Jaccard pair set, so the driver gates the clustering
    * algorithm itself, not a lucky pair list. */
  def nearDupGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.shingleJaccardLsh(docs, minJaccard = 0.8,
      numHashes = 32, bands = 16)
    Dedup.nearDupGroups(docs.select("doc_id"), pairs)
      .select(col("doc_id"), col("group_id"), col("is_canonical"))
      .orderBy("doc_id")
  }

  /** As-of join gate: every purchase event picks up the user's latest
    * view at-or-before it (point-in-time lookup). The views are
    * pre-aggregated to one row per (user, time) so the as-of match is
    * deterministic; the oracle is the naive range-join + per-row argmax
    * the operator's union-window plan avoids. */
  def asOfLastView(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("view_us"))
      .agg(max(col("event_id")).as("view_id"))
      .withColumn("view_time_us", col("view_us"))
    Joins.asOfJoin(purchases, views, Seq("user_id"), "purchase_us", "view_us")
      .select(col("event_id"), col("user_id"), col("purchase_us"),
        col("view_id"),
        (col("purchase_us") - col("view_time_us")).as("view_gap_us"))
      .orderBy("event_id")
  }

  /** Range-join gate: orders land in derived weekly windows purely via
    * interval containment (no equi key anywhere) — the shape Spark would
    * otherwise plan as a nested-loop product. The week calendar derives
    * deterministically from the orders' own date bounds (the one collect
    * is a 2-value aggregate). */
  def weeklyRevenueRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"),
      col("o_totalprice"),
      unix_date(to_date(col("o_orderdate"))).cast("long").as("od"))
    val Array(lo, hi) = o.agg(min("od"), max("od")).collect().head
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val nWeeks = (hi - lo) / 7 + 1
    val weeks = spark.range(nWeeks).select(col("id").as("week_id"),
      (lit(lo) + col("id") * 7).as("w_start"),
      (lit(lo) + col("id") * 7 + 6).as("w_end"))
    Joins.rangeJoin(o, weeks, "od", "w_start", "w_end", binWidth = 7)
      .groupBy("week_id")
      .agg(count(lit(1)).as("order_count"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
      .orderBy("week_id")
  }

  /** Int8 quantization gate: per-vector code checksums and quantization
    * bounds, all pure floor-arithmetic the oracle replays exactly (no
    * hash seeds, no approximation gap to paper over). */
  def quantizeEmbeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Quantize.quantizeInt8(emb)
    q.select(col("vec_id"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c * c).as("code_sumsq"),
        round(col("qmin"), 6).as("qmin"),
        round(col("qmax"), 6).as("qmax"))
      // the reconstruction-error BOUND is asserted in QuantizeSpec; the
      // error VALUE is a max over 64 near-tied doubles whose argmax
      // reshuffles under cross-engine FMA differences — not oracle material
      .orderBy("vec_id")
  }

  /** SimHash gated by its semantic contract, not its (hash-seeded) values:
    * near-dup pairs (exact Jaccard >= 0.8, LSH-found) must sit measurably
    * closer in hamming space than a deterministic O(n) far-pair sample
    * (adjacent doc ids with Jaccard < 0.3). The pair counts are exact and
    * DuckDB-checkable; the separation margin (4 bits) holds with ~9 bits of
    * slack on the test corpus. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // the signature frame feeds four joins (near a/b, far a/b): persist the
    // (id, long) result or the 64-bit-sum aggregation re-runs per join.
    // (No explicit unpersist — the query is returned lazily; Spark's
    // ContextCleaner drops the cached blocks once the frame is GC'd.)
    val sh = Dedup.simhash(docs).persist()
    def hamming(df: DataFrame): DataFrame = df
      .join(sh.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
      .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    val near = hamming(
      Dedup.ngramJaccardPairs(docs, blockCol = "source", minJaccard = 0.8,
        numHashes = 32, bands = 16))
    // deterministic far sample: consecutive doc ids, verified dissimilar
    val t = docs.select(col("doc_id"),
      array_distinct(transform(
        graft.text.TextAnalysis.tokens(col("text")), tk => xxhash64(tk))).as("toks"))
      .withColumn("n", size(col("toks")))
      .persist() // self-joined below: tokenize once
    val far = hamming(t.as("x")
      .join(t.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
      .withColumn("inter", size(array_intersect(col("x.toks"), col("y.toks"))))
      .withColumn("jaccard",
        coalesce(try_divide(col("inter").cast("double"),
          (col("x.n") + col("y.n") - col("inter")).cast("double")), lit(0.0)))
      .filter(col("jaccard") < 0.3)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")))
    near.agg(count(lit(1)).as("near_pairs"), avg("hamming").as("avg_near"))
      .crossJoin(far.agg(count(lit(1)).as("far_pairs"), avg("hamming").as("avg_far")))
      .select(col("near_pairs"), col("far_pairs"),
        (col("avg_near") + 4.0 < col("avg_far")).as("hamming_separated"))
  }

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    // same 32/16 banding rationale as q22: verified output, half the cost
    Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
      blockCol = "source", minJaccard = 0.8, numHashes = 32, bands = 16)

  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // candidates are blocked by the same trained IVF cells the ANN search
    // uses; at cosine 0.35 a qualifying pair can span cluster boundaries,
    // so probe enough cells for full recall vs the exact oracle
    val centroids = Similarity.trainCentroids(emb, nlist = 16)
    Dedup.embeddingNearDupPairs(emb, blockCol = "label", centroids,
      nprobe = 6, minCosine = 0.35)
  }

  /** SemDeDup-style semantic dedup (public method: cluster embeddings,
    * drop all-but-one of each tight cosine cluster): the IVF-cell-blocked
    * exact-cosine pairs feed connected components; every vector gets its
    * cluster's smallest id as `group_id` plus an `is_canonical` keep flag.
    * Filter on the flag to materialize the semantically-deduped corpus. */
  def semanticDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // q28's exact-recall pair pipeline IS the pair source — reusing it
    // keeps q65's pairs and q28's gate in lockstep under recall tuning
    val pairs = embeddingNearDup(spark, sfDir)
    Dedup.nearDupGroups(
      Tables.embeddings(spark, sfDir).select(col("vec_id")), pairs,
      idCol = "vec_id")
      .orderBy("vec_id")
  }

  /** Indexed SemDeDup (q68): same grouping contract as q65, but the IVF
    * codebook comes from a PERSISTED index table's properties instead of
    * retraining KMeans per call — the production shape where the index is
    * a durable artifact and semantic dedup is an incremental corpus
    * operation (like q55/q61's fingerprint/shingle indexes). The q65 gate
    * keeps covering the self-contained path; this gate proves the stored
    * codebook round-trips bit-identically (same oracle). */
  def semanticDedupIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // the index is a DURABLE artifact keyed by corpus: built once (seeded
    // KMeans — deterministic), reused verbatim on every later call, exactly
    // like a production vector index. Rebuilding per call would re-pay the
    // training cost this operator exists to amortize.
    // the shared content-keyed cache (cachedIndexDir): corpus identity in
    // the key, so regenerated testdata invalidates the index instead of
    // silently reusing stale centroids (stale blocking would cost recall
    // the oracle checks)
    val dir = cachedIndexDir(spark, sfDir, "sem-ivf", { d =>
      Similarity.buildIvfIndex(spark, d, emb,
        Similarity.trainCentroids(emb, nlist = 16)): Unit
    }, srcTable = "embeddings")
    val index = graft.table.LakeTable.forPath(spark, dir)
    val centroids = Similarity.storedCentroids(index)
    val pairs = Dedup.embeddingNearDupPairs(emb, blockCol = "label", centroids,
      nprobe = 6, minCosine = 0.35)
    Dedup.nearDupGroups(emb.select(col("vec_id")), pairs, idCol = "vec_id")
      .orderBy("vec_id")
  }

  /** Corpus sharding gate (q69): deterministic training-order shuffle into
    * 8 balanced shards — assignment and intra-shard order are pure
    * md5+instr arithmetic, replayed exactly by the oracle. */
  def shardCorpus(spark: SparkSession, sfDir: String): DataFrame =
    graft.sampling.Sampling.shardCorpus(Tables.documents(spark, sfDir), numShards = 8)
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy("doc_id")

  def annCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  /** Temperature-mixture gate (q77): alpha = 0.5 flattening over the
    * corpus's sources with a 300-doc budget — the mT5-style rebalancing
    * rule. Quotas (floor(budget·n^α/Σn^α)) and each source's md5-rank
    * fill are replayed exactly by the oracle's window SQL. */
  def alphaMixture(spark: SparkSession, sfDir: String): DataFrame =
    graft.sampling.Sampling.alphaMixture(
      Tables.documents(spark, sfDir).select("doc_id", "source"),
      budget = 300L, alpha = 0.5)
      .orderBy("source", "sample_rank")

  /** Dataset-card gate (q82): the per-source corpus statistics report —
    * exact BIGINT sums, one rounded double division, replayed verbatim
    * by the oracle's GROUP BY. */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.corpusStats(Tables.documents(spark, sfDir))
      .orderBy("source")

  /** Vocabulary-build gate (q83): global token frequencies with ranks,
    * minCount=2, top-30 — replayed verbatim by the oracle's
    * unnest + GROUP BY + ROW_NUMBER. */
  def vocabularyBuild(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.vocabulary(Tables.documents(spark, sfDir), minCount = 2, topK = 30)
      .orderBy("rank")

  /** OOV-rate gate (q88): coverage of the top-20/minCount-2 vocabulary per
    * source — replayed by the oracle's unnest + NOT IN over the same
    * ranked vocab CTE. */
  def oovReport(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    TextAnalysis.oovReport(docs,
      TextAnalysis.vocabulary(docs, minCount = 2, topK = 20))
      .orderBy("source")
  }

  /** Margin-mining gate (q84): queries 70..79 (disjoint from every other
    * ANN gate's range) mined against other-label vectors with the
    * ratio-margin criterion, k=4, best pair per query — through the
    * default PRUNED tier (sign-bit cells, hamming-1 multi-probe), whose
    * cell join the oracle replays verbatim. */
  def marginMiningPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.marginMining(emb,
      emb.filter(col("vec_id") >= 70 && col("vec_id") < 80),
      k = 4, minMargin = 0.0)
      .orderBy("query_id")
  }

  /** Image perceptual-dedup gate (q85): every synthetic PNG decoded
    * through the REAL ImageIO path and aHash-fingerprinted; images sharing
    * a hash form a dup group. The oracle re-derives each 64-bit hash
    * arithmetically from doc_id (quadrant grays, integer mean threshold,
    * quadrant bit-masks), so a pass proves the decode+block-mean+threshold
    * pipeline bit-for-bit. Hash serialized as unsigned hex (the driver
    * harness sorts strings; both engines format the same 64 bits). */
  def imageDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // pre-filter by doc_id BEFORE synthesize: the typed map blocks
    // predicate pushdown, so filtering on kind afterwards would still
    // encode every non-image payload (2/3 wasted codec work)
    val media = Multimodal.synthesize(
      Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 0))
    Multimodal.imageAHashes(media).toDF()
      .withColumn("ahash_hex", format_string("%016x", col("ahash")))
      .withColumn("dup_group",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("ahash_hex")))
      .select(col("media_id"), col("ahash_hex"), col("dup_group"))
      .orderBy("media_id")
  }

  /** Image near-dup pair gate (q86): banded-LSH Hamming mining over the
    * decoded aHashes — the oracle re-derives hashes arithmetically and
    * replays the ≤7-bit pair set with an all-pairs bit_count (sound at
    * oracle scale; the engine side never goes all-pairs). */
  def imageNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.synthesize( // doc_id pre-filter: see imageDedup
      Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 0))
    Multimodal.imageNearDupPairs(Multimodal.imageAHashes(media).toDF())
      .orderBy("a", "b")
  }

  /** Audio fingerprint gate (q87): every synthetic WAV decoded through the
    * REAL javax.sound path and energy-profile hashed; the integer
    * cross-multiplied threshold means the oracle re-derives each 12-bit
    * fingerprint exactly from doc_id — a pass proves decode + windowing +
    * thresholding bit-for-bit. */
  def audioDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.synthesize( // doc_id pre-filter: see imageDedup
      Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 1))
    Multimodal.audioHashes(media, windows = 12).toDF()
      .withColumn("dup_group",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("ahash")))
      .select(col("media_id"), col("ahash"), col("dup_group"))
      .orderBy("media_id")
  }

  /** Curriculum-sharding gate (q90): stable hash shards + in-shard
    * best-first ordering by the quality score — shard assignment and score
    * both replayed arithmetically by the oracle. */
  def curriculumShards(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    graft.sampling.Sampling.curriculumShards(docs, numShards = 4,
      scoreCol = TextAnalysis.qualityScore(col("text")))
      .select(col("doc_id"), col("shard"), col("score"), col("curriculum_pos"))
      .orderBy("doc_id")
  }

  /** Dup-statistics gate (q89): the per-source duplication report —
    * md5-digest distinct counts replayed verbatim by the oracle. */
  def dupStats(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.dupStats(Tables.documents(spark, sfDir)).orderBy("source")

  /** Normalized exact dedup gate (q81): duplicates that differ only in
    * case/punctuation/whitespace collapse to one survivor (lowest id,
    * original text kept) — the C4-style normalize-then-hash recipe step,
    * replayed verbatim by the oracle's lower+regexp pipeline. */
  def normalizedDedup(spark: SparkSession, sfDir: String): DataFrame =
    graft.dedup.Dedup.exactNormalized(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** Matryoshka gate (q80): every embedding truncated to its first 8
    * components and L2-renormalized — slice, fold, rounded division, all
    * replayed exactly by the oracle's list arithmetic. The vector is
    * serialized to a fixed-precision CSV string for the gate (the driver's
    * pandas harness cannot sort raw array columns); components are already
    * rounded to 6 dp, so DECIMAL(10,6) formatting is lossless and renders
    * identically in Spark and DuckDB. The engine operator
    * ([[Similarity.truncateNormalize]]) still returns real arrays. */
  def matryoshka(spark: SparkSession, sfDir: String): DataFrame =
    Similarity.truncateNormalize(Tables.embeddings(spark, sfDir), dim = 8)
      .withColumn("truncated", concat_ws(",",
        transform(col("truncated"),
          x => x.cast("decimal(10,6)").cast("string"))))
      .orderBy("vec_id")

  /** Hard-negative mining gate (q78): queries 60..70 (disjoint from every
    * other ANN gate's range), top-5 by exact cosine among OTHER-label
    * vectors — same-label rows are presumed positives and excluded. */
  def hardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.hardNegatives(emb,
      emb.filter(col("vec_id") >= 60 && col("vec_id") < 70), k = 5)
  }

  /** μ-law fingerprint gate (q93): COMPRESSED audio decoded for real —
    * G.711 μ-law WAVs (format tag 7, the telephony codec) decode through
    * the JDK's own ULAW converter, whose table is exactly the closed-form
    * G.711 expansion; the oracle replays that formula arithmetically per
    * (doc_id, window), so a pass proves container parse + μ-law expansion
    * + energy thresholding bit-for-bit. 8 windows × 100 samples, each
    * window one constant μ-law byte. */
  def ulawFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 1).select("doc_id").as[Long]
      .map { id =>
        val ulaw = new Array[Byte](8 * 100)
        var w = 0
        while (w < 8) {
          val b = ((id * 31 + w * 47) % 256).toByte
          var i = 0
          while (i < 100) { ulaw(w * 100 + i) = b; i += 1 }
          w += 1
        }
        val bytes = Multimodal.Codecs.encodeWavUlaw(ulaw, 8000f)
        Multimodal.MediaRecord(id, "audio", bytes,
          Multimodal.MediaMeta("audio/wav", 0, 0, 100L))
      }.toDF()
    Multimodal.audioHashes(media, windows = 8).toDF()
      .select(col("media_id"), col("ahash"))
      .orderBy("media_id")
  }

  /** Video fingerprint gate (q92): every synthetic MJPEG AVI decoded
    * through the REAL RIFF-container walk + JDK JPEG codec, one aHash per
    * sampled frame. The oracle re-derives all 4 frame hashes arithmetically
    * from doc_id (quadrant grays → threshold bits → hex), so a pass proves
    * container parse + frame decode + hash bit-for-bit — the video
    * analogue of q85/q87. */
  def videoFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val media = Multimodal.synthesize( // doc_id pre-filter: see imageDedup
      Tables.documents(spark, sfDir).filter(col("doc_id") % 3 === 2))
    Multimodal.videoFrameHashes(media).toDF()
      .withColumn("ahash_hex", format_string("%016x", col("ahash")))
      .select(col("media_id"), col("frame_idx"), col("ahash_hex"))
      .orderBy("media_id", "frame_idx")
  }

  /** Pruned hard-negative mining gate (q91): the same contract as q78 but
    * through the sign-bit cell tier (bits=4, hamming-1 multi-probe) — the
    * 100 TB plan shape, whose cell join the oracle replays verbatim.
    * Queries 80..90 (disjoint from every other ANN gate's range). */
  def hardNegativesPruned(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.hardNegatives(emb,
      emb.filter(col("vec_id") >= 80 && col("vec_id") < 90), k = 5, bits = 4)
  }

  /** Trained-codebook hard-negative gate (q98): the pruned tier routed
    * through the deterministic SAMPLED IVF codebook (nlist=16, nprobe=4) —
    * data-ADAPTIVE cells instead of sign bits, so recall tracks the data
    * distribution; the oracle replays the full pipeline (L2 assignment
    * with lowest-index tie-break, nprobe probing, label-disjoint in-cell
    * top-k). Queries 90..100 (disjoint from every other ANN gate). */
  def hardNegativesTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    Similarity.hardNegatives(emb,
      emb.filter(col("vec_id") >= 90 && col("vec_id") < 100), k = 5,
      centroids = centroids, nprobe = 4)
  }

  /** Trained-codebook margin-mining gate (q99): the ratio-margin criterion
    * on candidates from the sampled-IVF tier — the LASER/CCMatrix shape
    * with a data-adaptive coarse quantizer; margins still computed on the
    * probed-cell kNN lists only. Queries 100..110. */
  def marginMiningTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    Similarity.marginMining(emb,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 110),
      k = 4, minMargin = 0.0, centroids = centroids, nprobe = 4)
      .orderBy("query_id")
  }

  /** DSIR importance-selection gate (q100): hashed-unigram importance
    * weights against a target slice (sources src0/src1 play the
    * high-quality reference), top-100 kept. The oracle recomputes the
    * bucket distributions, the micro-unit log ratios, and the exact
    * integer score sums from the same tables. */
  def dsirSelection(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    graft.sampling.Sampling.dsirSelect(docs,
      docs.filter(col("source").isin("src0", "src1")), budget = 100)
  }

  /** DSIR Gumbel-top-k resampling gate (q101): the paper's actual sampler
    * — budget docs drawn ∝ exp(score/T) without replacement via seeded
    * Gumbel noise (a pure md5 function of the key), T = 0.5. The oracle
    * replays scores, the 32-bit uniform, the Gumbel transform, and the
    * ranking exactly. */
  def dsirResampling(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    graft.sampling.Sampling.dsirResample(docs,
      docs.filter(col("source").isin("src0", "src1")),
      budget = 100, temperature = 0.5)
  }

  /** Incremental-dedup gate: a re-crawl batch (even doc ids) probes the
    * fingerprint index of the already-ingested corpus (doc_id % 10 < 6);
    * survivors are exactly the batch docs whose text the corpus lacks,
    * after within-batch lowest-id dedup — a plain NOT EXISTS oracle. */
  def incrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 < 6)
    val batch = docs.filter(col("doc_id") % 2 === 0)
    Dedup.incrementalExact(batch, Dedup.fingerprints(corpus))
      .orderBy("doc_id")
  }

  /** Incremental NEAR-dedup gate: a disjoint batch (doc_id % 5 = 0)
    * dedups against the rest of the corpus via its shingle index only —
    * LSH candidates, exact-verified, so the oracle is the all-pairs SQL. */
  def incrementalNearDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // the scale-right call shape: both halves of the persisted index (sets
    // + band rows) are inputs; nothing re-hashes the corpus per batch
    val index = Dedup.shingleIndex(corpus)
    Dedup.incrementalNearDup(batch, index, minJaccard = 0.8,
        corpusBands = Some(Dedup.bandIndex(index)))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  /** Product-quantization ADC gate: sampled sub-codebooks (m=8 subspaces
    * of 8 dims, 16 centroids each — bit-reproducible), corpus encoded to
    * 8 codes/vector, ADC top-5 for queries 40..50. The oracle replays
    * sub-assignment and the left-to-right ADC sum exactly, so the driver
    * gates the quantizer + search, not a lucky recall outcome. */
  def pqAdcTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val cb = Pq.sampleCodebook(emb, m = 8, k = 16)
    Pq.adcTopK(emb, emb.filter(col("vec_id") >= 40 && col("vec_id") < 50), k = 5, cb)
  }

  /** Gopher-style repetition signals; thresholds are part of the gate
    * (the flag column re-derives them in the oracle). */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.repetitionSignals(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** Corpus bigram LM statistics (head_count, diversity, deterministic
    * top continuation). */
  def bigramStats(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.bigramStats(Tables.documents(spark, sfDir))
      .orderBy("head")

  /** C4-style duplicated-span removal: 10-word segments, first occurrence
    * corpus-wide kept, every repeat cut from its document. */
  def dedupSegments(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.dedupSegments(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** Document chunking gate (q73): 150-char chunks, 30-char overlap
    * (stride 120) — integer-exact start/width arithmetic, replayed verbatim
    * by the oracle's generate_series + substr. */
  def chunkDocuments(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.chunkDocs(Tables.documents(spark, sfDir),
      chunkChars = 150, overlapChars = 30)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"), col("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  /** Binary-quantization ANN gate: sign-bit codes (32× smaller than
    * float32), Hamming scan keeps 20 candidates per query, exact-cosine
    * rerank keeps 5. The quantizer and the candidate cut are pure functions
    * of the data (sign bits; ties on neighbor id), so the oracle replays
    * the APPROXIMATION itself. Query range 50-60 keeps all five ANN paths
    * (q25/q26/q39/q48/q58) independently gated. */
  def annBinaryRerank(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Quantize.hammingRerankTopK(emb,
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 60), k = 5, candidates = 20)
  }

  /** Per-doc perplexity under the corpus's own add-one bigram LM
    * (CCNet-style quality scoring); `nll_scaled` is integer-exact. */
  def perplexity(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.perplexity(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** BM25 lexical-retrieval gate (q103): every 50th doc queries the rest
    * of the corpus, Okapi BM25 with k1=1.2/b=0.75, top-5 per query — the
    * oracle replays the inverted index, the micro-unit partial scores,
    * and the exact integer sums. */
  def bm25Retrieval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    TextAnalysis.bm25TopK(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), k = 5)
  }

  /** Persisted-BM25-index gate (q107): the corpus splits into a base
    * build (doc_id % 7 ≠ 3 of the non-queries) and an appended batch
    * (doc_id % 7 = 3) — the batch tokenizes WITHOUT re-touching the base
    * — then the every-50th queries probe the bucket-partitioned index at
    * NON-default parameters (k1=1.5, b=0.4), so the micro-unit discipline
    * is gated under parameter variation too. The oracle replays Okapi
    * over the logical union corpus; index search is score-identical to
    * the direct scan by construction (pinned in Bm25IndexSpec). */
  def bm25IndexedRetrieval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 7 =!= 3)
    val batch = docs.filter(col("doc_id") % 50 =!= 0 && col("doc_id") % 7 === 3)
    val dir = cachedIndexDir(spark, sfDir, "bm25", { d =>
      val idx = TextAnalysis.buildBm25Index(spark, d, base, buckets = 16)
      // fixed batchId: on a reused cached index the re-append is a NO-OP
      // (idempotency ledger) instead of silently duplicating postings
      TextAnalysis.appendBm25Batch(idx, batch, batchId = Some("gate-q107"))
    })
    val idx = graft.table.LakeTable.forPath(spark, dir)
    // the append replays against the cached index too — proving the
    // ledger no-op in the exact production shape (a second run must not
    // double df or stats)
    TextAnalysis.appendBm25Batch(idx, batch, batchId = Some("gate-q107"))
    TextAnalysis.bm25SearchIndex(idx,
      docs.filter(col("doc_id") % 50 === 0), k = 5, k1 = 1.5, b = 0.4)
  }

  /** Df-capped persisted-BM25 gate (q108): the same indexed-search recipe
    * with stopword pruning at build — terms whose df over the indexed
    * corpus exceeds cap = 3·N/4 (integer arithmetic, engine-portable)
    * are dropped from the index and from scoring; doc lengths still count
    * capped tokens. The oracle recomputes the capped set and excludes the
    * same terms, so a pass proves the cap semantics, not just plumbing. */
  def bm25DfCappedRetrieval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(col("doc_id") % 50 =!= 0)
    // the cap (3·N/4) is deterministic from the same corpus the cache key
    // already fingerprints, so it computes INSIDE the build closure — a
    // cache hit pays pure search, not a corpus count() per invocation
    val dir = cachedIndexDir(spark, sfDir, "bm25cap", { d =>
      val cap = 3L * base.count() / 4L
      TextAnalysis.buildBm25Index(spark, d, base, buckets = 16, dfCap = cap): Unit
    })
    TextAnalysis.bm25SearchIndex(graft.table.LakeTable.forPath(spark, dir),
      docs.filter(col("doc_id") % 50 === 0), k = 5)
  }

  /** JVM-local build locks for [[cachedIndexDir]], keyed by cache root:
    * two threads of one process never build (or delete) the same root
    * concurrently. */
  private val indexBuildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Content-keyed persisted-index cache under the process tmpdir (the
    * q68 pattern): the key hashes sfDir + the source file's size/mtime,
    * so the same data reuses one index across gate invocations instead of
    * accumulating a fresh temp directory per call (and a data change
    * rebuilds). Race discipline: build into private staging, publish with
    * one atomic rename; in-process builders serialize on a per-root lock;
    * across processes, `usable` is RE-CHECKED after the build so a rival's
    * just-published index is adopted (our staging discarded) instead of
    * deleted out from under its reader — the root is only ever deleted
    * when it exists in a non-usable (crashed half-build) state. A TOCTOU
    * window remains across PROCESSES sharing a tmpdir, but the driver
    * gates run with run-private tmpdirs by contract. Driver-local tmp is
    * fine — the gates run local-mode; a cluster deployment passes explicit
    * table paths. */
  private def cachedIndexDir(
      spark: SparkSession, sfDir: String, kind: String,
      build: String => Unit, srcTable: String = "documents"): String = {
    val src = java.nio.file.Paths.get(sfDir, s"$srcTable.parquet")
    val sig = scala.util.Try(
      java.nio.file.Files.size(src) + ":" +
        java.nio.file.Files.getLastModifiedTime(src).toMillis).getOrElse("na")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((sfDir + "#" + kind + "#" + sig).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val root = tmpRoot.resolve(s"graft-$kind-$key")
    val dir = root.resolve("t").toString
    // half-built (create landed, append didn't) must rebuild: the build
    // closure's LAST commit defines usability via the table version
    def usable = graft.table.LakeTable.isTable(dir) &&
      graft.table.LakeTable.forPath(spark, dir).version >= 1
    if (!usable) {
      val lock = indexBuildLocks.computeIfAbsent(root.toString, _ => new Object)
      lock.synchronized {
        if (!usable) {
          val staging = java.nio.file.Files.createTempDirectory(
            tmpRoot, s"graft-$kind-build-")
          build(staging.resolve("t").toString)
          if (usable) {
            // a rival process published while we built: adopt theirs —
            // deleting root here would tear an index it may be reading
            graft.log.TxLog.deleteRecursively(staging)
          } else {
            graft.log.TxLog.deleteRecursively(root) // crashed half-build
            try java.nio.file.Files.move(staging, root,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch {
              case _: java.nio.file.FileAlreadyExistsException |
                   _: java.nio.file.DirectoryNotEmptyException |
                   _: java.nio.file.AccessDeniedException =>
                graft.log.TxLog.deleteRecursively(staging)
            }
          }
        }
      }
    }
    dir
  }

  /** Exact stratified split gate (q106): per-source splits with exactly
    * floor(0.8·n) train rows per stratum — the small-stratum guarantee
    * the expectation-only hash split cannot give. The oracle replays the
    * md5 rank and the floor cut verbatim. */
  def stratifiedSplitGate(spark: SparkSession, sfDir: String): DataFrame =
    graft.sampling.Sampling.stratifiedSplit(
      Tables.documents(spark, sfDir).select("doc_id", "source"),
      keyCol = "doc_id", groupCol = "source", trainFraction = 0.8)

  /** Cluster-balanced sampling gate (q105): topic balance for a training
    * mixture — embeddings assign to their nearest trained-codebook
    * cluster (the deterministic sampled codebook), and the temperature
    * mixture (α = 0.5) draws per-CLUSTER quotas ∝ n^α, flattening
    * over-represented topics exactly the way per-source α-mixing
    * flattens over-represented sources. Pure composition of two gated
    * primitives (q39's assignment + q77's quota sampler); the oracle
    * replays both. */
  def clusterBalancedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    val assigned = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.cellOf(
        transform(col("embedding"), x => x.cast("double")), centroids)
        .cast("string").as("cluster"))
    graft.sampling.Sampling.alphaMixture(assigned, budget = 200, alpha = 0.5,
      keyCol = "vec_id", groupCol = "cluster")
  }

  /** Hybrid-retrieval gate (q104): BM25 over the documents table and
    * IVF-pruned cosine ANN over the aligned embeddings table (the q39
    * trained-codebook tier — deterministic sampled codebook, nprobe=4, so
    * the oracle replays the approximation itself), each top-10 for the
    * every-50th queries, fused with reciprocal-rank fusion (rrfK=60) to a
    * top-5 — the standard lexical+dense hybrid search recipe, with BOTH
    * legs index-pruned: the BM25 leg broadcasts query terms into the
    * postings, the dense leg compares only probed-cell candidates. The
    * oracle replays both rankings and the nano-unit fusion sums. */
  def hybridRetrieval(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val bm25 = TextAnalysis.bm25TopK(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), k = 10)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    val dense = Similarity.ivfTopKTrained(
      emb.filter(col("vec_id") % 50 =!= 0),
      emb.filter(col("vec_id") % 50 === 0), k = 10,
      centroids, nprobe = 4)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    Similarity.rrfFuse(
      Seq(bm25.select("query_id", "doc_id", "rank"), dense), k = 5)
  }

  /** CCNet head/middle/tail tiering gate (q102): per-language perplexity
    * thirds over the exact integer NLL ratio — the oracle replays the LM,
    * the IEEE-division rank key, and the NTILE cut verbatim. */
  def perplexityTiering(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.perplexityTiers(Tables.documents(spark, sfDir))
      .orderBy("doc_id")

  /** Sign-bit IVF with hamming-1 multi-probe. The quantizer is a pure
    * function of the vector, so the oracle replicates the APPROXIMATION
    * itself (cell assignment, probing, in-cell top-k) — the driver gates
    * the algorithm, not a lucky recall outcome. Distinct query set from
    * q25 so the ANN paths are independently gated. */
  def annIvfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") >= 10 && col("vec_id") < 20),
      k = 5, bits = 4, probeHamming = 1)
  }

  /** Codebook IVF through the codegen'd NearestCentroids expression, with a
    * deterministic data-sampled codebook so the oracle replicates the full
    * pipeline (L2 assignment, nprobe probing, in-cell top-k) bit-exactly.
    * KMeans-trained codebooks ([[Similarity.trainCentroids]]) remain the
    * library's training path — same execution pipeline, unit-tested — but
    * their centroids are not reproducible outside Spark ML, so the driver
    * gate runs the sampled codebook. */
  def annIvfTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    Similarity.ivfTopKTrained(emb,
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 30), k = 5,
      centroids, nprobe = 4)
  }

  /** ANN through the PERSISTENT IVF index: build a cell-partitioned graft
    * table (codebook in table properties), then search it — probed cells
    * only, partition-pruned. Same sampled codebook and pipeline as q39, so
    * the same algorithmic oracle applies; distinct query range keeps the
    * two paths independently gated. */
  def annIvfIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // content-keyed cache (the q68/q107 pattern): repeated gate invocations
    // reuse one index instead of accumulating a temp directory per call.
    // Centroid sampling stays INSIDE the build closure — search reads the
    // stored codebook from table properties, so a cache hit must not pay
    // the embeddings scan
    val dir = cachedIndexDir(spark, sfDir, "ivfgate", { d =>
      Similarity.buildIvfIndex(spark, d, emb,
        Similarity.sampleCentroids(emb, nlist = 16)): Unit
    }, srcTable = "embeddings")
    Similarity.searchIvfIndex(graft.table.LakeTable.forPath(spark, dir),
      emb.filter(col("vec_id") >= 30 && col("vec_id") < 40), k = 5, nprobe = 4)
  }

  def textAnalysis(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.analyze(Tables.documents(spark, sfDir))
      .select("doc_id", "token_count", "char_count", "predicted_lang",
        "punct_ratio", "stopword_ratio", "quality_score", "fingerprint")

  /** Full multimodal pipeline (synthesize -> decode/embed -> thumbnail ->
    * frame-sample), now through REAL JDK codecs for the decodable kinds:
    * image rows are actual PNGs decoded by javax.imageio (features = the
    * 2×2 grid of per-quadrant channel means — exact, because the synthetic
    * quadrants are uniform and the /256 normalizer is a power of two),
    * audio rows are actual WAVs decoded by javax.sound.sampled (features =
    * 12 window RMS values — exact, the windows are constant-amplitude).
    * The oracle re-derives every decoded value arithmetically from doc_id,
    * so a pass PROVES the encode→decode round-trip, not just plumbing.
    * Video stays the documented undecodable-payload path: its hash-stub
    * features are gated on the provable norm bound only, its thumbnail on
    * the byte-prefix length, its frames on the slice count. Image
    * thumbnails are re-decoded (header parse) to gate the real resize. */
  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    // four downstream branches (meta, features, thumbs, frames) — persist
    // so each payload is encoded once, not once per branch
    val media = Multimodal.synthesize(Tables.documents(spark, sfDir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val feats = Multimodal.extractFeatures(media, dim = 12).toDF()
      .select(col("media_id"), size(col("feature")).as("feature_dim"),
        (col("featureNorm") >= 0.0 && col("featureNorm") < 4.0).as("norm_in_range"),
        col("feature"))
    val thumbs = Multimodal.thumbnailInfo(media, maxBytes = 64).toDF()
      .select(col("media_id"),
        when(col("kind") === "image", lit(null).cast("int"))
          .otherwise(col("thumb_len")).as("thumb_len"),
        col("thumb_w"), col("thumb_h"))
    val frames = Multimodal.sampleVideoFrames(media, framesPerVideo = 4).toDF()
      .groupBy("media_id").agg(count(lit(1)).as("frame_count"))
    media.select(col("media_id"), col("kind"),
        col("meta.mime").as("mime"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.durationMs").as("duration_ms"))
      .join(feats, Seq("media_id"))
      .join(thumbs, Seq("media_id"))
      .join(frames, Seq("media_id"), "left")
      .withColumn("frame_count", coalesce(col("frame_count"), lit(0L)))
      // The decoded feature vector, serialized to a fixed-precision CSV
      // string for the gate (the driver harness cannot sort raw arrays).
      // Every decodable value is an exact binary fraction (k/256 channel
      // means, m/32768 RMS), so DECIMAL(18,15) renders it exactly and
      // identically in Spark and DuckDB — the gate still proves the
      // encode→decode round-trip value-for-value. Video stays NULL (its
      // hash stand-in features are gated on the norm bound only).
      .withColumn("feat",
        when(col("kind") === "video", lit(null).cast("string"))
          .otherwise(concat_ws(",", transform(col("feature"),
            x => x.cast("double").cast("decimal(18,15)").cast("string")))))
      .drop("feature")
  }

  /** Deterministic train/test split: md5-bucket assignment, reproducible in
    * any engine — the split a model line can keep for its lifetime. */
  def trainTestSplit(spark: SparkSession, sfDir: String): DataFrame =
    graft.sampling.Sampling.trainTestSplit(
      Tables.documents(spark, sfDir).select("doc_id", "source"), keyCol = "doc_id")

  /** Benchmark decontamination: corpus docs containing >= half of a probe
    * ("benchmark") document's 3-gram shingles, via an inverted-index join —
    * no all-pairs stage. Probe set = every 50th doc. */
  def decontamination(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    Dedup.containmentPairs(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0),
      shingleN = 3, minContainment = 0.5)
  }

  /** Domain-mixture downsampling: per-source keep rates (0.9 / 0.5 / 0.2
    * by source index mod 3), key-hash deterministic — the "rebalance the
    * corpus toward high-quality domains" pass of a training-data build. */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rates = (0 until 20).map(i => s"src$i" -> (i % 3 match {
      case 0 => 0.9
      case 1 => 0.5
      case _ => 0.2
    })).toMap
    graft.sampling.Sampling.mixtureSample(
      Tables.documents(spark, sfDir).select("doc_id", "source"),
      keyCol = "doc_id", groupCol = "source", rates = rates)
  }

  /** Token-budget mixture: each domain greedily filled to its token
    * budget in stable-hash order (the Dolma/Pile recipe step — budgets
    * in tokens, not row rates). */
  def budgetedMixture(spark: SparkSession, sfDir: String): DataFrame = {
    val budgets = (0 until 20).map(i => s"src$i" -> (i % 3 match {
      case 0 => 4000L
      case 1 => 2500L
      case _ => 1200L
    })).toMap
    graft.sampling.Sampling.budgetedMixture(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text")),
      tokenCol = size(TextAnalysis.tokens(col("text"))), budgets = budgets)
      .select("doc_id", "source", "token_count", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Training-sequence packing: concatenate each source's docs in doc_id
    * order and cut every 512 tokens — pack assignment is a running-sum
    * window, no global sort. */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("token_count"))
    graft.sampling.Sampling.packSequences(docs,
      orderCol = "doc_id", sizeCol = "token_count", shardCol = "source",
      budget = 512L)
  }

  /** Gap-based sessionization of the events stream (30-minute rule),
    * one shuffle on user_id; see [[graft.transform.Sessionize]]. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame =
    graft.transform.Sessionize.summarize(Tables.events(spark, sfDir))

  /** PII redaction over text with deterministically planted PII (the
    * corpus itself is synthetic and PII-free), plus per-pattern audit
    * counts — the whole pass is codegen'd regexp work, no shuffle. */
  def piiRedaction(spark: SparkSession, sfDir: String): DataFrame = {
    val planted = Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com ip 10.0."),
        col("doc_id") % 256, lit(".1 ssn "),
        format_string("%03d", col("doc_id") % 1000), lit("-42-1234")).as("text"))
    val counts = TextAnalysis.piiCounts(col("text"))
    counts.foldLeft(planted)((d, c) => d.withColumn(c._1, c._2))
      .withColumn("redacted", TextAnalysis.redactPii(col("text")))
      .drop("text")
  }

  // ------------------------------------------------------------ oracles
  // Hash-seeded values (minhash signatures, simhash bits, IVF cells) are
  // not SQL-expressible, so those queries are gated on hash-INDEPENDENT
  // contracts instead: LSH pairs == exact all-pairs Jaccard (recall), IVF
  // top-k == exact brute force (recall@k = 1.0), simhash near/far hamming
  // separation with exact pair counts, multimodal pipeline facts derived
  // from the payload bytes.

  /** DuckDB token expression mirroring TextAnalysis.tokens. */
  private[analytics] val toks =
    """CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       ELSE string_split_regex(trim(text), '\s+') END"""

  private def hitsSql(words: Seq[String]): String =
    s"len(list_intersect(list_distinct($toks), [${words.map(w => s"'$w'").mkString(",")}]))"

  /** Brute-force exact top-k cosine SQL (the recall oracle for every ANN
    * variant; `queryPred` selects the query rows). */
  private def annOracle(queryPred: String, k: Int): String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         FROM embeddings),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE $queryPred),
       s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
           ROUND(list_dot_product(q.qv, e.v) /
             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
         FROM e, q WHERE e.vec_id <> q.query_id),
       r AS (SELECT *, CAST(ROW_NUMBER() OVER
           (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
         FROM s)
       SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= $k"""

  /** 3-gram shingles with the short-doc fallback, mirroring Dedup.shingles. */
  private val shinglesSql =
    s"""list_distinct(CASE WHEN len($toks) >= 3
        THEN list_transform(range(1, len($toks) - 1),
          i -> array_to_string(($toks)[i:i+2], ' '))
        ELSE [array_to_string($toks, ' ')] END)"""

  /** DuckDB bigram-list expression over a CTE column `tk` (mirrors
    * TextAnalysis.bigrams; DuckDB lambdas are 1-based like Spark's
    * element_at, and range(1, len) is exclusive like sequence(1, len-1)
    * is inclusive). */
  private def bigramsSql(elem: String, emptyType: String): String =
    s"""CASE WHEN len(tk) >= 2
        THEN list_transform(range(1, len(tk)), i -> $elem)
        ELSE CAST([] AS $emptyType) END"""

  private val semanticDedupOracle: String =
    """WITH RECURSIVE e0 AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         n AS (SELECT *, sqrt(list_dot_product(v, v)) AS norm FROM e0),
         p AS (SELECT x.vec_id AS a, y.vec_id AS b
               FROM n x JOIN n y ON x.label = y.label AND x.vec_id < y.vec_id
               WHERE list_dot_product(x.v, y.v) / (x.norm * y.norm) >= 0.35),
         e AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
         r(id, c) AS (
           SELECT vec_id, vec_id FROM embeddings
           UNION
           SELECT e.a, r.c FROM e JOIN r ON r.id = e.b),
         g AS (SELECT id AS vec_id, MIN(c) AS group_id FROM r GROUP BY id)
         SELECT vec_id, group_id, vec_id = group_id AS is_canonical
         FROM g ORDER BY vec_id"""

  val oracles: Map[String, String] = Map(
    "q73_chunk_documents" ->
      """WITH n AS (SELECT doc_id, text,
             GREATEST(1, CAST(CEIL((length(text) - 30) / 120.0) AS INT)) AS nc
           FROM documents),
         c AS (SELECT doc_id, text,
             unnest(generate_series(0, nc - 1)) AS chunk_id FROM n)
         SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(chunk_id * 120 AS BIGINT) AS chunk_start,
           substr(text, chunk_id * 120 + 1, 150) AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",
    "q63_dedup_segments" ->
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         s AS (SELECT doc_id, CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
             ELSE list_transform(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT)),
               j -> array_to_string(tk[j*10+1 : j*10+10], ' ')) END AS segs FROM t),
         x AS (SELECT doc_id, CAST(u.seg_idx AS INT) AS seg_idx, u.seg FROM (
           SELECT doc_id, unnest(list_transform(range(0, len(segs)),
             j -> {'seg_idx': j, 'seg': segs[j+1]})) AS u FROM s)),
         w AS (SELECT *, count(*) OVER (PARTITION BY md5(seg)) AS c,
             ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn FROM x),
         k AS (SELECT doc_id, seg_idx, seg, (c = 1 OR rn = 1) AS keep FROM w),
         r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed FROM k GROUP BY 1),
         ct AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
           FROM k WHERE keep GROUP BY 1)
         SELECT d.doc_id, COALESCE(ct.clean_text, '') AS clean_text,
           COALESCE(r.n_segments, 0) AS n_segments, COALESCE(r.n_removed, 0) AS n_removed
         FROM documents d LEFT JOIN r USING (doc_id) LEFT JOIN ct USING (doc_id)""",
    // per-stratum md5 rank + IEEE floor cut
    "q106_stratified_split" ->
      """WITH r AS (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS rr,
             COUNT(*) OVER (PARTITION BY source) AS n
           FROM documents)
         SELECT doc_id, source,
           CASE WHEN rr <= FLOOR(n * 0.8) THEN 'train' ELSE 'test' END AS split
         FROM r""",
    // q39's codebook assignment + q77's alpha-quota sampler, composed
    "q105_cluster_balanced" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         ranked AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM ranked WHERE rn = 1),
         counts AS (SELECT CAST(cell AS VARCHAR) AS cluster,
             CAST(COUNT(*) AS DOUBLE) AS n FROM assign GROUP BY 1),
         q AS (SELECT cluster,
             CAST(FLOOR(200 * POWER(n, 0.5) / SUM(POWER(n, 0.5)) OVER () + 1e-6) AS BIGINT) AS quota
           FROM counts),
         r AS (SELECT vec_id, CAST(cell AS VARCHAR) AS cluster,
             CAST(ROW_NUMBER() OVER (PARTITION BY cell
               ORDER BY md5(CAST(vec_id AS VARCHAR) || ':graft-alpha'), vec_id) AS BIGINT) AS sample_rank
           FROM assign)
         SELECT r.vec_id, r.cluster, r.sample_rank
         FROM r JOIN q USING (cluster) WHERE sample_rank <= quota""",
    // q103's BM25 ranking + q39's IVF-pruned cosine ranking (sampled
    // 16-centroid codebook, nprobe=4 — the oracle replays the
    // approximation itself), fused with RRF in integer NANO-units —
    // fold-order-free for any number of systems
    "q104_hybrid_rrf" ->
      s"""WITH c AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id % 50 <> 0),
         qdocs AS (SELECT doc_id AS query_id, list_distinct($toks) AS qt
           FROM documents WHERE doc_id % 50 = 0),
         dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM c) GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM c),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(len(tk)) AS BIGINT) AS total FROM c),
         dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         qe AS (SELECT query_id, unnest(qt) AS term FROM qdocs),
         bms AS (SELECT qe.query_id, dt.doc_id,
             CAST(FLOOR(
               ln((st.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1) *
               ((dt.tf * (1.2 + 1)) /
                (dt.tf + 1.2 * (0.25 + 0.75 * dl.len / (CAST(st.total AS DOUBLE) / st.n))))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM qe JOIN dt USING (term) JOIN dfr USING (term)
           JOIN dl ON dl.doc_id = dt.doc_id CROSS JOIN st),
         bsc AS (SELECT query_id, doc_id,
             ROUND(SUM(micro) / 1000000.0, 6) AS score FROM bms GROUP BY 1, 2),
         bm AS (SELECT query_id, doc_id, rank FROM (
           SELECT *, CAST(ROW_NUMBER() OVER
               (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
           FROM bsc) WHERE rank <= 10),
         e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         rkd AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM rkd
           WHERE rn = 1 AND vec_id % 50 <> 0),
         qprobe AS (SELECT vec_id AS query_id, cidx AS cell FROM rkd
           WHERE rn <= 4 AND vec_id % 50 = 0),
         cs AS (SELECT q.query_id, a.vec_id AS doc_id,
             ROUND(list_dot_product(qe.v, ne.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 6) AS cosine
           FROM qprobe q
           JOIN assign a ON a.cell = q.cell
           JOIN e qe ON qe.vec_id = q.query_id
           JOIN e ne ON ne.vec_id = a.vec_id
           WHERE a.vec_id <> q.query_id),
         an AS (SELECT query_id, doc_id, rank FROM (
           SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER
               (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS INT) AS rank
           FROM cs) WHERE rank <= 10),
         u AS (SELECT * FROM bm UNION ALL SELECT * FROM an),
         f AS (SELECT query_id, doc_id,
             ROUND(SUM(CAST(FLOOR(1000000000.0 / (rank + 60) + 0.5) AS BIGINT))
               / 1000000000.0, 9) AS rrf_score
           FROM u GROUP BY 1, 2),
         fout AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
           FROM f)
         SELECT query_id, doc_id, rrf_score, rank FROM fout WHERE rank <= 5""",
    // inverted index + Okapi BM25 with micro-unit partial scores (the
    // FLOOR(x*1e6 + 0.5) = JVM Math.round discipline), exact integer sums;
    // (1.2 + 1) is written as the SUM so both engines fold it in IEEE
    // doubles identically
    "q103_bm25_topk" ->
      s"""WITH c AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id % 50 <> 0),
         qdocs AS (SELECT doc_id AS query_id, list_distinct($toks) AS qt
           FROM documents WHERE doc_id % 50 = 0),
         dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM c) GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM c),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(len(tk)) AS BIGINT) AS total FROM c),
         dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         qe AS (SELECT query_id, unnest(qt) AS term FROM qdocs),
         ms AS (SELECT qe.query_id, dt.doc_id,
             CAST(FLOOR(
               ln((st.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1) *
               ((dt.tf * (1.2 + 1)) /
                (dt.tf + 1.2 * (0.25 + 0.75 * dl.len / (CAST(st.total AS DOUBLE) / st.n))))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM qe JOIN dt USING (term) JOIN dfr USING (term)
           JOIN dl ON dl.doc_id = dt.doc_id CROSS JOIN st),
         sc AS (SELECT query_id, doc_id,
             ROUND(SUM(micro) / 1000000.0, 6) AS score FROM ms GROUP BY 1, 2),
         rk AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
           FROM sc)
         SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= 5""",
    // the q103 machinery probed through the PERSISTED index (base build +
    // appended batch = the same logical corpus) at NON-default k1=1.5 /
    // b=0.4 — the oracle replays Okapi over the union corpus; (1.5 + 1)
    // and (1 - 0.4 + ...) are written as the arithmetic Spark folds so
    // both engines produce bit-identical IEEE constants
    "q107_bm25_indexed" ->
      s"""WITH c AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id % 50 <> 0),
         qdocs AS (SELECT doc_id AS query_id, list_distinct($toks) AS qt
           FROM documents WHERE doc_id % 50 = 0),
         dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM c) GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM c),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(len(tk)) AS BIGINT) AS total FROM c),
         dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         qe AS (SELECT query_id, unnest(qt) AS term FROM qdocs),
         ms AS (SELECT qe.query_id, dt.doc_id,
             CAST(FLOOR(
               ln((st.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1) *
               ((dt.tf * (1.5 + 1)) /
                (dt.tf + 1.5 * (1 - 0.4 + 0.4 * dl.len / (CAST(st.total AS DOUBLE) / st.n))))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM qe JOIN dt USING (term) JOIN dfr USING (term)
           JOIN dl ON dl.doc_id = dt.doc_id CROSS JOIN st),
         sc AS (SELECT query_id, doc_id,
             ROUND(SUM(micro) / 1000000.0, 6) AS score FROM ms GROUP BY 1, 2),
         rk AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
           FROM sc)
         SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= 5""",
    // df-capped (stopword-pruned) indexed BM25: terms whose df over the
    // indexed corpus exceeds cap = 3·N/4 (integer floor division — both
    // engines compute the identical BIGINT) are absent from the index and
    // from scoring; doc lengths still count capped tokens, so avgdl is
    // cap-independent. Everything else is the q103 Okapi micro-unit recipe
    "q108_bm25_dfcapped" ->
      s"""WITH c AS (SELECT doc_id, $toks AS tk FROM documents WHERE doc_id % 50 <> 0),
         qdocs AS (SELECT doc_id AS query_id, list_distinct($toks) AS qt
           FROM documents WHERE doc_id % 50 = 0),
         dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
           SELECT doc_id, unnest(tk) AS term FROM c) GROUP BY 1, 2),
         dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM c),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(len(tk)) AS BIGINT) AS total FROM c),
         dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         qe AS (SELECT query_id, unnest(qt) AS term FROM qdocs),
         ms AS (SELECT qe.query_id, dt.doc_id,
             CAST(FLOOR(
               ln((st.n - dfr.df + 0.5) / (dfr.df + 0.5) + 1) *
               ((dt.tf * (1.2 + 1)) /
                (dt.tf + 1.2 * (0.25 + 0.75 * dl.len / (CAST(st.total AS DOUBLE) / st.n))))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM qe JOIN dt USING (term) JOIN dfr USING (term)
           JOIN dl ON dl.doc_id = dt.doc_id CROSS JOIN st
           WHERE dfr.df <= (3 * st.n) // 4),
         sc AS (SELECT query_id, doc_id,
             ROUND(SUM(micro) / 1000000.0, 6) AS score FROM ms GROUP BY 1, 2),
         rk AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
           FROM sc)
         SELECT query_id, doc_id, score, rank FROM rk WHERE rank <= 5""",
    "q102_perplexity_tiers" -> {
      val bg = bigramsSql("[tk[i], tk[i+1]]", "VARCHAR[][]")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         tb AS (SELECT doc_id, $bg AS bg FROM t),
         px AS (SELECT doc_id, p[1] AS head, p[2] AS nxt FROM (
           SELECT doc_id, unnest(bg) AS p FROM tb)),
         dp AS (SELECT doc_id, head, nxt, CAST(count(*) AS BIGINT) AS m FROM px GROUP BY 1,2,3),
         pc AS (SELECT head, nxt, CAST(sum(m) AS BIGINT) AS c FROM dp GROUP BY 1,2),
         ht AS (SELECT head, CAST(sum(c) AS BIGINT) AS total FROM pc GROUP BY 1),
         vv AS (SELECT count(DISTINCT w) AS V FROM (SELECT unnest(tk) AS w FROM t)),
         sc AS (SELECT dp.doc_id, dp.m,
             CAST(round(ln(CAST(pc.c + 1 AS DOUBLE) / CAST(ht.total + vv.V AS DOUBLE)) * 1e9, 0) AS BIGINT) AS lp
           FROM dp JOIN pc USING (head, nxt) JOIN ht USING (head) CROSS JOIN vv),
         pd AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             CAST(sum(m * lp) AS BIGINT) AS slp FROM sc GROUP BY 1),
         k AS (SELECT d.doc_id, d.lang,
             COALESCE(pd.n_bigrams, 0) AS n_bigrams,
             CASE WHEN COALESCE(pd.n_bigrams, 0) = 0 THEN 1e308
                  ELSE CAST(-pd.slp AS DOUBLE) / pd.n_bigrams END AS key,
             CASE WHEN COALESCE(pd.n_bigrams, 0) = 0 THEN NULL
                  ELSE CAST((-pd.slp) * 1000 // pd.n_bigrams AS BIGINT)
                  END AS ppl_key_milli
           FROM documents d LEFT JOIN pd USING (doc_id)),
         n AS (SELECT doc_id, lang, n_bigrams, ppl_key_milli,
             CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY key, doc_id) AS INT) AS tier_idx
           FROM k)
         SELECT doc_id, lang, n_bigrams, ppl_key_milli, tier_idx,
           CASE tier_idx WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
         FROM n"""
    },
    "q64_perplexity" -> {
      val bg = bigramsSql("[tk[i], tk[i+1]]", "VARCHAR[][]")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         tb AS (SELECT doc_id, $bg AS bg FROM t),
         px AS (SELECT doc_id, p[1] AS head, p[2] AS nxt FROM (
           SELECT doc_id, unnest(bg) AS p FROM tb)),
         dp AS (SELECT doc_id, head, nxt, CAST(count(*) AS BIGINT) AS m FROM px GROUP BY 1,2,3),
         pc AS (SELECT head, nxt, CAST(sum(m) AS BIGINT) AS c FROM dp GROUP BY 1,2),
         ht AS (SELECT head, CAST(sum(c) AS BIGINT) AS total FROM pc GROUP BY 1),
         vv AS (SELECT count(DISTINCT w) AS V FROM (SELECT unnest(tk) AS w FROM t)),
         sc AS (SELECT dp.doc_id, dp.m,
             CAST(round(ln(CAST(pc.c + 1 AS DOUBLE) / CAST(ht.total + vv.V AS DOUBLE)) * 1e9, 0) AS BIGINT) AS lp
           FROM dp JOIN pc USING (head, nxt) JOIN ht USING (head) CROSS JOIN vv),
         pd AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
             CAST(sum(m * lp) AS BIGINT) AS slp FROM sc GROUP BY 1)
         SELECT d.doc_id, COALESCE(pd.n_bigrams, 0) AS n_bigrams,
           COALESCE(-pd.slp, 0) AS nll_scaled,
           CASE WHEN pd.n_bigrams IS NULL THEN NULL
             ELSE round(exp(-CAST(pd.slp AS DOUBLE) / (pd.n_bigrams * 1e9)), 4) END AS perplexity
         FROM documents d LEFT JOIN pd USING (doc_id)"""
    },
    "q58_pq_adc" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         subd AS (SELECT vec_id, cidx, j, list_dot_product(d, d) AS sd FROM (
             SELECT e.vec_id, c.cidx, t.j,
               list_transform(range(1, 9), i -> e.v[t.j*8 + i] - c.cv[t.j*8 + i]) AS d
             FROM e, cent c, range(0, 8) t(j))),
         codes AS (SELECT vec_id, j, cidx AS code FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY sd, cidx) AS rn
             FROM subd)
           WHERE rn = 1),
         pairs AS (SELECT qs.vec_id AS query_id, n.vec_id AS neighbor_id, n.j, qs.sd
           FROM codes n
           JOIN subd qs ON qs.cidx = n.code AND qs.j = n.j
           WHERE qs.vec_id >= 40 AND qs.vec_id < 50 AND n.vec_id <> qs.vec_id),
         adc AS (SELECT query_id, neighbor_id,
             SUM(CASE WHEN j=0 THEN sd END) + SUM(CASE WHEN j=1 THEN sd END)
             + SUM(CASE WHEN j=2 THEN sd END) + SUM(CASE WHEN j=3 THEN sd END)
             + SUM(CASE WHEN j=4 THEN sd END) + SUM(CASE WHEN j=5 THEN sd END)
             + SUM(CASE WHEN j=6 THEN sd END) + SUM(CASE WHEN j=7 THEN sd END) AS dist
           FROM pairs GROUP BY 1, 2),
         r AS (SELECT query_id, neighbor_id, dist, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY dist, neighbor_id) AS INT) AS rank FROM adc)
         SELECT query_id, rank, neighbor_id, ROUND(dist, 6) AS adc_dist
         FROM r WHERE rank <= 5""",
    "q55_incremental_dedup" ->
      """WITH batch AS (SELECT * FROM documents WHERE doc_id % 2 = 0)
         SELECT doc_id, text, lang, source, n_chars FROM batch b
         WHERE NOT EXISTS (SELECT 1 FROM documents c
             WHERE c.doc_id % 10 < 6 AND c.text = b.text)
           AND b.doc_id = (SELECT min(d.doc_id) FROM batch d WHERE d.text = b.text)""",
    "q61_incremental_neardedup" ->
      s"""WITH s AS (SELECT doc_id, source, $shinglesSql AS sh FROM documents),
         c AS (SELECT * FROM s WHERE doc_id % 5 <> 0),
         b AS (SELECT * FROM s WHERE doc_id % 5 = 0)
         SELECT b.doc_id, b.source FROM b
         WHERE NOT EXISTS (SELECT 1 FROM c WHERE
             COALESCE(CAST(len(list_intersect(b.sh, c.sh)) AS DOUBLE) /
               NULLIF(len(list_distinct(b.sh || c.sh)), 0), 0.0) >= 0.8)
           AND NOT EXISTS (SELECT 1 FROM b b2 WHERE b2.doc_id < b.doc_id AND
             COALESCE(CAST(len(list_intersect(b.sh, b2.sh)) AS DOUBLE) /
               NULLIF(len(list_distinct(b.sh || b2.sh)), 0), 0.0) >= 0.8)
         ORDER BY b.doc_id""",
    "q56_repetition_signals" -> {
      val bg = bigramsSql("tk[i] || ' ' || tk[i+1]", "VARCHAR[]")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         tb AS (SELECT doc_id, $bg AS bg FROM t),
         bx AS (SELECT doc_id, unnest(bg) AS b FROM tb),
         pb AS (SELECT doc_id, b, count(*) AS c FROM bx GROUP BY 1, 2),
         bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS btot,
             CAST(max(c) AS BIGINT) AS btop, CAST(count(*) AS BIGINT) AS bnd
           FROM pb GROUP BY 1)
         SELECT t.doc_id,
           CAST(len(tk) AS INT) AS token_count,
           ROUND(CASE WHEN len(tk) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
             END, 6) AS dup_token_fraction,
           COALESCE(bs.btop, 0) AS top_bigram_count,
           CASE WHEN bs.btot IS NULL THEN 0.0
             ELSE ROUND(1.0 - CAST(bs.bnd AS DOUBLE) / CAST(bs.btot AS DOUBLE), 6)
             END AS dup_bigram_fraction,
           ROUND(CASE WHEN bs.btot IS NULL THEN 0.0
             ELSE CAST(bs.btop AS DOUBLE) / CAST(bs.btot AS DOUBLE) END, 6)
             AS top_bigram_fraction,
           ((CASE WHEN len(tk) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
             END) > 0.5
            OR (CASE WHEN bs.btot IS NULL THEN 0.0
             ELSE CAST(bs.btop AS DOUBLE) / CAST(bs.btot AS DOUBLE) END) > 0.1)
             AS is_repetitive
         FROM t LEFT JOIN bs USING (doc_id)"""
    },
    "q57_bigram_stats" -> {
      val bg = bigramsSql("[tk[i], tk[i+1]]", "VARCHAR[][]")
      s"""WITH t AS (SELECT doc_id, $toks AS tk FROM documents),
         tb AS (SELECT doc_id, $bg AS bg FROM t),
         bx AS (SELECT unnest(bg) AS p FROM tb),
         px AS (SELECT p[1] AS head, p[2] AS nxt FROM bx),
         pc AS (SELECT head, nxt, count(*) AS c FROM px GROUP BY 1, 2),
         hs AS (SELECT head, CAST(sum(c) AS BIGINT) AS head_count,
             CAST(count(*) AS BIGINT) AS distinct_next FROM pc GROUP BY 1),
         r AS (SELECT head, nxt AS top_next, c AS top_next_count,
             ROW_NUMBER() OVER (PARTITION BY head ORDER BY c DESC, nxt) AS rn FROM pc)
         SELECT hs.head, hs.head_count, hs.distinct_next, r.top_next, r.top_next_count
         FROM hs JOIN r ON hs.head = r.head WHERE r.rn = 1"""
    },
    "q66_budgeted_mixture" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS token_count
           FROM documents),
         w AS (SELECT *, CAST(SUM(token_count) OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft-mix'), doc_id) AS BIGINT)
             AS cum_tokens FROM t),
         b AS (SELECT *, CASE CAST(substring(source, 4) AS INT) % 3
             WHEN 0 THEN 4000 WHEN 1 THEN 2500 ELSE 1200 END AS budget FROM w)
         SELECT doc_id, source, token_count, cum_tokens FROM b
         WHERE cum_tokens - token_count < budget""",
    "q90_curriculum_shards" -> {
      val en = hitsSql(TextAnalysis.stopwords.head._2)
      s"""WITH q AS (SELECT doc_id,
            ROUND(LEAST(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) * 0.4
              + (CAST($en AS DOUBLE) / greatest(len(list_distinct($toks)), 1)) * 0.3
              + (1.0 - CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
                  / greatest(length(text), 1)) * 0.3, 6) AS score
          FROM documents),
         h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':graft-shard') AS hh
           FROM documents),
         v AS (SELECT doc_id,
             CAST(((instr('0123456789abcdef', substr(hh,1,1)) - 1) * 4096 +
              (instr('0123456789abcdef', substr(hh,2,1)) - 1) * 256 +
              (instr('0123456789abcdef', substr(hh,3,1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(hh,4,1)) - 1)) % 4 AS INT) AS shard
           FROM h)
         SELECT q.doc_id, v.shard, q.score,
           CAST(ROW_NUMBER() OVER (PARTITION BY v.shard
             ORDER BY q.score DESC, q.doc_id) - 1 AS BIGINT) AS curriculum_pos
         FROM q JOIN v ON q.doc_id = v.doc_id ORDER BY q.doc_id"""
    },
    "q69_shard_corpus" ->
      """WITH h AS (SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':graft-shard') AS hh FROM documents),
         v AS (SELECT doc_id, hh,
             ((instr('0123456789abcdef', substr(hh,1,1)) - 1) * 4096 +
              (instr('0123456789abcdef', substr(hh,2,1)) - 1) * 256 +
              (instr('0123456789abcdef', substr(hh,3,1)) - 1) * 16 +
              (instr('0123456789abcdef', substr(hh,4,1)) - 1)) % 8 AS shard FROM h)
         SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1 AS BIGINT) AS shard_pos
         FROM v ORDER BY doc_id""",
    "q45_mixture_sample" ->
      """SELECT doc_id, source FROM documents
         WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 4) <
           CASE CAST(substring(source, 4) AS INT) % 3
             WHEN 0 THEN 'e666' WHEN 1 THEN '8000' ELSE '3333' END""",
    "q77_alpha_mixture" ->
      """WITH counts AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
           FROM documents GROUP BY source),
         q AS (SELECT source,
             CAST(FLOOR(300 * POWER(n, 0.5) / SUM(POWER(n, 0.5)) OVER () + 1e-6) AS BIGINT) AS quota
           FROM counts),
         r AS (SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft-alpha'), doc_id) AS BIGINT) AS sample_rank
           FROM documents)
         SELECT r.doc_id, r.source, r.sample_rank
         FROM r JOIN q USING (source) WHERE sample_rank <= quota
         ORDER BY source, sample_rank""",
    "q82_corpus_stats" ->
      s"""SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len($toks)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
           COUNT(DISTINCT lang) AS distinct_langs,
           CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
         FROM documents GROUP BY source ORDER BY source""",
    "q81_normalized_dedup" ->
      """WITH n AS (SELECT *, trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS nt FROM documents)
         SELECT doc_id, text, lang, source, n_chars FROM n a
         WHERE doc_id = (SELECT min(b.doc_id) FROM n b WHERE b.nt = a.nt)
         ORDER BY doc_id""",
    "q83_vocabulary" ->
      """WITH t AS (SELECT unnest(CASE WHEN length(trim(text)) = 0
             THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END) AS term
           FROM documents),
         c AS (SELECT term, CAST(count(*) AS BIGINT) AS term_count
           FROM t GROUP BY term HAVING count(*) >= 2),
         r AS (SELECT term, term_count, CAST(ROW_NUMBER() OVER
             (ORDER BY term_count DESC, term) AS INT) AS rank FROM c)
         SELECT term, term_count, rank FROM r WHERE rank <= 30 ORDER BY rank""",
    "q85_image_dedup" ->
      """WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
         g AS (SELECT doc_id,
             ((( 7*doc_id + 13*0) % 256) + ((11*doc_id + 17*0) % 256) + ((19*doc_id + 23*0) % 256)) // 3 AS g0,
             ((( 7*doc_id + 13*1) % 256) + ((11*doc_id + 17*1) % 256) + ((19*doc_id + 23*1) % 256)) // 3 AS g1,
             ((( 7*doc_id + 13*2) % 256) + ((11*doc_id + 17*2) % 256) + ((19*doc_id + 23*2) % 256)) // 3 AS g2,
             ((( 7*doc_id + 13*3) % 256) + ((11*doc_id + 17*3) % 256) + ((19*doc_id + 23*3) % 256)) // 3 AS g3
           FROM img),
         m AS (SELECT *, (g0 + g1 + g2 + g3) // 4 AS mean FROM g),
         h AS (SELECT doc_id AS media_id,
             lower(lpad(to_hex(
               CASE WHEN g0 >= mean THEN 17361641477096079360::UBIGINT ELSE 0::UBIGINT END +
               CASE WHEN g1 >= mean THEN 1085102592318504960::UBIGINT ELSE 0::UBIGINT END +
               CASE WHEN g2 >= mean THEN 4042322160::UBIGINT ELSE 0::UBIGINT END +
               CASE WHEN g3 >= mean THEN 252645135::UBIGINT ELSE 0::UBIGINT END), 16, '0')) AS ahash_hex
           FROM m)
         SELECT media_id, ahash_hex,
           COUNT(*) OVER (PARTITION BY ahash_hex) AS dup_group
         FROM h ORDER BY media_id""",
    "q86_image_neardup" ->
      """WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
         g AS (SELECT doc_id,
             ((( 7*doc_id + 13*0) % 256) + ((11*doc_id + 17*0) % 256) + ((19*doc_id + 23*0) % 256)) // 3 AS g0,
             ((( 7*doc_id + 13*1) % 256) + ((11*doc_id + 17*1) % 256) + ((19*doc_id + 23*1) % 256)) // 3 AS g1,
             ((( 7*doc_id + 13*2) % 256) + ((11*doc_id + 17*2) % 256) + ((19*doc_id + 23*2) % 256)) // 3 AS g2,
             ((( 7*doc_id + 13*3) % 256) + ((11*doc_id + 17*3) % 256) + ((19*doc_id + 23*3) % 256)) // 3 AS g3
           FROM img),
         m AS (SELECT *, (g0 + g1 + g2 + g3) // 4 AS mean FROM g),
         h AS (SELECT doc_id AS id,
             CASE WHEN g0 >= mean THEN 17361641477096079360::UBIGINT ELSE 0::UBIGINT END +
             CASE WHEN g1 >= mean THEN 1085102592318504960::UBIGINT ELSE 0::UBIGINT END +
             CASE WHEN g2 >= mean THEN 4042322160::UBIGINT ELSE 0::UBIGINT END +
             CASE WHEN g3 >= mean THEN 252645135::UBIGINT ELSE 0::UBIGINT END AS h
           FROM m)
         SELECT x.id AS a, y.id AS b,
           CAST(bit_count(xor(x.h, y.h)) AS INT) AS hamming
         FROM h x JOIN h y ON x.id < y.id
         WHERE bit_count(xor(x.h, y.h)) <= 7
         ORDER BY a, b""",
    "q87_audio_fingerprint" ->
      """WITH aud AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
         a AS (SELECT doc_id,
             list_transform(range(0, 12), w -> (doc_id*37 + w*101) % 30000 - 15000) AS amps
           FROM aud),
         s AS (SELECT doc_id, amps,
             list_sum(list_transform(amps, x -> x*x)) AS tot FROM a),
         h AS (SELECT doc_id AS media_id,
             CAST(list_sum(list_transform(range(0, 12),
               w -> CASE WHEN amps[w+1]*amps[w+1]*12 >= tot
                    THEN 1 << (11 - w) ELSE 0 END)) AS BIGINT) AS ahash
           FROM s)
         SELECT media_id, ahash,
           COUNT(*) OVER (PARTITION BY ahash) AS dup_group
         FROM h ORDER BY media_id""",
    "q88_oov_report" ->
      """WITH t AS (SELECT source, unnest(CASE WHEN length(trim(text)) = 0
             THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END) AS term
           FROM documents),
         c AS (SELECT term, count(*) AS n FROM t GROUP BY term HAVING count(*) >= 2),
         r AS (SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS INT) AS rank FROM c),
         v AS (SELECT term FROM r WHERE rank <= 20)
         SELECT source,
           COUNT(*) AS total_tokens,
           CAST(SUM(CASE WHEN t.term NOT IN (SELECT term FROM v) THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           ROUND(CAST(SUM(CASE WHEN t.term NOT IN (SELECT term FROM v) THEN 1 ELSE 0 END) AS DOUBLE)
             / GREATEST(COUNT(*), 1), 6) AS oov_rate
         FROM t GROUP BY source ORDER BY source""",
    "q89_dup_stats" ->
      """SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS distinct_texts,
           COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))) AS distinct_normalized,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))) AS DOUBLE)
             / GREATEST(COUNT(*), 1), 6) AS dup_rate
         FROM documents GROUP BY source ORDER BY source""",
    "q84_margin_mining" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         c AS (SELECT vec_id, label, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[3] > 0 THEN 4 ELSE 0 END + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS cell
           FROM e),
         q AS (SELECT vec_id AS query_id, label AS ql, v AS qv, cell AS qcell FROM c
           WHERE vec_id >= 70 AND vec_id < 80),
         s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
           FROM c JOIN q ON c.cell IN
             (xor(q.qcell, 0), xor(q.qcell, 1), xor(q.qcell, 2), xor(q.qcell, 4), xor(q.qcell, 8))
           WHERE c.label <> q.ql),
         r AS (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rq,
             ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY cosine DESC, query_id) AS rc
           FROM s),
         a AS (SELECT *,
             CAST(SUM(CASE WHEN rq <= 4 THEN CAST(cosine AS DECIMAL(10,6))
                 ELSE CAST(0 AS DECIMAL(10,6)) END) OVER (PARTITION BY query_id) AS DOUBLE)
               / SUM(CASE WHEN rq <= 4 THEN 1 ELSE 0 END) OVER (PARTITION BY query_id) AS avg_q,
             CAST(SUM(CASE WHEN rc <= 4 THEN CAST(cosine AS DECIMAL(10,6))
                 ELSE CAST(0 AS DECIMAL(10,6)) END) OVER (PARTITION BY neighbor_id) AS DOUBLE)
               / SUM(CASE WHEN rc <= 4 THEN 1 ELSE 0 END) OVER (PARTITION BY neighbor_id) AS avg_c
           FROM r),
         m AS (SELECT query_id, neighbor_id, cosine,
             ROUND(cosine / ((avg_q + avg_c) / 2.0), 6) AS margin FROM a),
         b AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY margin DESC, neighbor_id) AS mrank FROM m)
         SELECT query_id, neighbor_id, cosine, margin FROM b
         WHERE mrank = 1 AND margin >= 0.0 ORDER BY query_id""",
    "q80_matryoshka" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
         SELECT vec_id,
           array_to_string(list_transform(
             CASE WHEN nrm > 0 THEN list_transform(v, x -> ROUND(x / nrm, 6))
                  ELSE v END,
             x -> CAST(CAST(x AS DECIMAL(10,6)) AS VARCHAR)), ',') AS truncated
         FROM n ORDER BY vec_id""",
    "q78_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, label AS ql, v AS qv FROM e
           WHERE vec_id >= 60 AND vec_id < 70),
         s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
           FROM e, q WHERE e.label <> q.ql),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    "q93_ulaw_fingerprint" ->
      """WITH aud AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
         w AS (SELECT doc_id, u FROM aud, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS t(u)),
         -- G.711 mu-law expansion, closed form (the JDK table is exactly this)
         d AS (SELECT doc_id, u,
             255 - CAST((doc_id * 31 + u * 47) % 256 AS INT) AS uinv FROM w),
         l AS (SELECT doc_id, u,
             (CASE WHEN uinv >= 128 THEN -1 ELSE 1 END) *
               ((((uinv % 16) * 8 + 132) << ((uinv // 16) % 8)) - 132) AS lin
           FROM d),
         e AS (SELECT doc_id, u, CAST(lin AS BIGINT) * lin AS esq FROM l),
         s AS (SELECT doc_id, SUM(esq) AS tot FROM e GROUP BY doc_id),
         h AS (SELECT e.doc_id AS media_id,
             CAST(SUM(CASE WHEN e.esq * 8 >= s.tot THEN 1 << (7 - e.u) ELSE 0 END)
               AS BIGINT) AS ahash
           FROM e JOIN s ON e.doc_id = s.doc_id GROUP BY e.doc_id)
         SELECT media_id, ahash FROM h ORDER BY media_id""",
    "q92_video_fingerprint" ->
      """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
         fr AS (SELECT doc_id, f FROM v, (VALUES (0),(1),(2),(3)) AS t(f)),
         g AS (SELECT doc_id, f,
             [40,90,160,220][CAST((doc_id + f + 0) % 4 AS INT) + 1] AS g0,
             [40,90,160,220][CAST((doc_id + f + 1) % 4 AS INT) + 1] AS g1,
             [40,90,160,220][CAST((doc_id + f + 2) % 4 AS INT) + 1] AS g2,
             [40,90,160,220][CAST((doc_id + f + 3) % 4 AS INT) + 1] AS g3
           FROM fr),
         b AS (SELECT doc_id, f,
             (CASE WHEN g0 >= 128 THEN 240 ELSE 0 END +
              CASE WHEN g1 >= 128 THEN 15 ELSE 0 END) AS bt,
             (CASE WHEN g2 >= 128 THEN 240 ELSE 0 END +
              CASE WHEN g3 >= 128 THEN 15 ELSE 0 END) AS bb
           FROM g)
         SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
           repeat(printf('%02x', bt), 4) || repeat(printf('%02x', bb), 4) AS ahash_hex
         FROM b ORDER BY media_id, frame_idx""",
    "q91_hard_negatives_pruned" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         c AS (SELECT vec_id, label, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[3] > 0 THEN 4 ELSE 0 END + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS cell
           FROM e),
         q AS (SELECT vec_id AS query_id, label AS ql, v AS qv, cell AS qcell FROM c
           WHERE vec_id >= 80 AND vec_id < 90),
         s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
           FROM c JOIN q ON c.cell IN
             (xor(q.qcell, 0), xor(q.qcell, 1), xor(q.qcell, 2), xor(q.qcell, 4), xor(q.qcell, 8))
           WHERE c.label <> q.ql),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    // algorithmic oracle: md5-bucketed unigrams, add-1-smoothed bucket
    // distributions over corpus (p) and target (q), per-bucket log ratio
    // in integer micro-units (floor(x*1e6 + 0.5) = JVM Math.round), exact
    // integer score sums, deterministic top-100
    "q100_dsir_selection" ->
      s"""WITH t AS (SELECT doc_id, source, unnest($toks) AS tok FROM documents),
         b AS (SELECT doc_id, source,
             (instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
             (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS bucket
           FROM t),
         spine AS (SELECT unnest(range(0, 256)) AS bucket),
         p AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
         q AS (SELECT bucket, count(*) AS c FROM b
           WHERE source IN ('src0', 'src1') GROUP BY bucket),
         tot AS (SELECT (SELECT count(*) FROM b) AS pt,
             (SELECT count(*) FROM b WHERE source IN ('src0', 'src1')) AS qt),
         r AS (SELECT s.bucket,
             CAST(FLOOR((ln((COALESCE(q.c, 0) + 1) / (tot.qt + 256.0)) -
                         ln((COALESCE(p.c, 0) + 1) / (tot.pt + 256.0)))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM spine s CROSS JOIN tot
           LEFT JOIN p ON p.bucket = s.bucket
           LEFT JOIN q ON q.bucket = s.bucket),
         sc AS (SELECT d.doc_id,
             ROUND(COALESCE(SUM(r.micro), 0) / 1000000.0, 6) AS score
           FROM documents d
           LEFT JOIN b ON b.doc_id = d.doc_id
           LEFT JOIN r ON r.bucket = b.bucket
           GROUP BY d.doc_id),
         rk AS (SELECT doc_id, score, CAST(ROW_NUMBER() OVER
             (ORDER BY score DESC, doc_id) AS INT) AS rank FROM sc)
         SELECT doc_id, score, rank FROM rk WHERE rank <= 100""",
    // q100's score machinery + the Gumbel-max trick: u from 32 md5 bits,
    // key = score/T - ln(-ln(u)), deterministic seeded "randomness"
    "q101_dsir_resample" ->
      s"""WITH t AS (SELECT doc_id, source, unnest($toks) AS tok FROM documents),
         b AS (SELECT doc_id, source,
             (instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
             (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) AS bucket
           FROM t),
         spine AS (SELECT unnest(range(0, 256)) AS bucket),
         p AS (SELECT bucket, count(*) AS c FROM b GROUP BY bucket),
         q AS (SELECT bucket, count(*) AS c FROM b
           WHERE source IN ('src0', 'src1') GROUP BY bucket),
         tot AS (SELECT (SELECT count(*) FROM b) AS pt,
             (SELECT count(*) FROM b WHERE source IN ('src0', 'src1')) AS qt),
         r AS (SELECT s.bucket,
             CAST(FLOOR((ln((COALESCE(q.c, 0) + 1) / (tot.qt + 256.0)) -
                         ln((COALESCE(p.c, 0) + 1) / (tot.pt + 256.0)))
               * 1000000 + 0.5) AS BIGINT) AS micro
           FROM spine s CROSS JOIN tot
           LEFT JOIN p ON p.bucket = s.bucket
           LEFT JOIN q ON q.bucket = s.bucket),
         sc AS (SELECT d.doc_id,
             ROUND(COALESCE(SUM(r.micro), 0) / 1000000.0, 6) AS score
           FROM documents d
           LEFT JOIN b ON b.doc_id = d.doc_id
           LEFT JOIN r ON r.bucket = b.bucket
           GROUP BY d.doc_id),
         g AS (SELECT doc_id, score,
             ROUND(score / 0.5 - ln(-ln(
               ((('0x' || substr(md5(doc_id || ':graft-dsir'), 1, 8))::BIGINT) + 0.5)
                 / 4294967296.0)), 6) AS gumbel_key
           FROM sc),
         rk AS (SELECT doc_id, score, gumbel_key, CAST(ROW_NUMBER() OVER
             (ORDER BY gumbel_key DESC, doc_id) AS INT) AS rank FROM g)
         SELECT doc_id, score, gumbel_key, rank FROM rk WHERE rank <= 100""",
    // algorithmic oracle: sampled codebook (lowest-16 ids), L2 assignment
    // with lowest-index tie-break, nprobe=4 probing, label-disjoint
    // in-cell top-k — q39's assignment CTEs composed with q91's contract
    "q98_hard_negatives_trained" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         ranked AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM ranked WHERE rn = 1),
         qprobe AS (SELECT vec_id AS query_id, cidx AS cell FROM ranked
           WHERE rn <= 4 AND vec_id >= 90 AND vec_id < 100),
         s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(qe.v, ne.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 6) AS cosine
           FROM qprobe q
           JOIN assign a ON a.cell = q.cell
           JOIN e qe ON qe.vec_id = q.query_id
           JOIN e ne ON ne.vec_id = a.vec_id
           WHERE ne.label <> qe.label),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    // q84's margin machinery on candidates from the trained-codebook tier
    "q99_margin_mining_trained" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         ranked AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM ranked WHERE rn = 1),
         qprobe AS (SELECT vec_id AS query_id, cidx AS cell FROM ranked
           WHERE rn <= 4 AND vec_id >= 100 AND vec_id < 110),
         s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(qe.v, ne.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 6) AS cosine
           FROM qprobe q
           JOIN assign a ON a.cell = q.cell
           JOIN e qe ON qe.vec_id = q.query_id
           JOIN e ne ON ne.vec_id = a.vec_id
           WHERE ne.label <> qe.label),
         r AS (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rq,
             ROW_NUMBER() OVER (PARTITION BY neighbor_id ORDER BY cosine DESC, query_id) AS rc
           FROM s),
         a AS (SELECT *,
             CAST(SUM(CASE WHEN rq <= 4 THEN CAST(cosine AS DECIMAL(10,6))
                 ELSE CAST(0 AS DECIMAL(10,6)) END) OVER (PARTITION BY query_id) AS DOUBLE)
               / SUM(CASE WHEN rq <= 4 THEN 1 ELSE 0 END) OVER (PARTITION BY query_id) AS avg_q,
             CAST(SUM(CASE WHEN rc <= 4 THEN CAST(cosine AS DECIMAL(10,6))
                 ELSE CAST(0 AS DECIMAL(10,6)) END) OVER (PARTITION BY neighbor_id) AS DOUBLE)
               / SUM(CASE WHEN rc <= 4 THEN 1 ELSE 0 END) OVER (PARTITION BY neighbor_id) AS avg_c
           FROM r),
         m AS (SELECT query_id, neighbor_id, cosine,
             ROUND(cosine / ((avg_q + avg_c) / 2.0), 6) AS margin FROM a),
         b AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY margin DESC, neighbor_id) AS mrank FROM m)
         SELECT query_id, neighbor_id, cosine, margin FROM b
         WHERE mrank = 1 AND margin >= 0.0 ORDER BY query_id""",
    "q46_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toks) AS INT) AS token_count
           FROM documents),
         w AS (SELECT *, COALESCE(SUM(token_count) OVER (PARTITION BY source
             ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM t),
         p AS (SELECT doc_id, source, token_count,
             source || '#' || CAST(CAST(FLOOR(cb / 512.0) AS BIGINT) AS VARCHAR) AS pack_id
           FROM w)
         SELECT doc_id, source, token_count, pack_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY pack_id ORDER BY doc_id) - 1 AS INT) AS pack_pos
         FROM p""",
    "q47_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
             CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, ts
           FROM events),
         w AS (SELECT *, LAG(sec) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
           FROM e),
         s AS (SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
             THEN 1 ELSE 0 END AS st FROM w),
         x AS (SELECT *, CAST(SUM(st) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
           FROM s)
         SELECT user_id, session_idx,
           MIN(sec) AS session_start_sec, MAX(sec) AS session_end_sec,
           COUNT(*) AS session_events,
           COUNT(DISTINCT event_type) AS distinct_event_types,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM x GROUP BY 1, 2""",
    "q21_exact_dedup" ->
      """SELECT * FROM documents
         WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""",
    "q53_quantize_int8" ->
      """WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
         s AS (SELECT vec_id, v, list_aggregate(v, 'min') AS lo,
                 list_aggregate(v, 'max') AS hi FROM e),
         s2 AS (SELECT *, CASE WHEN hi > lo THEN hi - lo ELSE 1.0 END AS rng
                FROM s),
         c AS (SELECT vec_id, v, lo, hi, rng,
                 list_transform(v, x ->
                   CAST(FLOOR((x - lo) / rng * 255.0 + 0.5) AS BIGINT)) AS codes
               FROM s2)
         SELECT vec_id,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(codes, k -> k * k)) AS BIGINT) AS code_sumsq,
           ROUND(lo, 6) AS qmin, ROUND(hi, 6) AS qmax
         FROM c ORDER BY vec_id""",
    "q52_range_join" ->
      """WITH o AS (SELECT o_totalprice,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS od
             FROM orders),
         b AS (SELECT MIN(od) AS lo FROM o)
         -- the weekly windows partition the date domain, so interval
         -- containment reduces to bucket arithmetic in the oracle
         SELECT CAST((od - lo) // 7 AS BIGINT) AS week_id,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM o, b GROUP BY 1 ORDER BY 1""",
    "q51_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS purchase_us
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, epoch_us(ts) AS view_us, MAX(event_id) AS view_id
               FROM events WHERE event_type = 'view' GROUP BY 1, 2),
         j AS (SELECT p.*, v.view_id, v.view_us,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                   ORDER BY v.view_us DESC NULLS LAST) AS rn
               FROM p LEFT JOIN v
                 ON p.user_id = v.user_id AND v.view_us <= p.purchase_us)
         SELECT event_id, user_id, purchase_us, view_id,
           purchase_us - view_us AS view_gap_us
         FROM j WHERE rn = 1 ORDER BY event_id""",
    "q50_dedup_groups" ->
      s"""WITH RECURSIVE s AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         p AS (SELECT x.doc_id AS a, y.doc_id AS b
               FROM s x JOIN s y ON x.doc_id < y.doc_id
               WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
                     len(list_distinct(x.sh || y.sh)) >= 0.8),
         e AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
         r(id, c) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.a, r.c FROM e JOIN r ON r.id = e.b),
         g AS (SELECT id AS doc_id, MIN(c) AS group_id FROM r GROUP BY id)
         SELECT doc_id, group_id, doc_id = group_id AS is_canonical
         FROM g ORDER BY doc_id""",
    "q22_minhash_lsh" ->
      s"""WITH s AS (SELECT doc_id, $shinglesSql AS sh FROM documents)
         SELECT x.doc_id AS a, y.doc_id AS b,
           ROUND(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
                 len(list_distinct(x.sh || y.sh)), 6) AS jaccard
         FROM s x JOIN s y ON x.doc_id < y.doc_id
         WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
               len(list_distinct(x.sh || y.sh)) >= 0.8
         ORDER BY a, b""",
    "q23_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($toks) AS tk FROM documents),
         near AS (
           SELECT count(*) AS near_pairs
           FROM documents x JOIN documents y
             ON x.source = y.source AND x.doc_id < y.doc_id
           JOIN t tx ON tx.doc_id = x.doc_id
           JOIN t ty ON ty.doc_id = y.doc_id
           WHERE CAST(len(list_intersect(tx.tk, ty.tk)) AS DOUBLE) /
                 len(list_distinct(tx.tk || ty.tk)) >= 0.8),
         far AS (
           SELECT count(*) AS far_pairs
           FROM t x JOIN t y ON y.doc_id = x.doc_id + 1
           WHERE COALESCE(CAST(len(list_intersect(x.tk, y.tk)) AS DOUBLE) /
                 NULLIF(len(list_distinct(x.tk || y.tk)), 0), 0.0) < 0.3)
         SELECT near_pairs, far_pairs, TRUE AS hamming_separated
         FROM near, far""",
    "q40_train_test_split" ->
      """SELECT doc_id, source,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 4) < 'e666'
              THEN 'train' ELSE 'test' END AS split
         FROM documents""",
    "q41_decontamination" ->
      s"""WITH s AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
         p AS (SELECT doc_id AS bench_id, sh AS ph FROM s WHERE doc_id % 50 = 0),
         c AS (SELECT doc_id AS train_id, sh FROM s WHERE doc_id % 50 <> 0)
         SELECT c.train_id, p.bench_id,
           ROUND(CAST(len(list_intersect(c.sh, p.ph)) AS DOUBLE) / len(p.ph), 6) AS containment
         FROM c, p
         WHERE CAST(len(list_intersect(c.sh, p.ph)) AS DOUBLE) / len(p.ph) >= 0.5""",
    "q42_pii_redaction" -> {
      val planted =
        """text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' ||
           CAST(doc_id % 256 AS VARCHAR) || '.1 ssn ' || printf('%03d', doc_id % 1000) || '-42-1234'"""
      val redactChain = graft.text.TextAnalysis.piiPatterns.foldLeft("t.text") {
        case (acc, (_, pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      val countCols = graft.text.TextAnalysis.piiPatterns.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(t.text, '$pat')) AS BIGINT) AS ${name}_count"
      }.mkString(",\n           ")
      s"""WITH t AS (SELECT doc_id, $planted AS text FROM documents)
         SELECT doc_id,
           $countCols,
           $redactChain AS redacted
         FROM t"""
    },
    // algorithmic oracle: replicates the sign-bit quantizer, hamming-1
    // multi-probe, and in-cell top-k exactly
    "q26_ann_ivf_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         c AS (SELECT vec_id, v,
             (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END + CASE WHEN v[2] > 0 THEN 2 ELSE 0 END +
              CASE WHEN v[3] > 0 THEN 4 ELSE 0 END + CASE WHEN v[4] > 0 THEN 8 ELSE 0 END) AS cell
           FROM e),
         q AS (SELECT vec_id AS query_id, v AS qv, cell AS qcell FROM c
           WHERE vec_id >= 10 AND vec_id < 20),
         s AS (SELECT q.query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, c.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
           FROM c JOIN q ON c.cell IN
             (xor(q.qcell, 0), xor(q.qcell, 1), xor(q.qcell, 2), xor(q.qcell, 4), xor(q.qcell, 8))
           WHERE c.vec_id <> q.query_id),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    // same algorithmic pipeline as q39 but through the persistent
    // cell-partitioned index table; queries 30-40
    "q48_ann_ivf_index" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         ranked AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM ranked WHERE rn = 1),
         qprobe AS (SELECT vec_id AS query_id, cidx AS cell FROM ranked
           WHERE rn <= 4 AND vec_id >= 30 AND vec_id < 40),
         s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(qe.v, ne.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 6) AS cosine
           FROM qprobe q
           JOIN assign a ON a.cell = q.cell
           JOIN e qe ON qe.vec_id = q.query_id
           JOIN e ne ON ne.vec_id = a.vec_id
           WHERE a.vec_id <> q.query_id),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    // algorithmic oracle: sampled codebook (lowest-16 ids), L2 assignment
    // with lowest-index tie-break, nprobe=4 probing, in-cell top-k
    "q39_ann_ivf_trained" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
           FROM e ORDER BY vec_id LIMIT 16),
         dist AS (SELECT vec_id, cidx, list_dot_product(diff, diff) AS d FROM (
           SELECT e.vec_id, c.cidx,
             list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS diff
           FROM e, cent c)),
         ranked AS (SELECT vec_id, cidx, ROW_NUMBER() OVER
             (PARTITION BY vec_id ORDER BY d, cidx) AS rn FROM dist),
         assign AS (SELECT vec_id, cidx AS cell FROM ranked WHERE rn = 1),
         qprobe AS (SELECT vec_id AS query_id, cidx AS cell FROM ranked
           WHERE rn <= 4 AND vec_id >= 20 AND vec_id < 30),
         s AS (SELECT q.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(qe.v, ne.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(ne.v, ne.v))), 6) AS cosine
           FROM qprobe q
           JOIN assign a ON a.cell = q.cell
           JOIN e qe ON qe.vec_id = q.query_id
           JOIN e ne ON ne.vec_id = a.vec_id
           WHERE a.vec_id <> q.query_id),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    "q29_multimodal_features" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
              WHEN doc_id % 3 = 1 THEN 'audio/wav'
              ELSE 'video/avi' END AS mime,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 END AS INT) AS width,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 END AS INT) AS height,
         CAST(CASE WHEN doc_id % 3 = 1 THEN 375
                   WHEN doc_id % 3 = 2 THEN 500 ELSE 0 END AS BIGINT) AS duration_ms,
         CAST(12 AS INT) AS feature_dim,
         TRUE AS norm_in_range,
         CAST(CASE WHEN doc_id % 3 = 0 THEN NULL ELSE 64 END AS INT) AS thumb_len,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 4 END AS INT) AS thumb_w,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 4 END AS INT) AS thumb_h,
         CAST(CASE WHEN doc_id % 3 = 2 THEN 4 ELSE 0 END AS BIGINT) AS frame_count,
         CASE WHEN doc_id % 3 = 0 THEN array_to_string(list_transform([
             ((7*doc_id + 13*0) % 256) / 256.0, ((11*doc_id + 17*0) % 256) / 256.0, ((19*doc_id + 23*0) % 256) / 256.0,
             ((7*doc_id + 13*1) % 256) / 256.0, ((11*doc_id + 17*1) % 256) / 256.0, ((19*doc_id + 23*1) % 256) / 256.0,
             ((7*doc_id + 13*2) % 256) / 256.0, ((11*doc_id + 17*2) % 256) / 256.0, ((19*doc_id + 23*2) % 256) / 256.0,
             ((7*doc_id + 13*3) % 256) / 256.0, ((11*doc_id + 17*3) % 256) / 256.0, ((19*doc_id + 23*3) % 256) / 256.0],
             x -> CAST(CAST(x AS DECIMAL(18,15)) AS VARCHAR)), ',')
           WHEN doc_id % 3 = 1 THEN array_to_string(list_transform([
             abs((doc_id*37 +  0*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 +  1*101) % 30000 - 15000) / 32768.0,
             abs((doc_id*37 +  2*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 +  3*101) % 30000 - 15000) / 32768.0,
             abs((doc_id*37 +  4*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 +  5*101) % 30000 - 15000) / 32768.0,
             abs((doc_id*37 +  6*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 +  7*101) % 30000 - 15000) / 32768.0,
             abs((doc_id*37 +  8*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 +  9*101) % 30000 - 15000) / 32768.0,
             abs((doc_id*37 + 10*101) % 30000 - 15000) / 32768.0, abs((doc_id*37 + 11*101) % 30000 - 15000) / 32768.0],
             x -> CAST(CAST(x AS DECIMAL(18,15)) AS VARCHAR)), ',')
           ELSE NULL END AS feat
         FROM documents""",
    "q24_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, source,
           list_distinct(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END) AS toks
           FROM documents)
         SELECT x.doc_id AS a, y.doc_id AS b,
           ROUND(CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
                 len(list_distinct(x.toks || y.toks)), 6) AS jaccard
         FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
         WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
               len(list_distinct(x.toks || y.toks)) >= 0.8""",
    "q25_ann_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
           FROM e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    "q71_binary_ann" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id >= 50 AND vec_id < 60),
         s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(len(list_filter(range(1, 65), i -> (q.qv[i] >= 0) <> (e.v[i] >= 0))) AS INT) AS hamming,
             list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cos_raw
           FROM e, q WHERE e.vec_id <> q.query_id),
         c AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS hrank FROM s),
         r AS (SELECT query_id, neighbor_id, hamming, ROUND(cos_raw, 6) AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY ROUND(cos_raw, 6) DESC, neighbor_id) AS INT) AS rank
           FROM c WHERE hrank <= 20)
         SELECT query_id, rank, neighbor_id, hamming, cosine FROM r WHERE rank <= 5""",
    "q68_semantic_dedup_indexed" -> semanticDedupOracle,
    "q65_semantic_dedup" -> semanticDedupOracle,
    "q28_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT *, sqrt(list_dot_product(v, v)) AS norm FROM e)
         SELECT x.vec_id AS a, y.vec_id AS b,
           ROUND(list_dot_product(x.v, y.v) / (x.norm * y.norm), 6) AS cosine
         FROM n x JOIN n y ON x.label = y.label AND x.vec_id < y.vec_id
         WHERE list_dot_product(x.v, y.v) / (x.norm * y.norm) >= 0.35""",
    "q27_text_analysis" -> {
      val en = hitsSql(TextAnalysis.stopwords.head._2)
      val langCase = {
        val scores = TextAnalysis.stopwords.map { case (l, ws) => l -> hitsSql(ws) }
        val best = s"greatest(${scores.map(_._2).mkString(", ")})"
        val whens = scores.map { case (l, s) =>
          s"WHEN $s = $best AND $s > 0 THEN '$l'"
        }.mkString(" ")
        s"CASE $whens ELSE 'und' END"
      }
      s"""SELECT doc_id,
          CAST(len($toks) AS INT) AS token_count,
          CAST(length(text) AS INT) AS char_count,
          $langCase AS predicted_lang,
          CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS punct_ratio,
          CAST($en AS DOUBLE) / greatest(len(list_distinct($toks)), 1) AS stopword_ratio,
          ROUND(LEAST(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) * 0.4
            + (CAST($en AS DOUBLE) / greatest(len(list_distinct($toks)), 1)) * 0.3
            + (1.0 - CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1)) * 0.3, 6) AS quality_score,
          md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fingerprint
          FROM documents"""
    })
}

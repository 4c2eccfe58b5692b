package graft.dedup

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.text.TextAnalysis

/** Deduplication operators for training-data curation at corpus scale:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: everything before the candidate-pair join is a narrow
  * per-row projection (token/shingle arrays, hash vectors) with no UDFs.
  * The only shuffles are (a) the LSH band bucket join — which is the point
  * of LSH: candidate pairs come from equi-joins on (band, bandHash), never
  * from an O(n²) cross join — and (b) the final per-bucket aggregation.
  * At 100 TB, band keys are uniformly-distributed hashes, so the shuffle
  * partitions evenly (no skew salting needed).
  */
object Dedup {

  /** Exact dedup (hash-groupBy): canonical representative = lowest doc id
    * per identical text. One shuffle on the text hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The canonical pre-dedup text normalization (the C4/RefinedWeb recipe
    * step): lowercase, strip everything but alphanumerics and whitespace,
    * collapse whitespace runs, trim. Pure codegen'd string ops — narrow,
    * no shuffle — and the character classes are engine-portable (Java and
    * RE2 regex agree on them), so an external oracle replays it verbatim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Per-group duplication statistics (the dedup dataset-card numbers a
    * curation run reports BEFORE deciding to dedup): document count,
    * distinct raw texts, distinct normalized texts, and the normalized dup
    * rate. Distinctness counts md5 digests, not the documents themselves —
    * the shuffle carries 32-byte hashes instead of full texts, so the
    * report costs one bounded-key aggregation at any corpus size (md5
    * collisions are ~2^-64 noise, and the ORACLE counts the same digests,
    * so the gate is still exact). */
  def dupStats(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text"): DataFrame =
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("distinct_texts"),
      countDistinct(md5(normalizeText(col(textCol)))).as("distinct_normalized"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("distinct_normalized").cast("double") /
          greatest(col("n_docs"), lit(1L)), 6))

  /** Exact dedup on NORMALIZED text: catches duplicates that differ only in
    * case, punctuation, or whitespace — the realistic exact-dedup unit for
    * web corpora, where boilerplate variants defeat raw-byte hashing. Same
    * single-shuffle shape as [[exact]]; survivors keep their ORIGINAL text. */
  def exactNormalized(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(sha2(normalizeText(col(textCol)), 256)).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles; short docs fall back to the whole token string
    * (sequence() would be ill-defined for size < n).
    *
    * The token array is let-bound as a lambda variable (transform over a
    * single-element array) so the tokenizer's regex split runs ONCE per doc.
    * Referencing `tokens(text)` directly inside the index lambda would
    * re-split the full text per shingle — Catalyst does not hoist
    * loop-invariant subtrees out of HigherOrderFunction lambdas, which made
    * the naive shape O(tokens²) regex work per document. */
  def shingles(text: Column, n: Int = 3): Column =
    element_at(
      transform(array(TextAnalysis.tokens(text)), toks =>
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
          .otherwise(array(concat_ws(" ", toks)))),
      1)

  /** 64-permutation MinHash signatures via explode + N-way min aggregation.
    *
    * Each shingle string is hashed to a 64-bit base ONCE; permutation i is
    * the cheap long re-hash xxhash64(h, i). A nested-lambda formulation
    * (transform over permutations of array_min over shingles) would
    * re-evaluate the shingle expression per permutation — Catalyst does not
    * hoist loop-invariant subtrees out of HigherOrderFunction lambdas — so
    * the agg shape is ~numHashes× cheaper. Map-side partial aggregation
    * collapses the exploded shingles to one row per doc per partition
    * before the (single) shuffle on doc id, which is what keeps this
    * viable at corpus scale. */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      shingleN: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(shingles(col(textCol), shingleN))).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    sh.groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket-join on (band, hash(band slice)), emit each pair
    * once (a < b) with the MinHash-estimated Jaccard. */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 16,
      minEstJaccard: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(docs, idCol, textCol, numHashes)
    // Pair generation shuffles ONLY (id, band, bandHash) ints — signatures
    // rejoin after dedup, so the wide arrays never ride through the band
    // explosion or the candidate-pair shuffle.
    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("bucket"))
      .select(col("id"), col("bucket.band"), col("bucket.bh"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .dropDuplicates("a", "b")
    pairs
      .join(sig.select(col("id").as("a"), col("sig").as("sa")), "a")
      .join(sig.select(col("id").as("b"), col("sig").as("sb")), "b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), p => p))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("a"), col("b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** Exact 3-gram-shingle Jaccard pairs with LSH candidate generation —
    * the full MinHash+LSH dedup pipeline made exactly-verifiable: banding
    * proposes candidates (miss probability (1-J^2)^32 ≈ 6e-15 at J=0.8),
    * exact shingle-set Jaccard confirms them, so the output equals the
    * all-pairs result without any all-pairs stage. */
  def shingleJaccardLsh(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.8,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    val t = docs.select(col(idCol).as("id"),
      array_distinct(transform(shingles(col(textCol), shingleN), s => xxhash64(s)))
        .as("sh"))
      .withColumn("n", size(col("sh")))
    val rowsPerBand = numHashes / bands
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = t.select(col("id"), explode(col("sh")).as("h"))
      .groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("bucket"))
      .select(col("id"), col("bucket.band"), col("bucket.bh"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .dropDuplicates("a", "b")
    cands
      .join(t.select(col("id").as("a"), col("sh").as("sa"), col("n").as("na")), "a")
      .join(t.select(col("id").as("b"), col("sh").as("sb"), col("n").as("nb")), "b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        coalesce(try_divide(col("inter").cast("double"),
          (col("na") + col("nb") - col("inter")).cast("double")), lit(0.0)))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Benchmark decontamination: which corpus docs contain a large share of
    * a probe (benchmark) document's n-gram shingles. Containment
    * |S(probe) ∩ S(doc)| / |S(probe)| is the standard train-set
    * contamination test. Computed as an inverted-index equi-join on shingle
    * hashes — the corpus is exploded once, the (small) probe side drives
    * the join, and the per-(doc, probe) intersection count is a partial+
    * final hash aggregation. No all-pairs stage; skew on ubiquitous
    * shingles is bounded by using long-enough n-grams (callers doing web-
    * scale decontamination typically use n = 8..13). */
  def containmentPairs(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      minContainment: Double = 0.5): DataFrame = {
    def sh(df: DataFrame, as: String) = df.select(col(idCol).as(as),
      array_distinct(transform(shingles(col(textCol), shingleN), s => xxhash64(s))).as("sh"))
    val c = sh(corpus, "train_id").select(col("train_id"), explode(col("sh")).as("h"))
    val p = sh(probes, "bench_id")
      .select(col("bench_id"), size(col("sh")).as("pn"), explode(col("sh")).as("h"))
    c.join(p, "h")
      .groupBy("train_id", "bench_id", "pn")
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment", col("inter").cast("double") / col("pn").cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("train_id"), col("bench_id"), round(col("containment"), 6).as("containment"))
  }

  /** 64-bit SimHash per document. Explode + one groupBy (the scale-safe
    * shape: the 64 bit-sums are a single hash aggregation, partial+final). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k")
    }
    val assembled = (0 until 64).map { k =>
      when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id").as(idCol), assembled.as("simhash"))
  }

  /** Exact token-set Jaccard pairs, LSH-blocked: candidates come from a
    * banded-MinHash equi-join over the SAME token sets the exact Jaccard
    * measures, then only candidates are exact-verified. `blockCol` is a
    * semantic constraint (pairs must share it), NOT the scale mechanism —
    * there is no all-pairs join within any fixed key, so a skewed or
    * million-doc block cannot produce an O(n²) stage.
    *
    * Recall: a pair with true Jaccard J survives banding with probability
    * 1-(1-J^r)^b; at the r=2, b=32 default a J=0.8 pair is missed with
    * probability (1-0.64)^32 ≈ 6e-15 — deterministically verified against
    * the exact all-pairs oracle on the test corpus — while a J=0.1 pair
    * becomes a (cheap, exactly-verified) candidate only ~27% of the time. */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 32): DataFrame = {
    // tokens are hashed to 64-bit longs ONCE: set operations on long arrays
    // are far cheaper than on strings, and the minhash permutations re-hash
    // the long instead of re-reading the token. |A∪B| = |A|+|B|-|A∩B| so
    // only the intersect is materialized per verified pair.
    val t = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(transform(TextAnalysis.tokens(col(textCol)), tk => xxhash64(tk)))
        .as("toks"))
      .withColumn("n", size(col("toks")))
    val rowsPerBand = numHashes / bands
    // signatures from the exploded token-hash sets (map-side partial min agg
    // collapses to one row per doc before the single shuffle on id)
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = t.select(col("id"), col("blk"), explode(col("toks")).as("h"))
      .groupBy("id", "blk")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), col("blk"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    // band buckets shuffle only (id, blk, band, bandHash) — the signature
    // arrays never ride through the candidate join
    val banded = sig.select(col("id"), col("blk"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("bucket"))
      .select(col("id"), col("blk"), col("bucket.band"), col("bucket.bh"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.blk") === col("y.blk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .dropDuplicates("a", "b")
    // exact verification on candidates only
    // try_divide: ANSI mode would error on a (empty, empty) pair
    cands
      .join(t.select(col("id").as("a"), col("toks").as("ta"), col("n").as("na")), "a")
      .join(t.select(col("id").as("b"), col("toks").as("tb"), col("n").as("nb")), "b")
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard",
        coalesce(try_divide(col("inter").cast("double"),
          (col("na") + col("nb") - col("inter")).cast("double")), lit(0.0)))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding cosine near-duplicate pairs, blocked by trained quantizer
    * cells (the same IVF codebook the ANN search path uses): every vector is
    * multi-probe-assigned to its `nprobe` nearest centroids, candidates come
    * from the in-cell equi-join, and only candidates are exactly scored.
    * `blockCol` is a semantic constraint (pairs must share it), not the
    * scale mechanism — a million-vector label cannot produce an all-pairs
    * stage; cell population is bounded by the codebook granularity (nlist
    * scales with corpus size; comparisons drop ~nlist/nprobe-fold). */
  def embeddingNearDupPairs(
      emb: DataFrame,
      blockCol: String,
      centroids: Array[Array[Double]],
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minCosine: Double = 0.95): DataFrame = {
    import graft.functions.VectorFunctions
    val v = emb.select(col(idCol).as("id"), col(blockCol).as("blk"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val withNorm = v.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    // candidate generation shuffles only (id, blk, cell) — vectors never
    // ride the pair join; multi-probe overlap is deduped before scoring
    val celled = withNorm.select(col("id"), col("blk"),
      explode(VectorFunctions.nearestCentroids(col("v"), centroids, nprobe)).as("cell"))
    val cands = celled.as("x").join(celled.as("y"),
        col("x.cell") === col("y.cell") && col("x.blk") === col("y.blk") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .dropDuplicates("a", "b")
    cands
      .join(withNorm.select(col("id").as("a"), col("v").as("va"), col("norm").as("na")), "a")
      .join(withNorm.select(col("id").as("b"), col("v").as("vb"), col("norm").as("nb")), "b")
      .withColumn("cosine",
        aggregate(zip_with(col("va"), col("vb"), (a, b) => a * b), lit(0.0), (acc, x) => acc + x) /
          (col("na") * col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
  }

  /** Connected components over an undirected edge list — the grouping
    * stage a dedup pipeline runs after pair generation: LSH emits
    * near-dup PAIRS, this contracts them into clusters so exactly one
    * canonical doc per cluster can be kept (pairwise keep-rules drop too
    * much or too little whenever near-duplication is transitive).
    *
    * Alternating large-star / small-star contraction (the MapReduce
    * connected-components construction of Kiveris et al., re-expressed as
    * DataFrame groupBy-min + join-back passes): each round halves long
    * chains, so the edge set collapses to one star per component in
    * O(log n) rounds — no driver-side graph, no vertex collect(). The
    * per-round state is only the contracted edge list (bounded by the
    * input pair count), every shuffle keys on node ids, and each round
    * ends in an eager localCheckpoint: persist() alone is NOT enough for
    * iterative DataFrames — the logical plan still nests every prior
    * round and Catalyst re-optimizes the exponentially growing tree.
    * Checkpointing cuts both lineage and plan to O(1) per round (on a
    * cluster where executor loss matters, swap in reliable checkpoint).
    *
    * Returns (id, component) for every node appearing in `pairs`, where
    * component = the smallest node id reachable from it. Join back to the
    * corpus for singleton handling (see [[nearDupGroups]]).
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 50): DataFrame = {
    // set semantics + (u > v) canonical orientation, self-loops dropped
    def canon(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()

    var edges = canon(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
      .localCheckpoint(true)
    var n = edges.count()
    var iter = 0
    var converged = n == 0
    while (!converged && iter < maxIter) {
      // large-star: every neighbor LARGER than u re-links to the minimum
      // of u's neighborhood (incl. u) — long chains fold toward the min
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(least(col("v"), col("u"))).as("m"))
      val large = canon(nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
      // small-star: u and all its smaller neighbors link to that minimum
      val cmins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = canon(
        large.join(cmins, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(cmins.select(col("u"), col("m").as("v"))))
        .localCheckpoint(true)
      val n2 = small.count()
      // fixed point: both are distinct sets, so equal count + empty
      // difference means equal sets (the second check runs only on ties)
      converged = n2 == n && small.exceptAll(edges).isEmpty
      edges = small
      n = n2
      iter += 1
    }
    // the fixed point is a star per component: every edge points at the min
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")).distinct())
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Fingerprint-index rows for [[incrementalExact]]: (id, fp) with fp =
    * sha2-256 of the text. A 100 TB corpus reduces to a few hundred GB of
    * fingerprints — the only state incremental dedup ever has to keep or
    * scan; persist it as a lake table and append each surviving batch's
    * fingerprints after ingestion. */
  def fingerprints(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), sha2(col(textCol), 256).as("fp"))

  /** Incremental exact dedup — the steady-state corpus pattern: a new
    * batch is deduplicated against everything already ingested WITHOUT
    * touching the corpus itself, only its fingerprint index. Within-batch
    * duplicates keep the lowest id (one window shuffle over the small
    * batch), then one anti-join on the fingerprint drops batch rows whose
    * text the corpus already has. shuffle_hash pins the plan: the index
    * is scanned once per batch and must never be driver-broadcast (its
    * size grows with the corpus, not the batch); at scale the batch side
    * alone reshuffles if the index table is stored pre-partitioned on fp. */
  def incrementalExact(
      batch: DataFrame,
      corpusFingerprints: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    batch.withColumn("__fp", sha2(col(textCol), 256))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .join(corpusFingerprints.select(col("fp").as("__fp")).hint("shuffle_hash"),
        Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Shingle-hash index rows for [[incrementalNearDup]] — (id, sh) with
    * `sh` the distinct 64-bit-hashed n-gram shingles of the text. The
    * near-dup analogue of [[fingerprints]]: ~8 bytes per token instead of
    * the raw text, the only state incremental near-dedup keeps or scans.
    * Persist as a lake table and append each surviving batch's rows. */
  def shingleIndex(
      docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"),
      array_distinct(transform(shingles(col(textCol), shingleN), s => xxhash64(s)))
        .as("sh"))

  /** MinHash signatures over pre-hashed shingle sets (id, sh). */
  private def setSignatures(t: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    t.select(col("id"), explode(col("sh")).as("h"))
      .groupBy("id")
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band-bucket rows (id, band, bh) for a [[shingleIndex]] frame —
    * the second half of the persisted near-dup index. Computing these once
    * per doc at ingestion (and appending survivors' rows per batch) is
    * what lets [[incrementalNearDup]] probe the corpus side as a static
    * equi-join input: stored bucketed/z-ordered on bh, the per-batch band
    * probe prunes to matching files instead of re-hashing the corpus. */
  def bandIndex(
      index: DataFrame, numHashes: Int = 64, bands: Int = 32): DataFrame =
    bandRows(setSignatures(index, numHashes), numHashes, bands)

  /** LSH band-bucket rows (id, band, bh) from signature rows (id, sig). */
  private def bandRows(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("bucket"))
      .select(col("id"), col("bucket.band"), col("bucket.bh"))
  }

  /** Incremental NEAR-dup — the steady-state corpus pattern for fuzzy
    * duplicates: a new batch is deduplicated against everything already
    * ingested WITHOUT touching the corpus, only its [[shingleIndex]]. A
    * batch doc is dropped when exact shingle-set Jaccard >= `minJaccard`
    * against ANY corpus doc or any lower-id batch doc (the pairwise rule,
    * matching [[incrementalExact]]'s lowest-id-keeps semantics; for
    * transitive within-corpus clustering run [[nearDupGroups]] offline).
    *
    * Candidates come from banded-MinHash equi-joins (at the default r=2,
    * b=32 a J=0.8 pair is missed with probability ~6e-15), then ONLY
    * candidates are verified exactly against the stored sets: no all-pairs
    * stage, and the candidate join ships (id, band, bh) ints only.
    *
    * At 100 TB pass `corpusBands` — the persisted [[bandIndex]] rows,
    * appended per batch alongside the shingle index — so the corpus side
    * is a static equi-join input (stored bucketed/z-ordered on bh, the
    * batch's band probe prunes to matching files). When omitted, bands are
    * re-derived from the sets — a full index re-hash per batch, fine for
    * small corpora only. Batch and corpus ids must be disjoint. */
  def incrementalNearDup(
      batch: DataFrame,
      corpusIndex: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minJaccard: Double = 0.8,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 32,
      corpusBands: Option[DataFrame] = None): DataFrame = {
    val bt = shingleIndex(batch, idCol, textCol, shingleN)
      .withColumn("n", size(col("sh")))
    val ct = corpusIndex.select(col("id"), col("sh"))
      .withColumn("n", size(col("sh")))
    val bb = bandRows(setSignatures(bt, numHashes), numHashes, bands)
    val cb = corpusBands.getOrElse(
      bandRows(setSignatures(ct, numHashes), numHashes, bands))
    val candCorpus = bb.as("x").join(cb.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(col("x.id").as("b"), col("y.id").as("o"))
    val candBatch = bb.as("x").join(bb.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("y.id") < col("x.id"))
      .select(col("x.id").as("b"), col("y.id").as("o"))
    val allSets = ct.unionByName(bt.select(col("id"), col("sh"), col("n")))
    val dropped = candCorpus.unionByName(candBatch).dropDuplicates("b", "o")
      .join(bt.select(col("id").as("b"), col("sh").as("sb"), col("n").as("nb")), "b")
      .join(allSets.select(col("id").as("o"), col("sh").as("so"), col("n").as("no")), "o")
      .withColumn("inter", size(array_intersect(col("sb"), col("so"))))
      .withColumn("jaccard",
        coalesce(try_divide(col("inter").cast("double"),
          (col("nb") + col("no") - col("inter")).cast("double")), lit(0.0)))
      .filter(col("jaccard") >= minJaccard)
      .select(col("b")).distinct()
    batch.join(dropped.withColumnRenamed("b", idCol), Seq(idCol), "left_anti")
  }

  /** Per-doc near-dup group assignment: every doc gets the smallest doc id
    * in its near-duplicate cluster (`group_id`) plus an `is_canonical`
    * keep flag; docs without a near-dup are their own singleton group.
    * Filter on `is_canonical` to materialize the deduplicated corpus. */
  def nearDupGroups(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      aCol: String = "a",
      bCol: String = "b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    docs.join(comp, docs(idCol) === comp("id"), "left")
      .withColumn("group_id", coalesce(col("component"), col(idCol)))
      .withColumn("is_canonical", col(idCol) === col("group_id"))
      .drop("id", "component")
  }

  /** Fixed-width word segments of a document (the span unit for
    * [[dedupSegments]]): consecutive `window`-token chunks, last chunk
    * partial. The token array is let-bound (single-element transform) so
    * the tokenizer runs once per doc, not once per segment. */
  def segments(text: Column, window: Int): Column =
    element_at(
      transform(array(TextAnalysis.tokens(text)), t =>
        // empty docs must short-circuit: sequence(0, -1) would infer a
        // NEGATIVE step and emit [0, -1] — two phantom empty segments
        when(size(t) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              floor((size(t) + lit(window - 1)) / lit(window)).cast("int") - 1),
            j => concat_ws(" ", slice(t, j * window + 1, lit(window)))))),
      1)

  /** C4-style duplicated-span removal: chunk every document into
    * fixed-width word segments, and for any segment text occurring more
    * than once in the corpus keep only its first occurrence (lowest
    * (doc id, position)) — every other occurrence is cut from its
    * document. Returns one row per input doc: the cleaned text plus
    * segment/removal counts.
    *
    * Scale shape: segments never ride a shuffle — the exploded frame
    * carries only (doc id, position, md5(segment)), the corpus-wide
    * occurrence stats are one hash aggregation on the 128-bit digest
    * (uniform keys, no skew), decisions join back on the digest, and the
    * per-doc regroup ships one int array per doc. Documents are rebuilt
    * from their own token arrays in a narrow projection, so full text is
    * read exactly twice and shuffled never. */
  def dedupSegments(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Int = 10): DataFrame = {
    val exploded = docs
      .select(col(idCol), posexplode(segments(col(textCol), window)))
      .select(col(idCol), col("pos").as("__i"),
        md5(col("col").cast("binary")).as("__h"))
    val stats = exploded.groupBy("__h").agg(
      count(lit(1)).as("__c"),
      min(struct(col(idCol), col("__i"))).as("__first"))
    val kept = exploded.join(stats, "__h")
      .withColumn("__keep", col("__c") === 1 ||
        (col(s"__first.$idCol") === col(idCol) &&
          col("__first.__i") === col("__i")))
      .groupBy(idCol).agg(
        sort_array(collect_list(when(col("__keep"), col("__i")))).as("__kept"),
        count(lit(1)).as("n_segments"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_removed"))
    docs.join(kept, Seq(idCol), "left")
      .select(col(idCol),
        element_at(transform(array(segments(col(textCol), window)), segs =>
          concat_ws(" ", transform(coalesce(col("__kept"),
            array().cast("array<int>")), j => element_at(segs, j + 1)))), 1)
          .as("clean_text"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}

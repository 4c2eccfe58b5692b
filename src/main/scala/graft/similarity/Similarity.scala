package graft.similarity

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[cosineTopK]] — brute-force: broadcast the (small) query set against
  *    the corpus, one narrow projection per (query, candidate) pair, then a
  *    per-query top-k. The right answer when queries ≪ corpus.
  *  - [[ivfTopK]] — the scale path: a coarse sign-bit quantizer assigns
  *    every vector to one of 2^bits cells; the join only compares vectors
  *    in the probed cells, cutting the candidate set by ~2^bits for a small
  *    recall loss (IVF-flat, as in the FAISS/SCANN literature).
  *
  * Pairwise scoring uses the native codegen'd [[graft.functions.CosineSimilarity]]
  * expression (one fused loop per pair, no UDFs, no lambda dispatch).
  * Cosines are rounded to 6 dp BEFORE ranking so ordering is reproducible
  * across engines and float-fold orders.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine via the native codegen'd expression — one fused loop instead of
    * three lambda-dispatched array walks; bit-identical accumulation order. */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.cosineSim(a, b)

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small enough to broadcast. */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Matryoshka truncation (MRL serving): keep the first `dim` components
    * of each embedding and L2-renormalize — the nested-representation trick
    * that serves a prefix of the vector at a fraction of the storage and
    * compare cost (train once, pick the dimension at query time). Pure
    * codegen arithmetic (slice + fold), narrow, no shuffle; components are
    * rounded to 6 dp after the renormalize so the output is reproducible
    * across engines and float-fold orders. Zero vectors pass through
    * un-normalized (no 0/0). */
  def truncateNormalize(
      emb: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dim > 0, s"bad dim $dim")
    val v = slice(asDouble(col(vecCol)), 1, dim)
    val nrm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    emb.select(col(idCol),
      when(nrm > 0, transform(v, x => round(x / nrm, 6)))
        .otherwise(v).as("truncated"))
  }

  /** Bitext-style margin mining (Artetxe & Schwenk's ratio-margin
    * criterion, the LASER/CCMatrix pair-mining rule): a candidate pair
    * (x, y) scores margin = cos(x,y) / (0.5·(avgTopK(x) + avgTopK(y))) —
    * raw cosine normalized by each side's local similarity neighborhood.
    * Plain cosine thresholds admit "hub" vectors that are close to
    * everything; dividing by the neighborhood means a pair only scores
    * high when the two are MUTUALLY exceptional. Emits each query's best
    * other-label candidate with margin >= minMargin (label plays the role
    * of language in bitext mining: pairs are mined ACROSS labels).
    *
    * avgTopK(x) = mean of x's k best other-label cosines among its
    * CANDIDATES; avgTopK(y) = mean of candidate y's k best cosines among
    * the queries that probed it (the mined direction's denominator —
    * computable without a second corpus pass). Top-k means accumulate in
    * DECIMAL(10,6) so the window sum is order-independent and
    * engine-exact; the final divisions run in double and round to 6 dp.
    *
    * Scale shape — the LASER/CCMatrix pipeline: candidates come from an
    * approximate-kNN tier and margins are computed ON THE kNN LISTS ONLY.
    * With `bits > 0` the corpus is bucketed by the sign-bit coarse
    * quantizer ([[cell]]) and each query probes its `probeHamming`
    * neighborhood, so the candidate join is a broadcast EQUI-join on cell
    * (the corpus never shuffles) and the margin windows exchange only the
    * probed-cell candidate set — ~probed/2^bits of the corpus per query,
    * not the full O(n·q) cross-label scan. `bits = 0` recovers the exact
    * all-candidates baseline (the documented exact tier, like
    * [[cosineTopK]] next to [[ivfTopK]]) — use it only for bounded
    * corpora. */
  def marginMining(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      minMargin: Double = 1.0,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      bits: Int = 4,
      probeHamming: Int = 1,
      centroids: Array[Array[Double]] = null,
      nprobe: Int = 2): DataFrame = {
    val scored = labelDisjointScored(corpus, queries, idCol, vecCol, labelCol,
      bits, probeHamming, centroids, nprobe)
    val wq = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    val wc = Window.partitionBy("neighbor_id").orderBy(col("cosine").desc, col("query_id"))
    val ranked = scored
      .withColumn("rq", row_number().over(wq))
      .withColumn("rc", row_number().over(wc))
    val dec = col("cosine").cast("decimal(10,6)")
    val wqAll = Window.partitionBy("query_id")
    val wcAll = Window.partitionBy("neighbor_id")
    val withAvgs = ranked
      .withColumn("avg_q",
        sum(when(col("rq") <= k, dec).otherwise(lit(0).cast("decimal(10,6)"))).over(wqAll)
          .cast("double") /
          sum(when(col("rq") <= k, 1L).otherwise(0L)).over(wqAll))
      .withColumn("avg_c",
        sum(when(col("rc") <= k, dec).otherwise(lit(0).cast("decimal(10,6)"))).over(wcAll)
          .cast("double") /
          sum(when(col("rc") <= k, 1L).otherwise(0L)).over(wcAll))
      .withColumn("margin",
        round(col("cosine") / ((col("avg_q") + col("avg_c")) / 2.0), 6))
    val wBest = Window.partitionBy("query_id")
      .orderBy(col("margin").desc, col("neighbor_id"))
    withAvgs.withColumn("mrank", row_number().over(wBest))
      .filter(col("mrank") === 1 && col("margin") >= minMargin)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("margin"))
  }

  /** Label-disjoint scored candidate pairs — the shared front end of
    * [[marginMining]] and [[hardNegatives]]. With `centroids` supplied the
    * pruned tier is data-ADAPTIVE: corpus rows live in their nearest
    * trained cell ([[trainCentroids]]/[[sampleCentroids]], the IVF
    * codebook) and each query probes its `nprobe` nearest cells — same
    * broadcast EQUI-join shape, recall now tracks the data distribution
    * instead of the first sign bits. Otherwise `bits > 0` prunes by the
    * data-independent sign-bit cell with `probeHamming` multi-probe. In
    * both pruned forms the corpus never shuffles and candidate volume
    * drops ~cells/probed-fold; each corpus vector lives in exactly one
    * cell, so no (query, neighbor) pair can appear twice. `bits = 0` (no
    * centroids) is the exact all-candidates scan (non-equi broadcast
    * join). */
  private def labelDisjointScored(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String,
      bits: Int, probeHamming: Int,
      centroids: Array[Array[Double]] = null, nprobe: Int = 2): DataFrame = {
    val c0 = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"), col(labelCol).as("nl"))
    val q0 = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"), col(labelCol).as("ql"))
    (if (centroids != null) {
      import graft.functions.VectorFunctions
      val c = c0.withColumn("cell", VectorFunctions.cellOf(col("cv"), centroids))
      val q = q0.withColumn("cell",
        explode(VectorFunctions.nearestCentroids(col("qv"), centroids, nprobe)))
      c.join(broadcast(q), "cell").filter(col("nl") =!= col("ql"))
    } else if (bits > 0) {
      val masks = (0 until (1 << bits))
        .filter(m => java.lang.Integer.bitCount(m) <= probeHamming)
      val c = c0.withColumn("cell", cell(col("cv"), bits))
      val q = q0.withColumn("cell",
        explode(array(masks.map(m => cell(col("qv"), bits).bitwiseXOR(lit(m))): _*)))
      c.join(broadcast(q), "cell").filter(col("nl") =!= col("ql"))
    } else {
      c0.join(broadcast(q0), col("nl") =!= col("ql"))
    }).withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
  }

  /** Contrastive-training hard-negative mining: for each query vector, the
    * top-k most-similar corpus vectors OUTSIDE the query's own label group
    * (same-label vectors are presumed positives — returning them would
    * poison the negative set). The exact shape of [[cosineTopK]] with a
    * label-disjointness predicate fused into the broadcast join: queries
    * broadcast, the corpus never shuffles, ties break on neighbor id, and
    * the 6-dp cosine rounding keeps the ranking engine-portable. The
    * default `bits = 0` is the documented-exact baseline tier (the q78
    * gate's contract); at 100 TB pass `bits > 0` for the same sign-bit
    * cell pruning [[marginMining]] defaults to — top-k by cosine among
    * other-label vectors IN THE PROBED NEIGHBORHOOD. */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      bits: Int = 0,
      probeHamming: Int = 1,
      centroids: Array[Array[Double]] = null,
      nprobe: Int = 2): DataFrame = {
    val scored = labelDisjointScored(corpus, queries, idCol, vecCol, labelCol,
      bits, probeHamming, centroids, nprobe)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cosine"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009 — the standard hybrid-
    * retrieval combiner: BM25 lexical + dense ANN rankings fused without
    * score calibration): fused score = Σ_systems 1/(rrfK + rank). Each
    * reciprocal rounds to integer NANO-units before the per-doc sum, so
    * the fusion is exact and engine-portable for ANY number of input
    * rankings (float fold order never enters). Inputs are (query_id,
    * doc_id, rank) frames — the shape [[graft.text.TextAnalysis.bm25TopK]]
    * and [[cosineTopK]] already emit; a doc absent from a system simply
    * contributes nothing (the RRF convention). The union carries only the
    * top-k'd candidate lists, so the fusion window is tiny per query. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      k: Int,
      rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val union = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = union
      .withColumn("__m",
        floor(lit(1e9) / (col("rank") + lit(rrfK)) + 0.5).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("__m") / 1e9, 9).as("rrf_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf_score"), col("rank"))
  }

  /** Coarse quantizer: sign bits of the first `bits` dimensions → cell id.
    * A data-independent stand-in for trained IVF centroids — the pipeline
    * shape (assign → co-partition → in-cell search) is identical. */
  def cell(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0, shiftleft(lit(1), i)).otherwise(lit(0))
    }.reduce(_ bitwiseOR _)

  /** Train IVF centroids with KMeans on a (sampled) corpus — the real
    * codebook path (FAISS IVF-flat analogue), replacing the data-independent
    * sign-bit quantizer when a training pass is affordable. Centroids are
    * tiny (nlist × dim doubles) and ride to executors as a codegen
    * reference object. */
  def trainCentroids(
      corpus: DataFrame,
      vecCol: String = "embedding",
      nlist: Int = 16,
      sampleFraction: Double = 1.0,
      seed: Long = 42L): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = if (sampleFraction < 1.0) corpus.sample(sampleFraction, seed) else corpus
    val feats = sampled.select(array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(feats)
    model.clusterCenters.map(_.toArray)
  }

  /** Deterministic data-sampled codebook: the embeddings of the `nlist`
    * lowest-id rows, verbatim (FAISS-style subset init without Lloyd
    * refinement). Unlike KMeans training the centroids are exact input
    * values, so the whole IVF pipeline — assignment, probing, in-cell
    * top-k — is bit-reproducible by an external engine, which is what the
    * driver's oracle gate checks end-to-end. */
  def sampleCentroids(
      corpus: DataFrame,
      nlist: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(asDouble(col(vecCol)).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)

  /** IVF top-k with a TRAINED codebook: corpus rows live in their nearest
    * cell; each query probes its `nprobe` nearest cells. The join compares
    * only in-cell candidates — comparisons drop ~nlist/nprobe-fold. */
  def ivfTopKTrained(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      centroids: Array[Array[Double]],
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", VectorFunctions.cellOf(col("cv"), centroids))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.nearestCentroids(col("qv"), centroids, nprobe)))
    val scored = c.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Materialize an IVF index as a graft table PARTITIONED BY cell, with the
    * codebook stored in the table properties: the index is a durable,
    * versioned artifact (time-travelable, vacuumable, clonable like any
    * table), and search I/O is bounded by partition pruning — each query
    * batch reads only its probed cells' files, which is what makes
    * ANN-over-100TB an O(probed cells) scan instead of an O(corpus) one. */
  def buildIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): graft.table.LakeTable = {
    import graft.functions.VectorFunctions
    val assigned = corpus
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", VectorFunctions.cellOf(col("v"), centroids))
    val t = graft.table.LakeTable.create(spark, dir, assigned.schema,
      partitionColumns = Seq("cell"),
      properties = Map("graft.ivf.centroids" -> encodeCentroids(centroids)),
      ifNotExists = false)
    t.append(assigned)
    t
  }

  /** Append new vectors to a persisted IVF index — the incremental-corpus
    * path: assign cells with the STORED codebook (the decode round-trips
    * bit-identically, so assignment matches the original build exactly) and
    * append into the cell-partitioned table. No rebuild, no retraining;
    * searches immediately see old + new vectors and partition pruning still
    * reads only probed cells' files. Centroid drift under a shifted
    * distribution degrades recall, not correctness — retrain + rebuild is
    * the maintenance valve, same trade as FAISS's add-after-train. */
  def appendToIvfIndex(
      index: graft.table.LakeTable,
      corpus: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    import graft.functions.VectorFunctions
    val centroids = storedCentroids(index)
    val assigned = corpus
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", VectorFunctions.cellOf(col("v"), centroids))
    index.append(assigned)
  }

  /** Search a [[buildIvfIndex]] table: the probed-cell set (nprobe cells per
    * query, deduplicated) is computed driver-side from the query batch, and
    * the index scan filters on it — partition pruning keeps unprobed cells'
    * files unread. Scoring joins only in-cell candidates, as [[ivfTopKTrained]]. */
  def searchIvfIndex(
      index: graft.table.LakeTable,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions
    val centroids = decodeCentroids(index.properties("graft.ivf.centroids"))
    // No persist: the assignment pipeline feeds both the driver-side
    // probed-cell collect and the broadcast join side, so the
    // O(|queries| x nlist) distance pass runs twice — but the query batch
    // is broadcast-sized by contract, and a persist with no unpersist pins
    // cached partitions in the block manager for the session's lifetime
    // (a retrieval service calling this per request accumulates them
    // unboundedly — the same leak class fixed in bm25SearchIndex).
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.nearestCentroids(col("qv"), centroids, nprobe)))
    val cells = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val c = index.toDf.filter(col("cell").isin(cells: _*))
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("cell"))
    val scored = c.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"), col("cosine"))
  }

  /** The codebook persisted in a [[buildIvfIndex]] table's properties —
    * reload instead of retraining (the decode round-trips bit-identically,
    * so cell assignment matches the build exactly). */
  def storedCentroids(index: graft.table.LakeTable): Array[Array[Double]] =
    decodeCentroids(index.properties("graft.ivf.centroids"))

  /** Codebook ⇄ property string. Double.toString/parseDouble round-trips
    * exactly, so a reloaded index assigns cells bit-identically. */
  private[similarity] def encodeCentroids(cs: Array[Array[Double]]): String =
    cs.map(_.mkString(",")).mkString(";")
  private[similarity] def decodeCentroids(s: String): Array[Array[Double]] =
    s.split(';').map(_.split(',').map(java.lang.Double.parseDouble))

  /** IVF-style top-k: candidates sharing one of the query's probed cells are
    * scored. `probeHamming` multi-probes every cell within that sign-bit
    * hamming distance of the query's own cell (h=0: 1 cell, h=1: bits+1
    * cells, ...) — the standard multi-probe LSH recall/comparisons dial;
    * comparisons still drop ~2^bits/(probed cells)-fold vs brute force. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      bits: Int = 4,
      probeHamming: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", cell(col("cv"), bits))
    val masks = (0 until (1 << bits))
      .filter(m => java.lang.Integer.bitCount(m) <= probeHamming)
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(array(masks.map(m => cell(col("qv"), bits).bitwiseXOR(lit(m))): _*)))
    val scored = c.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("qv"), col("cv")), 6))
    // probed cells are distinct and each corpus vector lives in exactly one
    // cell, so no (query, neighbor) pair can appear twice — no dedup needed
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"), col("neighbor_id"), col("cosine"))
  }
}

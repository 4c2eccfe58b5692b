package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic, engine-portable sampling and splitting for training-data
  * pipelines. Assignment is a pure function of the row key (md5 of
  * key:salt), so splits are reproducible across runs, engines, cluster
  * sizes, and partitionings — the property that matters when a train/test
  * split must stay stable for the lifetime of a model line. Narrow
  * projections only: no shuffle, no state, trivially parallel at any scale.
  */
object Sampling {

  /** First 4 hex chars of md5(key:salt) — 16 bits of deterministic,
    * key-derived randomness, compared as hex strings (identical semantics
    * in any engine with md5). */
  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 4)

  /** Threshold hex string t such that P(bucket < t) ≈ fraction. Clamped to
    * "ffff": rounding a fraction ≥ ~0.99999 to 65536 would print 5 hex
    * chars, which a 4-char bucket compares AGAINST lexicographically
    * ("ffff" > "10000") and near-everything would be dropped. */
  private def threshold(fraction: Double): String =
    f"${math.min(math.round(fraction * 65536).toInt, 65535)}%04x"

  /** Tag every row with a stable "train"/"test" split.
    * Within any stratum the split is ~`trainFraction` because the hash is
    * independent of all attributes — stratification comes free. */
  def trainTestSplit(
      df: DataFrame,
      keyCol: String,
      trainFraction: Double = 0.9,
      salt: String = "graft"): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, s"bad fraction $trainFraction")
    df.withColumn("split",
      when(bucket(col(keyCol), salt) < lit(threshold(trainFraction)), "train")
        .otherwise("test"))
  }

  /** EXACT stratified split: within every stratum, exactly
    * floor(trainFraction · n) rows land in "train" — the md5-lowest keys,
    * the same key-derived determinism as [[trainTestSplit]]. The hash
    * split hits its fraction only in EXPECTATION, which is fine for large
    * strata and wrong for small ones (a 10-row language can easily come
    * out 4/10 instead of 8/10); evaluation sets and per-domain ablations
    * need the exact guarantee. Cost: one per-stratum window on the group
    * exchange (the hash split is a narrow projection — use it when strata
    * are large and the shuffle matters). floor(n · fraction) is an IEEE
    * multiply + floor — engine-portable with no epsilon. */
  def stratifiedSplit(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      trainFraction: Double = 0.9,
      salt: String = "graft"): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1, s"bad fraction $trainFraction")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(":" + salt))), col(keyCol))
    df.withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .withColumn("split",
        when(col("__r") <= floor(col("__n") * trainFraction), "train")
          .otherwise("test"))
      .drop("__r", "__n")
  }

  /** Keep a stable ~`fraction` of rows, chosen by key hash — the
    * deterministic counterpart of df.sample (which depends on partitioning
    * and seed plumbing). */
  def deterministicSample(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      salt: String = "graft"): DataFrame =
    df.filter(bucket(col(keyCol), salt) < lit(threshold(fraction)))

  /** Domain-mixture downsampling: keep a per-group fraction of rows
    * (e.g. web 30%, books 90%) with the same key-hash determinism as
    * [[deterministicSample]]. Rates compile to a when-chain over the group
    * column — a codegen'd narrow projection, no shuffle and no join; at
    * hundreds of groups the chain is still cheap (one string compare per
    * group), beyond that a broadcast join against a rates table is the
    * same semantics. Rates must be in [0, 1); use [[upsample]] for >1×. */
  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0 && r < 1, s"rate $r outside [0,1) — use upsample for >=1x"))
    val thr = rates.foldLeft(lit(threshold(defaultRate))) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(threshold(r))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), salt) < thr)
  }

  /** Token-budget mixture (the Dolma/Pile-style recipe step): greedily
    * downsample each domain to a TOKEN budget rather than a row rate.
    * Docs are ordered by a stable md5 of the key (a uniform, engine-
    * portable subset — re-running with a bigger budget extends the same
    * prefix), and a doc is admitted while the domain's running token sum
    * before it is under budget, so each domain lands within one document
    * of its budget. One shuffle on the domain column; the window's
    * running sum is a single pass per partition. Skewed domain sizes
    * bound the partition at that domain's corpus share — for a truly
    * monster domain, pre-filter with [[mixtureSample]] first. */
  def budgetedMixture(
      df: DataFrame,
      tokenCol: Column,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      keyCol: String = "doc_id",
      groupCol: String = "source",
      salt: String = "graft-mix"): DataFrame = {
    // explicit ROWS frame: the default RANGE frame sums duplicate order
    // values as peers, which would overshoot the within-one-doc budget
    // bound when keyCol is not unique (identical results for unique keys)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(":" + salt))), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    df.withColumn("token_count", tokenCol.cast("long"))
      .withColumn("cum_tokens", sum(col("token_count")).over(w))
      .filter(col("cum_tokens") - col("token_count") < budget)
  }

  /** Temperature-weighted (alpha) mixture sampling — the multilingual /
    * multi-source rebalancing rule (the mT5/XLM-R recipe, p_i ∝ n_i^alpha):
    * source i receives quota_i = floor(budget · n_i^alpha / Σ_j n_j^alpha)
    * documents, and fills it with its quota_i lowest-md5 docs (stable,
    * engine-portable — rerunning with a bigger budget extends each
    * source's same prefix). alpha < 1 flattens the distribution toward
    * the tail sources; alpha = 1 is proportional sampling; alpha = 0 is
    * uniform-per-source.
    *
    * NULL source keys form one group of their own (SQL GROUP BY
    * semantics) and compete for quota like any other source; an empty
    * input returns empty. (Contrast [[mixtureSample]]/[[budgetedMixture]],
    * where rates come from a caller Map that cannot carry a NULL key — a
    * NULL group there falls to the default rate/budget by design.)
    *
    * Scale shape: one tiny count aggregate (|sources| rows, collected —
    * source cardinality is bounded in any curation recipe), then one
    * per-source md5-rank window — a single shuffle on the source column,
    * and the rank order is content-independent so the sort never skews on
    * document size. The epsilon inside floor() absorbs cross-engine
    * floating summation-order differences (≤ ulps) so the quota boundary
    * is engine-stable. */
  def alphaMixture(
      df: DataFrame,
      budget: Long,
      alpha: Double,
      keyCol: String = "doc_id",
      groupCol: String = "source",
      salt: String = "graft-alpha"): DataFrame = {
    require(alpha >= 0, s"bad alpha $alpha")
    require(budget >= 0, s"bad budget $budget")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
      .sortBy(_._1) // defined summation order (None — the NULL group — first)
    val totalW = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val quotas = counts.map { case (g, n) =>
      g -> math.floor(budget * math.pow(n.toDouble, alpha) / totalW + 1e-6).toLong
    }
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (g, q)) =>
      // NULL keys can't equi-match (=== NULL is NULL) — test isNull instead
      when(g.fold(col(groupCol).isNull)(col(groupCol) === _), lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(":" + salt))), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= quota)
  }

  /** Deterministic upsampling to an arbitrary weight w >= 0: every row is
    * emitted floor(w) times, plus once more for the stable key-hash
    * fraction frac(w) of keys. Copies are tagged `copyCol` (0-based) so
    * downstream shuffling can decorrelate them. explode(sequence(...)) is
    * a narrow rowwise op — no shuffle, no driver loop, safe at any scale. */
  def upsample(
      df: DataFrame,
      keyCol: String,
      weight: Double,
      copyCol: String = "copy_idx",
      salt: String = "graft"): DataFrame = {
    require(weight >= 0, s"bad weight $weight")
    val whole = math.floor(weight).toInt
    val frac = weight - whole
    val copies = lit(whole) +
      when(bucket(col(keyCol), salt) < lit(threshold(frac)), 1).otherwise(0)
    // sequence(0, -1) steps DOWNWARD ([0, -1]) — zero copies must be an
    // explicit empty array, which explode then drops
    df.withColumn(copyCol,
      explode(when(copies > 0, sequence(lit(0), copies - 1))
        .otherwise(array().cast("array<int>"))))
  }

  /** Pack rows into fixed-budget bins (training-sequence packing): within
    * each shard (ordered by `orderCol`), a row's pack is
    * floor(exclusive-prefix-sum(size) / budget) — the deterministic
    * "concatenate in order, cut every `budget` tokens" layout every engine
    * reproduces bit-exactly. Adds `pack_id` (global: shard-hash-salted) and
    * `pack_pos` (row's index within its pack).
    *
    * Scale shape: one shuffle on the shard key, then a single
    * running-sum window per shard — no global sort. Shards (source,
    * date, ...) bound each window partition; a skewed shard bounds the
    * window's partition size, so pick shard granularity accordingly. */
  def packSequences(
      df: DataFrame,
      orderCol: String,
      sizeCol: String,
      shardCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"bad budget $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    val cumBefore = coalesce(
      sum(col(sizeCol)).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val withPack = df
      .withColumn("pack_id",
        concat(col(shardCol), lit("#"), floor(cumBefore / budget).cast("string")))
    // partitioning by (shard, pack_id) is semantically identical (pack_id
    // is shard-prefixed) and is satisfied by the existing shard hash
    // partitioning, so this second window reuses the first one's exchange —
    // bare partitionBy(pack_id) would force a second full shuffle
    val wp = Window.partitionBy(col(shardCol), col("pack_id")).orderBy(orderCol)
    withPack.withColumn("pack_pos", (row_number().over(wp) - 1).cast("int"))
  }

  /** Deterministic training-order shuffle + sharding: every row gets a
    * stable pseudo-random `shard` in [0, numShards) and a `shard_pos`
    * (its index inside the shard in hash order) — the "globally shuffle
    * the corpus, then split into N training shards" step, reproducible
    * across engines and runs (change `salt` for a fresh permutation;
    * the permutation is key-stable, so re-runs over a grown corpus keep
    * prior rows' relative order).
    *
    * The shard id derives from the first 16 bits of md5(key:salt) through
    * instr/substr arithmetic only — portable to any SQL engine, so the
    * assignment itself is oracle-checkable. Scale shape: one shuffle on
    * the shard key + a per-shard window; no global sort anywhere. Write
    * the result `partitionBy("shard")` for one-file-per-shard layouts. */
  def shardCorpus(
      df: DataFrame,
      numShards: Int,
      keyCol: String = "doc_id",
      salt: String = "graft-shard"): DataFrame = {
    require(numShards > 0, s"bad numShards $numShards")
    import org.apache.spark.sql.expressions.Window
    val withH = df.withColumn("__h",
      md5(concat(col(keyCol).cast("string"), lit(":" + salt))))
    val hex16 = (1 to 4).map(i =>
        expr(s"(instr('0123456789abcdef', substr(__h, $i, 1)) - 1)"))
      .zip(Seq(4096, 256, 16, 1))
      .map { case (d, w) => d * lit(w) }
      .reduce(_ + _)
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(keyCol))
    withH
      .withColumn("shard", pmod(hex16, lit(numShards)).cast("int"))
      .withColumn("shard_pos", (row_number().over(w) - 1).cast("long"))
      .drop("__h")
  }

  /** Curriculum sharding (training-order prep): [[shardCorpus]]'s stable
    * key-hash shard assignment plus an in-shard `curriculum_pos` ordered
    * by DESCENDING score (ties by key) — each shard is consumed
    * best-first, the easy→hard (or clean→noisy) ordering curriculum
    * training wants, WITHOUT a global sort anywhere: assignment is
    * score-blind, so every shard sees the same score distribution in
    * expectation, and the ordering is a per-shard window on the shuffle
    * the assignment already paid for. */
  def curriculumShards(
      df: DataFrame,
      numShards: Int,
      scoreCol: Column,
      keyCol: String = "doc_id",
      salt: String = "graft-shard"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = shardCorpus(df, numShards, keyCol, salt)
      .withColumn("__score", scoreCol)
    val w = Window.partitionBy("shard").orderBy(col("__score").desc, col(keyCol))
    sharded
      .withColumn("curriculum_pos", (row_number().over(w) - 1).cast("long"))
      .drop("shard_pos")
      .withColumnRenamed("__score", "score")
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every corpus doc
    * by how much more likely its hashed-unigram bag is under the TARGET
    * distribution than under the raw-corpus distribution — log q(doc) −
    * log p(doc) over hashed n-gram features — and keep the top `budget`.
    *
    * Engine-portable and scale-correct by construction:
    *  - features are md5-hashed token buckets (two hex chars → 256
    *    buckets), the same cross-engine determinism the split/sample
    *    family uses;
    *  - the two bucket distributions are K-row aggregates (partial-agged
    *    shuffles of ints; the K-row collect is a constant, never
    *    data-sized);
    *  - per-bucket smoothed log ratios ship to executors as a LITERAL
    *    array in integer MICRO-units (1e-6), so per-doc scoring is a
    *    narrow codegen projection with exact integer sums — no float
    *    accumulation-order dependence, and the corpus never shuffles;
    *  - selection is orderBy+limit (TakeOrderedAndProject: distributed
    *    per-partition top-k, no global sort), with the rank window only
    *    over the `budget` survivors.
    * Add-1 smoothing keeps never-seen buckets finite. The deterministic
    * top-k-by-weight variant of DSIR's Gumbel resampling — reproducible
    * across engines, which is what the oracle gate requires. */
  def dsirSelect(
      corpus: DataFrame,
      target: DataFrame,
      budget: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val top = dsirScored(corpus, target, textCol)
      .orderBy(col("score").desc, col(idCol)).limit(budget)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol))).cast("int"))
      .select(col(idCol), col("score"), col("rank"))
  }

  /** DSIR's actual sampler — GUMBEL-TOP-K resampling: keep `budget` docs
    * sampled ∝ exp(score/temperature) WITHOUT replacement via the
    * Gumbel-max trick (rank by score/T + Gumbel(0,1) noise). The noise is
    * a pure function of md5(key:salt), so the "random" sample is
    * deterministic, engine-portable, and reproducible for the lifetime of
    * a model line — the same property as the split/sample family, and
    * what lets an external engine replay the draw exactly. T → 0 recovers
    * [[dsirSelect]]'s deterministic top-k; large T approaches uniform.
    * Same narrow-projection scoring, same distributed top-k selection. */
  def dsirResample(
      corpus: DataFrame,
      target: DataFrame,
      budget: Int,
      temperature: Double = 1.0,
      idCol: String = "doc_id",
      textCol: String = "text",
      salt: String = "graft-dsir"): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    // u in (0,1) from 32 key-derived md5 bits (the +0.5 keeps both
    // endpoints out, so -ln(-ln(u)) is always finite)
    val h = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")
    val u = (h.cast("double") + 0.5) / 4294967296.0
    val key = round(col("score") / temperature - log(-log(u)), 6)
    val top = dsirScored(corpus, target, textCol)
      .withColumn("gumbel_key", key)
      .orderBy(col("gumbel_key").desc, col(idCol)).limit(budget)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("gumbel_key").desc, col(idCol))).cast("int"))
      .select(col(idCol), col("score"), col("gumbel_key"), col("rank"))
  }

  /** Shared DSIR scorer: `corpus` + an exact 6-dp `score` column (see
    * [[dsirSelect]]'s scaladoc for the micro-unit construction). */
  private def dsirScored(
      corpus: DataFrame, target: DataFrame, textCol: String): DataFrame = {
    val buckets = 256
    def bucketOf(t: Column): Column =
      conv(substring(md5(t), 1, 2), 16, 10).cast("int")
    def dist(df: DataFrame): (Map[Int, Long], Long) = {
      val rows = df
        .select(explode(graft.text.TextAnalysis.tokens(col(textCol))).as("tok"))
        .groupBy(bucketOf(col("tok")).as("bucket")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (rows, rows.values.sum)
    }
    val (pc, pTotal) = dist(corpus)
    val (qc, qTotal) = dist(target)
    val micro: Seq[Long] = (0 until buckets).map { b =>
      val p = (pc.getOrElse(b, 0L) + 1).toDouble / (pTotal + buckets)
      val q = (qc.getOrElse(b, 0L) + 1).toDouble / (qTotal + buckets)
      math.round((math.log(q) - math.log(p)) * 1e6)
    }
    val ratioArr = array(micro.map(lit): _*)
    val scoreMicro = aggregate(
      transform(graft.text.TextAnalysis.tokens(col(textCol)),
        t => element_at(ratioArr, bucketOf(t) + 1)),
      lit(0L), (acc, x) => acc + x)
    corpus.withColumn("score", round(scoreMicro.cast("double") / 1e6, 6))
  }
}

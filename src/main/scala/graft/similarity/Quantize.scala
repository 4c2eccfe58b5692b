package graft.similarity

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Int8 scalar quantization for embedding columns — the storage lever for
  * a 100 TB embedding corpus: float32 → one byte per dimension (4×
  * smaller files, 4× less scan IO) at a bounded reconstruction error, the
  * standard trade in the FAISS/SCANN literature (SQ8).
  *
  * Per-vector affine quantization: `code_i = floor((x_i - lo) / (hi - lo)
  * * 255 + 0.5)` with `lo/hi` the vector's own min/max, so outliers in one
  * vector never degrade another. Everything is built-in higher-order
  * functions (codegen'd, no UDFs) and floor(+0.5) rather than round() so
  * the arithmetic replays bit-identically in any engine (round() ties
  * differ across SQL dialects).
  */
object Quantize {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Quantize `vecCol` (array of float/double) to int codes 0..255 plus the
    * per-vector `qmin`/`qmax` needed to dequantize. Constant vectors get
    * range 1.0 (all codes 0) instead of a division by zero.
    *
    * qmin/qmax materialize as columns BEFORE the codes transform: Catalyst
    * does not hoist loop-invariant subtrees out of HigherOrderFunction
    * lambdas (see Dedup.shingles), so an inline `array_min(v)` would
    * rescan the whole vector once per element — O(d²) per row. */
  def quantizeInt8(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val withStats = emb
      .withColumn("__v", asDouble(col(vecCol)))
      .withColumn("qmin", array_min(col("__v")))
      .withColumn("qmax", array_max(col("__v")))
    val rng = when(col("qmax") > col("qmin"), col("qmax") - col("qmin"))
      .otherwise(lit(1.0))
    withStats
      .withColumn("codes", transform(col("__v"),
        x => floor((x - col("qmin")) / rng * 255.0 + lit(0.5)).cast("int")))
      .drop("__v")
  }

  /** Reconstruct the (approximate) vector from codes + qmin/qmax. */
  def dequantize(codes: Column, qmin: Column, qmax: Column): Column = {
    val rng = when(qmax > qmin, qmax - qmin).otherwise(lit(1.0))
    transform(codes, c => qmin + c.cast("double") / 255.0 * rng)
  }

  /** Per-vector max absolute reconstruction error — bounded by
    * (qmax - qmin) / 510 (half a quantization step). */
  def reconstructionError(vec: Column, codes: Column, qmin: Column, qmax: Column): Column =
    array_max(zip_with(asDouble(vec), dequantize(codes, qmin, qmax),
      (a, b) => abs(a - b)))

  // ------------------------------------------------ binary (sign-bit) codes

  /** Sign-bit binary quantization: 1 bit per dimension (`x >= 0`), packed
    * MSB-first into 64-dim words (`array<long>`) — 32× smaller than
    * float32, the coarsest storage tier in the quantization ladder
    * (float32 → SQ8 → PQ → binary). At 100 TB the binary codes for a
    * billion 1024-dim vectors fit in 128 GB: a full-corpus Hamming scan
    * becomes a single-machine-RAM-sized distributed pass, which is why
    * sign-Hamming is the standard coarse filter in front of an exact
    * rerank. Built-ins only (slice/aggregate fold), codegen'd. */
  def binaryCode(vec: Column): Column =
    transform(
      sequence(lit(0), floor((size(vec) - lit(1)) / lit(64)).cast("int")),
      w => aggregate(slice(vec, w * 64 + 1, lit(64)), lit(0L),
        (acc, x) => shiftleft(acc, 1)
          .bitwiseOR(when(x >= 0, lit(1L)).otherwise(lit(0L)))))

  /** Hamming distance between two packed codes: popcount of the per-word
    * XOR, summed. A trailing partial word compares equal-width prefixes
    * because [[binaryCode]] left-aligns consistently. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, h) => acc + h).cast("int")

  /** Top-k ANN via the binary tier: Hamming scan of the packed codes
    * (queries broadcast — the corpus never shuffles), keep `candidates`
    * per query, then exact-cosine rerank of ONLY those candidates and keep
    * `k`. The full-width float vectors are touched for |queries| ×
    * candidates rows, not the corpus — the 32× scan cut is structural.
    * Hamming ties cut deterministically on neighbor id so the
    * approximation itself replays in the oracle. */
  def hammingRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      candidates: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"),
      binaryCode(col(vecCol)).as("cb"))
    val q = queries.select(col(idCol).as("query_id"),
      binaryCode(col(vecCol)).as("qb"))
    val scanned = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("hamming", hamming(col("qb"), col("cb")))
      .select("query_id", "neighbor_id", "hamming")
    val hw = Window.partitionBy("query_id")
      .orderBy(col("hamming"), col("neighbor_id"))
    val cand = scanned.withColumn("__hrank", row_number().over(hw))
      .filter(col("__hrank") <= candidates)
    // rerank: only candidate pairs rejoin the float vectors
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val exact = cand
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosineSim(col("qv"), col("cv")), 6))
    val rw = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(rw).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("hamming"), col("cosine"))
  }
}

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
}

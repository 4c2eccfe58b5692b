package graft.similarity

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Product quantization (PQ) for embedding corpora — the compression that
  * makes 100 TB-scale ANN tractable: a D-dim float vector becomes `m`
  * small integer codes (one per subspace), so the search set shrinks
  * ~D*4/m-fold (64-dim float32 → 8 codes = 32× less scan IO than raw
  * vectors) and asymmetric-distance (ADC) scoring needs only code-indexed
  * lookups per candidate, never the original vector. The standard design
  * from the FAISS/IVF-PQ literature, composable with the IVF cell blocking
  * in [[Similarity]] (cells prune candidates, PQ compresses them).
  *
  * Codebooks here are data-sampled (the `k` lowest-id rows' subvectors,
  * FAISS-style subset init without Lloyd refinement) so the whole pipeline
  * — sub-assignment, codes, ADC scores — is bit-reproducible by an
  * external engine; every per-element reduction is a sequential
  * higher-order `aggregate` in ascending index order, which is the same
  * left-to-right double summation a SQL `list_dot_product` / explicit
  * `+`-chain performs, so oracle comparisons stay exact. No UDFs anywhere;
  * everything is codegen'd Catalyst HOFs over a broadcast literal codebook.
  */
object Pq {

  /** centroids(j)(c) = the subDim-dim centroid c of subspace j. */
  case class PqCodebook(m: Int, k: Int, subDim: Int,
      centroids: Array[Array[Array[Double]]])

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Deterministic sampled codebook: subvectors of the `k` lowest-id rows. */
  def sampleCodebook(
      corpus: DataFrame,
      m: Int = 8,
      k: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): PqCodebook = {
    val rows = corpus.orderBy(col(idCol)).limit(k)
      .select(asDouble(col(vecCol)).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(rows.length == k, s"corpus has fewer than $k rows")
    val d = rows.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    PqCodebook(m, k, sub,
      Array.tabulate(m)(j => rows.map(_.slice(j * sub, (j + 1) * sub))))
  }

  private def cbLit(cb: PqCodebook): Column =
    typedlit[Seq[Seq[Seq[Double]]]](
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)

  /** Squared L2 between subspace j of vector column `v` and centroid
    * `code` of subspace j — sequential sum in ascending dim order. */
  private def subDist(cb: PqCodebook, C: Column, v: Column, j: Column, code: Column): Column =
    aggregate(sequence(lit(0), lit(cb.subDim - 1)), lit(0.0), (a, i) => {
      val diff = element_at(v, j * lit(cb.subDim) + i + 1) -
        element_at(element_at(element_at(C, j + 1), code + 1), i + 1)
      a + diff * diff
    })

  /** Encode vectors to `pq_codes` (array of m ints in [0, k)): per
    * subspace, the nearest centroid by squared L2, ties to the lowest
    * index. A narrow projection — no shuffle, no UDF; the codebook rides
    * the plan as one literal. */
  def encode(
      emb: DataFrame,
      cb: PqCodebook,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val C = cbLit(cb)
    emb.withColumn("__v", asDouble(col(vecCol)))
      .withColumn("pq_codes",
        transform(sequence(lit(0), lit(cb.m - 1)), j => {
          val best = aggregate(
            sequence(lit(0), lit(cb.k - 1)),
            struct(lit(Double.MaxValue).as("d"), lit(-1).as("c")),
            (acc, c) => {
              val d = subDist(cb, C, col("__v"), j, c)
              when(d < acc.getField("d"), struct(d.as("d"), c.cast("int").as("c")))
                .otherwise(acc)
            })
          best.getField("c")
        }))
      .drop("__v")
  }

  /** Reconstruct the quantized approximation (centroid concatenation). */
  def decode(cb: PqCodebook, codes: Column): Column = {
    val C = cbLit(cb)
    flatten(transform(sequence(lit(0), lit(cb.m - 1)),
      j => element_at(element_at(C, j + 1), element_at(codes, j + 1) + 1)))
  }

  /** ADC top-k: each query scans the ENCODED corpus — per candidate, m
    * code-indexed sub-distance sums instead of a D-dim dot product, and
    * only (id, m codes) rides the scan. Queries broadcast (q ≪ n); rank
    * ties break on neighbor id. Compose with IVF cells to prune the scan
    * itself at corpus scale. */
  def adcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      cb: PqCodebook,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val C = cbLit(cb)
    val enc = encode(corpus, cb, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("pq_codes"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist",
        aggregate(sequence(lit(0), lit(cb.m - 1)), lit(0.0), (acc, j) =>
          acc + subDist(cb, C, col("qv"), j, element_at(col("pq_codes"), j + 1))))
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("adc_dist"), 6).as("adc_dist"))
  }

  /** IVF-PQ (the FAISS composition): IVF cells PRUNE — each query joins
    * only the `nprobe` cells nearest it — and PQ codes SCORE the
    * survivors via ADC, so at corpus scale the scan touches ~nprobe/nlist
    * of the codes table and none of the raw vectors. Results equal
    * [[adcTopK]] restricted to the probed cells. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      ivfCentroids: Array[Array[Double]],
      cb: PqCodebook,
      nprobe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorFunctions
    val C = cbLit(cb)
    val enc = encode(corpus, cb, idCol, vecCol)
      .withColumn("cell", VectorFunctions.cellOf(asDouble(col(vecCol)), ivfCentroids))
      .select(col(idCol).as("neighbor_id"), col("cell"), col("pq_codes"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("cell",
        explode(VectorFunctions.nearestCentroids(col("qv"), ivfCentroids, nprobe)))
    val scored = enc.join(broadcast(q), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc_dist",
        aggregate(sequence(lit(0), lit(cb.m - 1)), lit(0.0), (acc, j) =>
          acc + subDist(cb, C, col("qv"), j, element_at(col("pq_codes"), j + 1))))
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), round(col("adc_dist"), 6).as("adc_dist"))
  }
}

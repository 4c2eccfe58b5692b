package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Int8 scalar quantization: error bound, edge cases, and search recall on
  * the reconstructed vectors. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("reconstruction error is bounded by half a quantization step") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Quantize.quantizeInt8(emb)
    val bad = q.withColumn("err", Quantize.reconstructionError(
        col("embedding"), col("codes"), col("qmin"), col("qmax")))
      .withColumn("bound", (col("qmax") - col("qmin")) / 510.0 + lit(1e-12))
      .filter(col("err") > col("bound"))
    bad.count() shouldBe 0
    // codes stay in the int8-encodable range
    q.filter(exists(col("codes"), c => c < 0 || c > 255)).count() shouldBe 0
  }

  test("constant and single-element vectors quantize without dividing by zero") {
    val edge = Seq(
      (1L, Array(0.5f, 0.5f, 0.5f)), // constant: rng would be 0
      (2L, Array(7.25f)),            // single element
      (3L, Array(-1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(edge).orderBy("vec_id")
    val rows = q.select("codes").as[Seq[Int]].collect()
    rows(0) shouldBe Seq(0, 0, 0)
    rows(1) shouldBe Seq(0)
    rows(2) shouldBe Seq(0, 255)
    // dequantized constants come back exactly
    q.filter(col("vec_id") === 1)
      .select(Quantize.dequantize(col("codes"), col("qmin"), col("qmax")))
      .as[Seq[Double]].head() shouldBe Seq(0.5, 0.5, 0.5)
  }

  test("top-k search on dequantized vectors matches exact search") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Quantize.quantizeInt8(emb)
    val approxCorpus = q.select(col("vec_id"),
      Quantize.dequantize(col("codes"), col("qmin"), col("qmax")).as("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.cosineTopK(corpus, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = topk(emb)
    val approx = topk(approxCorpus)
    // int8 keeps ~2.4 decimal digits per dim: neighbor sets stay near-exact
    (exact & approx).size.toDouble / exact.size should be >= 0.9
  }
}

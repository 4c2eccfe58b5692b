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

  test("binary codes pack sign bits MSB-first; hamming counts sign flips") {
    // 65 dims: one full word + a 1-dim tail word
    def signs(v: Array[Float]): Seq[Boolean] = v.map(_ >= 0).toSeq
    val a = Array.tabulate(65)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(65)(i => if (i % 5 == 0) 1.0f else -0.5f)
    val df = Seq((1L, a), (2L, b)).toDF("vec_id", "embedding")
    val coded = df.select(col("vec_id"), Quantize.binaryCode(col("embedding")).as("bits"))
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    // reference pack: fold (acc << 1) | bit over each 64-dim chunk
    def pack(v: Array[Float]): Seq[Long] =
      signs(v).grouped(64).map(_.foldLeft(0L)((acc, s) =>
        (acc << 1) | (if (s) 1L else 0L))).toSeq
    coded(0)._2 shouldBe pack(a)
    coded(1)._2 shouldBe pack(b)
    // hamming == positions where signs differ
    val expected = signs(a).zip(signs(b)).count { case (x, y) => x != y }
    val h = df.filter(col("vec_id") === 1).crossJoin(
        df.filter(col("vec_id") === 2).select(col("embedding").as("e2")))
      .select(Quantize.hamming(
        Quantize.binaryCode(col("embedding")),
        Quantize.binaryCode(col("e2"))).as("h"))
      .as[Int].head()
    h shouldBe expected
  }

  test("hamming rerank: candidates are the hamming-closest, output is exact-cosine ranked") {
    val emb = Tables.embeddings(spark, sfDir)
    val res = Quantize.hammingRerankTopK(emb,
      emb.filter(col("vec_id") < 3), k = 5, candidates = 20)
    val rows = res.collect()
    rows.length shouldBe 3 * 5
    // per query: ranks are 1..5 and cosine is non-increasing with rank
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      sorted.map(_.getInt(1)).toSeq shouldBe (1 to 5)
      sorted.map(_.getDouble(4)).toSeq.sliding(2).foreach {
        case Seq(x, y) => x should be >= y
        case _ =>
      }
    }
    // candidates really were cut by hamming: every returned neighbor's
    // hamming is <= the 20th-smallest hamming for that query (brute check)
    val brute = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Quantize.hamming(Quantize.binaryCode(col("qv")),
          Quantize.binaryCode(col("cv"))).as("h"))
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.map(_._3).sorted.apply(19) }
    rows.foreach { r =>
      r.getInt(3) should be <= brute(r.getLong(0))
    }
  }
}

package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  private def lambdaCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def norm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))
    dot(a, b) / (norm(a) * norm(b))
  }

  test("native cosine expression is bit-identical to the lambda formulation") {
    import spark.implicits._
    val rnd = new Random(42)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val out = df.select(
      VectorFunctions.cosineSim(col("a"), col("b")).as("native"),
      lambdaCosine(col("a"), col("b")).as("lambda"))
    out.filter(col("native") =!= col("lambda")).count() shouldBe 0
    // sanity: self-similarity is 1
    df.select(VectorFunctions.cosineSim(col("a"), col("a")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-12).count() shouldBe 0
  }

  test("null inputs yield null; type mismatch fails analysis") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0, 0.0)), None: Option[Seq[Double]])).toDF("a", "b")
    df.select(VectorFunctions.cosineSim(col("a"), col("b")).as("s"))
      .collect().head.isNullAt(0) shouldBe true
    an[Exception] should be thrownBy
      Seq(("x", Seq(1.0))).toDF("a", "b")
        .select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
  }

  test("nearest-centroids assignment and probing") {
    import spark.implicits._
    val centroids = Array(
      Array(0.0, 0.0),
      Array(10.0, 0.0),
      Array(0.0, 10.0))
    val df = Seq(
      (1L, Seq(1.0, 1.0)),   // nearest: 0, then 2 or 1 (tie -> lower index 1)
      (2L, Seq(9.0, 1.0)),   // nearest: 1
      (3L, Seq(1.0, 9.0))    // nearest: 2
    ).toDF("id", "v")
    val assigned = df.select(col("id"),
      VectorFunctions.cellOf(col("v"), centroids).as("cell"),
      VectorFunctions.nearestCentroids(col("v"), centroids, 2).as("probes"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    assigned(1L)._1 shouldBe 0
    assigned(2L)._1 shouldBe 1
    assigned(3L)._1 shouldBe 2
    assigned(2L)._2.head shouldBe 1
    assigned(2L)._2.length shouldBe 2
    // probe list starts with the assignment cell for every row
    assigned.values.foreach { case (cell, probes) => probes.head shouldBe cell }
  }

  test("trained IVF top-k finds planted near-duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // three well-separated clusters + a planted near-dup pair
    def around(cx: Double, cy: Double) =
      Seq(cx + rnd.nextDouble() * 0.1, cy + rnd.nextDouble() * 0.1)
    val corpus = (1 to 30).map(i => (i.toLong, around(0, 0))) ++
      (31 to 60).map(i => (i.toLong, around(50, 0))) ++
      (61 to 90).map(i => (i.toLong, around(0, 50))) :+
      (999L, Seq(50.001, 0.002))
    val df = corpus.toDF("vec_id", "embedding")
    val centroids = graft.similarity.Similarity.trainCentroids(df, nlist = 3)
    val out = graft.similarity.Similarity.ivfTopKTrained(
      df, df.filter(col("vec_id") === 999L), k = 3, centroids, nprobe = 1)
      .collect()
    out.length shouldBe 3
    // all neighbors come from the (50,0) cluster
    out.map(_.getAs[Long]("neighbor_id")).foreach(n => n should (be >= 31L and be <= 60L))
  }

  test("expression participates in whole-stage codegen") {
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
      .select(VectorFunctions.cosineSim(col("a"), col("b")).as("s"))
    // the "*(1)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    plan should include("*(1) Project [cosinesimilarity")
    df.collect().length shouldBe 10
  }
}

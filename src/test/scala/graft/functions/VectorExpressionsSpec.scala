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

package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextAnalysis
import graft.transform.Silver

/** New-in-round-2 pipeline operators: deterministic splits/samples,
  * benchmark decontamination, PII redaction, currency conversion. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("trainTestSplit is deterministic, partition-independent, ~fraction") {
    val df = spark.range(10000).toDF("id")
    val s1 = Sampling.trainTestSplit(df, "id", 0.9)
    val s2 = Sampling.trainTestSplit(df.repartition(13), "id", 0.9)
    // same assignment regardless of partitioning / run
    s1.orderBy("id").collect() shouldBe s2.orderBy("id").sort("id").collect()
    val train = s1.filter(col("split") === "train").count()
    train.toDouble / 10000 shouldBe 0.9 +- 0.02
    // stratification for free: fraction holds within an arbitrary stratum
    val stratum = s1.filter(col("id") % 7 === 0)
    stratum.filter(col("split") === "train").count().toDouble /
      stratum.count() shouldBe 0.9 +- 0.04
  }

  test("deterministicSample keeps a stable subset") {
    val df = spark.range(5000).toDF("id")
    val a = Sampling.deterministicSample(df, "id", 0.25).as[Long].collect().sorted
    val b = Sampling.deterministicSample(df.repartition(7), "id", 0.25).as[Long].collect().sorted
    a shouldBe b
    a.length.toDouble / 5000 shouldBe 0.25 +- 0.03
  }

  test("containmentPairs finds planted contamination via inverted index") {
    val bench = Seq((1000L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // superset: containment 1.0
      (2L, "alpha beta gamma delta unrelated words here"),        // partial
      (3L, "totally different text with nothing shared at all")
    ).toDF("doc_id", "text")
    // bench has 6 shingles; doc1 contains all 6, doc2 contains 2 (0.333)
    val out = Dedup.containmentPairs(corpus, bench, minContainment = 0.3)
      .orderBy("train_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    out.head.getDouble(2) shouldBe 1.0
    out(1).getDouble(2) shouldBe 0.333333
  }

  test("redactPii removes planted PII and counts match") {
    val df = Seq(
      (1L, "mail me at a.b+c@test.org or 192.168.0.1 card 1234567812345678 ssn 123-45-6789"),
      (2L, "nothing sensitive here 123")
    ).toDF("id", "text")
    val red = df.select(col("id"), TextAnalysis.redactPii(col("text")).as("r"))
      .orderBy("id").as[(Long, String)].collect()
    red(0)._2 shouldBe "mail me at <EMAIL> or <IP> card <CARD> ssn <SSN>"
    red(1)._2 shouldBe "nothing sensitive here 123"
    val counts = TextAnalysis.piiCounts(col("text"))
      .foldLeft(df)((d, c) => d.withColumn(c._1, c._2))
    counts.filter(col("id") === 1).select("email_count", "ipv4_count", "ssn_count", "card_count")
      .as[(Long, Long, Long, Long)].head() shouldBe ((1L, 1L, 1L, 1L))
  }

  test("convertCurrency multiplies exactly and flags unknown currencies") {
    val df = Seq((1L, 100.50, "EUR"), (2L, 10.00, "USD"), (3L, 5.0, "XXX"))
      .toDF("id", "amount", "currency")
    val out = Silver.convertCurrency(df, "amount", "currency",
      Map("EUR" -> BigDecimal("1.10"), "GBP" -> BigDecimal("1.27")))
      .orderBy("id")
    val rows = out.select("amount_USD", "conversion_rate").collect()
    rows(0).getDecimal(0).toPlainString shouldBe "110.55"
    rows(1).getDecimal(0).toPlainString shouldBe "10.00"
    rows(2).isNullAt(0) shouldBe true
    rows(2).isNullAt(1) shouldBe true
  }
}

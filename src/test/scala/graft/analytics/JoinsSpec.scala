package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 1000 rows of one hot key + a tail
    val skewed = ((1 to 1000).map(i => (1L, s"v$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "payload")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")

    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    val salted = Joins.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    salted shouldBe plain

    val plainLeft = skewed.join(dim, Seq("k"), "left")
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    val saltedLeft = Joins.saltedJoin(skewed, dim, "k", salts = 8, joinType = "left")
      .select("k", "payload", "name").orderBy("k", "payload").collect()
    saltedLeft shouldBe plainLeft
  }

  test("salted distinct count equals exact countDistinct") {
    val df = ((1 to 500).map(i => (1L, s"u${i % 37}")) ++ (1 to 10).map(i => (2L, s"u$i")))
      .toDF("k", "user")
    val expected = df.groupBy("k").agg(count_distinct(col("user")).as("d"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Joins.saltedDistinctCount(df, "k", "user", salts = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    got shouldBe expected
  }
}

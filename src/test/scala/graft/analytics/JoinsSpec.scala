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

  test("topCustomers plans TakeOrderedAndProject + broadcast join-back") {
    val orders = (1 to 300).map { i =>
      (i.toLong, (i % 50).toLong, java.math.BigDecimal.valueOf((i % 97) * 10L))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = (0 until 50).map(i =>
      (i.toLong, s"Customer#$i", if (i % 2 == 0) "BUILDING" else "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_mktsegment")

    val top = Gold.topCustomers(orders, customer, n = 5)
    val plan = top.queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should include("BroadcastHashJoin")

    val rows = top.orderBy("rank").collect()
    rows.length shouldBe 5
    // ranks are 1..n and revenue is non-increasing
    rows.map(_.getAs[Int]("rank")).toSeq shouldBe (1 to 5)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    revs shouldBe revs.sorted.reverse
    // matches a straight groupBy+sort oracle on the same data
    val expected = orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("rev"))
      .orderBy(col("rev").desc, col("o_custkey").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    rows.map(_.getAs[Long]("custkey")).toSeq shouldBe expected
  }

  test("asOfJoin matches the naive range-join argmax on random series") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
      .toDF("l_id", "k", "lt")
    val right = (1 to 200).map(i =>
      (s"k${rnd.nextInt(15)}", rnd.nextInt(1000).toLong, i.toLong, rnd.nextDouble()))
      .distinct.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      .toDF("k", "rt", "r_id", "price") // one row per (k, rt): deterministic
    val got = Joins.asOfJoin(left, right, Seq("k"), "lt", "rt")
      .select("l_id", "r_id", "price")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    // naive oracle: range join then keep the max-rt match per left row
    // (condition inside the join so no-match left rows keep a null payload)
    val naive = left.as("L").join(right.as("R"),
      col("L.k") === col("R.k") && col("R.rt") <= col("L.lt"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_id").orderBy(col("rt").desc_nulls_last)
    val want = naive.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("l_id", "r_id", "price")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    got shouldBe want
    got.size shouldBe 300 // exactly one output row per left row
    // exact-time matches count (backward, inclusive)
    val l1 = Seq((1L, "a", 100L)).toDF("l_id", "k", "lt")
    val r1 = Seq(("a", 100L, 9L, 1.5)).toDF("k", "rt", "r_id", "price")
    Joins.asOfJoin(l1, r1, Seq("k"), "lt", "rt")
      .select("r_id").collect().head.getLong(0) shouldBe 9L
  }

  test("asOfJoin composes multi-column keys") {
    val left = Seq(
      (1L, "a", "x", 100L), (2L, "a", "y", 100L), (3L, "b", "x", 100L))
      .toDF("l_id", "k1", "k2", "lt")
    val right = Seq(
      ("a", "x", 90L, 11L), ("a", "y", 95L, 12L), ("b", "x", 101L, 13L))
      .toDF("k1", "k2", "rt", "r_id")
    val got = Joins.asOfJoin(left, right, Seq("k1", "k2"), "lt", "rt")
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toSet
    // (b, x)'s only right row is in the future -> null match
    got shouldBe Set((1L, Some(11L)), (2L, Some(12L)), (3L, None))
  }

  test("rangeJoin with an equi key only pairs within the key") {
    val points = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("p_id", "g", "x")
    val intervals = Seq(("a", 0L, 20L, 7L), ("b", 15L, 20L, 8L))
      .toDF("g", "s", "e", "i_id")
    val got = Joins.rangeJoin(points, intervals, "x", "s", "e",
        binWidth = 8, keys = Seq("g"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    // point 2 is inside a's interval range but in group b -> no pair
    got shouldBe Set((1L, 7L))
  }

  test("rangeJoin matches the naive containment join, as an equi-join plan") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 400).map(i => (i.toLong, rnd.nextInt(500).toLong))
      .toDF("p_id", "x")
    // deliberately overlapping intervals, lengths 0..60 straddling bins
    val intervals = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, s, s + rnd.nextInt(60))
    }.toDF("i_id", "s", "e")

    val joined = Joins.rangeJoin(points, intervals, "x", "s", "e", binWidth = 16)
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"

    val got = joined.select("p_id", "i_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.as("P").join(intervals.as("I"),
        col("P.x") >= col("I.s") && col("P.x") <= col("I.e"))
      .select("p_id", "i_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want
    want.size should be > 400 // overlap: multiple matches per point exist
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

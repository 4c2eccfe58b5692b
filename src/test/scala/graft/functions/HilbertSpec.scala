package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.log.Pruner
import graft.table.LakeTable

/** Hilbert curve kernel + expression + OPTIMIZE CLUSTER BY integration. */
class HilbertSpec extends SparkSpec {

  import spark.implicits._

  test("2-D curve is a bijection and every step moves one cell edge") {
    val bits = 5 // 32x32 grid, 1024 cells
    val side = 1 << bits
    val cells = for (x <- 0 until side; y <- 0 until side) yield (x.toLong, y.toLong)
    val idx = cells.map { case (x, y) => HilbertCurve.index(Array(x, y), bits) }
    idx.sorted shouldBe (0L until (side.toLong * side)).toVector
    // defining property: consecutive curve positions are ADJACENT cells
    val byIdx = idx.zip(cells).sortBy(_._1).map(_._2)
    byIdx.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1L
    }
  }

  test("3-D curve is a bijection with unit steps; inverse round-trips") {
    val bits = 3
    val side = 1 << bits
    val cells = for {
      x <- 0 until side; y <- 0 until side; z <- 0 until side
    } yield Array(x.toLong, y.toLong, z.toLong)
    val idx = cells.map(c => HilbertCurve.index(c.clone(), bits))
    idx.sorted shouldBe (0L until 512L).toVector
    val byIdx = idx.zip(cells).sortBy(_._1).map(_._2)
    byIdx.sliding(2).foreach { case Seq(a, b) =>
      a.zip(b).map { case (u, v) => math.abs(u - v) }.sum shouldBe 1L
    }
    // indexToCoords is the exact inverse
    cells.foreach { c =>
      val h = HilbertCurve.index(c.clone(), bits)
      HilbertCurve.indexToCoords(h, bits, 3).toSeq shouldBe c.toSeq
    }
  }

  test("1-D curve is the identity; 4-D stays a bijection") {
    (0L until 16L).foreach { v =>
      HilbertCurve.index(Array(v), 4) shouldBe v
    }
    val bits = 2
    val cells = for {
      a <- 0 until 4; b <- 0 until 4; c <- 0 until 4; d <- 0 until 4
    } yield Array(a.toLong, b.toLong, c.toLong, d.toLong)
    cells.map(c => HilbertCurve.index(c, bits)).sorted shouldBe (0L until 256L).toVector
  }

  test("expression: codegen and interpreted eval agree; nulls propagate") {
    val df = spark.range(0, 1000)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
    val hc = HilbertCurve.indexColumn(5, Seq(col("x"), col("y")))
    // codegen path (whole-stage over a projection)
    val fromDf = df.select(col("x"), col("y"), hc.as("h")).collect()
    fromDf.foreach { r =>
      r.getLong(2) shouldBe HilbertCurve.index(Array(r.getLong(0), r.getLong(1)), 5)
    }
    // null in any dimension -> null index
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS x, 3L AS y")
      .select(HilbertCurve.indexColumn(5, Seq(col("x"), col("y"))).as("h"))
    withNull.collect()(0).isNullAt(0) shouldBe true
  }

  test("OPTIMIZE CLUSTER BY tightens per-file ranges on BOTH dimensions") {
    val t = LakeTable.create(spark, tmpDir("hilb").resolve("t").toString,
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val n = 10000
    // interleaved appends: every file spans the full range of both cols
    (0 until 4).foreach { i =>
      t.append(Seq.tabulate(n / 4)(j => ((j * 4 + i).toLong, ((j * 7919) % n).toLong))
        .toDF("a", "b").coalesce(1))
    }
    val before = t.snapshot()
    Pruner.prune(before.files, Seq(col("a") < 100), before.schema).size shouldBe 4
    t.optimizeHilbert(Seq("a", "b"), targetFileSize = 6 * 1024)
    val after = t.snapshot()
    after.numFiles should be > 8
    // range predicates on EITHER column now skip most files
    val prunedA = Pruner.prune(after.files, Seq(col("a") < 100), after.schema)
    prunedA.size.toDouble should be < after.numFiles * 0.6
    val prunedB = Pruner.prune(after.files, Seq(col("b") < 100), after.schema)
    prunedB.size.toDouble should be < after.numFiles * 0.6
    // data-identical rewrite
    t.read().agg(sum("a"), sum("b")).head() shouldBe
      t.versionAsOf(before.version).agg(sum("a"), sum("b")).head()
    t.read().count() shouldBe n
    // history records the curve
    val params = t.history(Some(1)).select("operationParameters").collect()
      .head.getMap[String, String](0)
    params.get("curve") shouldBe Some("hilbert")
    params.get("clusterBy") shouldBe Some("a,b")
  }

  test("hilbert files are at least as tight as zorder on the same data") {
    // same layout question asked of both curves: files each cover a
    // contiguous curve span; measure the summed per-file bounding-box area
    // (smaller = tighter stats = more skippable)
    def boxArea(t: LakeTable): Double = t.snapshot().files.map { f =>
      def span(c: String): Double =
        f.stats.get(c).map(s => s.max.toDouble - s.min.toDouble + 1)
          .getOrElse(Double.MaxValue)
      span("a") * span("b")
    }.sum
    def build(name: String): LakeTable = {
      val t = LakeTable.create(spark, tmpDir(name).resolve("t").toString,
        StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
      val n = 1 << 14
      t.append(Seq.tabulate(n) { j =>
        val r = new scala.util.Random(j) // deterministic scatter
        (r.nextInt(1 << 10).toLong, r.nextInt(1 << 10).toLong)
      }.toDF("a", "b").coalesce(1))
      t
    }
    val hz = build("curve-h"); hz.optimizeHilbert(Seq("a", "b"), targetFileSize = 8 * 1024)
    val zz = build("curve-z"); zz.optimizeZOrder(Seq("a", "b"), targetFileSize = 8 * 1024)
    boxArea(hz) should be <= boxArea(zz) * 1.05 // parity or better, not worse
  }

  test("SQL form: OPTIMIZE ... CLUSTER BY routes to the hilbert rewrite") {
    val dir = tmpDir("hsql").resolve("t").toString
    val t = LakeTable.create(spark, dir,
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    t.append(Seq.tabulate(500)(j => (j.toLong, (j * 31 % 500).toLong)).toDF("a", "b"))
    val gs = graft.table.GraftSql(spark)
    gs.run(s"OPTIMIZE '$dir' CLUSTER BY (a, b)").collect()
    val params = t.history(Some(1)).select("operationParameters").collect()
      .head.getMap[String, String](0)
    params.get("curve") shouldBe Some("hilbert")
    t.read().count() shouldBe 500
  }
}

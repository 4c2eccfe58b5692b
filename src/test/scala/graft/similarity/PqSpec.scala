package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: dim 8, values vary per (id, dim)
  private def vec(id: Long, d: Int): Seq[Double] =
    (0 until d).map(i => math.sin(id * 31 + i * 7) * 10.0)

  private def corpus(n: Int, d: Int = 8) =
    (0L until n.toLong).map(i => (i, vec(i, d))).toDF("vec_id", "embedding")

  /** Plain-Scala PQ model mirroring the HOF arithmetic exactly:
    * sequential ascending-index double sums, strict < argmin. */
  private def modelCodes(v: Seq[Double], cb: Pq.PqCodebook): Seq[Int] =
    (0 until cb.m).map { j =>
      var bestD = Double.MaxValue; var bestC = -1
      for (c <- 0 until cb.k) {
        var d = 0.0
        for (i <- 0 until cb.subDim) {
          val diff = v(j * cb.subDim + i) - cb.centroids(j)(c)(i)
          d += diff * diff
        }
        if (d < bestD) { bestD = d; bestC = c }
      }
      bestC
    }

  private def modelAdc(q: Seq[Double], codes: Seq[Int], cb: Pq.PqCodebook): Double = {
    var acc = 0.0
    for (j <- 0 until cb.m) {
      var d = 0.0
      for (i <- 0 until cb.subDim) {
        val diff = q(j * cb.subDim + i) - cb.centroids(j)(codes(j))(i)
        d += diff * diff
      }
      acc += d
    }
    acc
  }

  test("sampled codebook slices the k lowest-id rows per subspace") {
    val cb = Pq.sampleCodebook(corpus(20), m = 2, k = 4)
    cb.subDim shouldBe 4
    cb.centroids(0)(1) shouldBe vec(1, 8).slice(0, 4).toArray
    cb.centroids(1)(3) shouldBe vec(3, 8).slice(4, 8).toArray
  }

  test("encode matches the plain-Scala model bit-for-bit") {
    val c = corpus(50)
    val cb = Pq.sampleCodebook(c, m = 2, k = 4)
    val got = Pq.encode(c, cb).select("vec_id", "pq_codes")
      .as[(Long, Seq[Int])].collect().toMap
    for (i <- 0L until 50L)
      got(i) shouldBe modelCodes(vec(i, 8), cb)
    got.values.flatten.foreach { code => code should (be >= 0 and be < 4) }
  }

  test("adc top-k matches the model's distances and ordering exactly") {
    val c = corpus(40)
    val cb = Pq.sampleCodebook(c, m = 2, k = 4)
    val got = Pq.adcTopK(c, c.filter(col("vec_id") < 3), k = 5, cb)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val codes = (0L until 40L).map(i => i -> modelCodes(vec(i, 8), cb)).toMap
    for (q <- 0L until 3L) {
      val want = (0L until 40L).filter(_ != q)
        .map(n => n -> modelAdc(vec(q, 8), codes(n), cb))
        .sortBy { case (n, d) => (d, n) }.take(5)
      want.zipWithIndex.foreach { case ((n, d), idx) =>
        val (gn, gd) = got((q, idx + 1))
        gn shouldBe n
        gd shouldBe (math.rint(d * 1e6) / 1e6 +- 1e-9)
      }
    }
  }

  test("decode reconstructs the concatenated centroids; codebook rows are fixed points") {
    val c = corpus(30)
    val cb = Pq.sampleCodebook(c, m = 2, k = 4)
    // a codebook row's subvectors ARE centroids -> distance 0 -> own index
    val enc = Pq.encode(c.filter(col("vec_id") < 4), cb)
    enc.select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().foreach {
      case (id, codes) => codes shouldBe Seq.fill(cb.m)(id.toInt)
    }
    val dec = enc.select(col("vec_id"), Pq.decode(cb, col("pq_codes")).as("rec"))
      .as[(Long, Seq[Double])].collect().toMap
    for (i <- 0L until 4L) dec(i) shouldBe vec(i, 8)
  }

  test("ivf-pq equals plain adc restricted to the probed cells") {
    val c = corpus(40)
    val cb = Pq.sampleCodebook(c, m = 2, k = 4)
    // IVF codebook: full vectors of rows 0..3 (sampled, like Similarity)
    val ivf = (0L until 4L).map(i => vec(i, 8).toArray).toArray
    val got = Pq.ivfPqTopK(c, c.filter(col("vec_id") < 3), k = 5, ivf, cb, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap
    // model: assign every row to its nearest IVF centroid, keep candidates
    // in the query's 2 nearest cells, ADC-rank them
    def cellDists(v: Seq[Double]): Seq[(Int, Double)] =
      ivf.indices.map { ci =>
        var d = 0.0
        for (i <- 0 until 8) { val t = v(i) - ivf(ci)(i); d += t * t }
        (ci, d)
      }
    def cellOf(v: Seq[Double]): Int = cellDists(v).minBy { case (ci, d) => (d, ci) }._1
    val codes = (0L until 40L).map(i => i -> modelCodes(vec(i, 8), cb)).toMap
    val cells = (0L until 40L).map(i => i -> cellOf(vec(i, 8))).toMap
    for (q <- 0L until 3L) {
      val probed = cellDists(vec(q, 8)).sortBy { case (ci, d) => (d, ci) }
        .take(2).map(_._1).toSet
      val want = (0L until 40L)
        .filter(n => n != q && probed.contains(cells(n)))
        .map(n => n -> modelAdc(vec(q, 8), codes(n), cb))
        .sortBy { case (n, d) => (d, n) }.take(5)
      got(q).map(_._1) shouldBe want.map(_._1)
      got(q).map(_._2).zip(want.map(w => math.rint(w._2 * 1e6) / 1e6)).foreach {
        case (g, w) => g shouldBe (w +- 1e-9)
      }
    }
  }

  test("compression: m codes per vector regardless of dimension") {
    val cb = Pq.sampleCodebook(corpus(20), m = 4, k = 8)
    Pq.encode(corpus(20), cb)
      .select(org.apache.spark.sql.functions.size(col("pq_codes")))
      .as[Int].collect().toSet shouldBe Set(4)
  }
}

package graft.dedup

import scala.util.Random

import graft.SparkSpec
import graft.text.TextAnalysis

/** Differential fuzz for the round-4 corpus operators: random corpora
  * (empty docs, whitespace runs, engineered duplicate spans, skewed token
  * distributions) checked row-for-row against independent plain-Scala
  * models of the same semantics. */
class TextOpsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    Vector("a", "b", "c", "dd", "eee", "ffff", "x1", "y2", "zz9", "wavy")

  private def randomCorpus(rnd: Random, n: Int): Seq[(Long, String)] = {
    // a shared phrase engineered to recur across docs (duplicate spans)
    val phrase = Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
    (0L until n.toLong).map { id =>
      val len = rnd.nextInt(40)
      val base = Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
      val text = rnd.nextInt(4) match {
        case 0 => ""                                  // empty
        case 1 => s"  $phrase  $base "                // shared span + padding
        case 2 => s"$base $phrase"
        case _ => base
      }
      (id, text)
    }
  }

  private def toks(text: String): Seq[String] = {
    val t = text.trim
    if (t.isEmpty) Seq.empty else t.split("\\s+").toSeq
  }

  test("dedupSegments matches a plain-Scala model on random corpora") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed * 7919)
      val corpus = randomCorpus(rnd, 60)
      val w = 3 + rnd.nextInt(8)
      // model: segment every doc, first (doc, idx) occurrence per segment
      // text wins, rebuild kept segments in order
      val segs = corpus.flatMap { case (id, text) =>
        toks(text).grouped(w).zipWithIndex.map { case (seg, i) =>
          (id, i, seg.mkString(" ")) }
      }
      val firstOf = segs.groupBy(_._3).map { case (s, occ) =>
        s -> occ.map(o => (o._1, o._2)).min }
      val counts = segs.groupBy(_._3).map { case (s, occ) => s -> occ.size }
      val expected = corpus.map { case (id, text) =>
        val mine = segs.filter(_._1 == id)
        val kept = mine.filter { case (i2, idx, s) =>
          counts(s) == 1 || firstOf(s) == ((i2, idx)) }
        id -> ((kept.map(_._3).mkString(" "), mine.size.toLong,
          (mine.size - kept.size).toLong))
      }.toMap
      val got = Dedup.dedupSegments(
          corpus.toDF("doc_id", "text"), window = w)
        .collect().map(r =>
          r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      got.keySet shouldBe expected.keySet
      got.keySet.foreach { id =>
        withClue(s"seed=$seed window=$w doc=$id: ") {
          got(id) shouldBe expected(id) }
      }
    }
  }

  test("perplexity matches a plain-Scala add-one bigram model on random corpora") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed * 104729)
      val corpus = randomCorpus(rnd, 50)
      val docPairs = corpus.map { case (id, text) =>
        id -> toks(text).sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq }
      val pairCounts = docPairs.flatMap(_._2).groupBy(identity).map {
        case (p, occ) => p -> occ.size.toLong }
      val headTotals = pairCounts.groupBy(_._1._1).map {
        case (h, m) => h -> m.values.sum }
      val vocab = corpus.flatMap(c => toks(c._2)).distinct.size.toLong
      def lp(p: (String, String)): Long =
        BigDecimal(math.log((pairCounts(p) + 1).toDouble /
            (headTotals(p._1) + vocab).toDouble) * 1e9)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val expected = docPairs.map { case (id, ps) =>
        if (ps.isEmpty) id -> ((0L, 0L, None: Option[Double]))
        else {
          val slp = ps.map(lp).sum
          val ppl = math.rint(math.exp(-slp.toDouble / (ps.size * 1e9)) * 1e4) / 1e4
          id -> ((ps.size.toLong, -slp, Some(ppl)))
        }
      }.toMap
      val got = TextAnalysis.perplexity(corpus.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
        .toMap
      got.keySet shouldBe expected.keySet
      got.keySet.foreach { id =>
        withClue(s"seed=$seed doc=$id: ") { got(id) shouldBe expected(id) }
      }
    }
  }

  test("chunkDocs matches a plain-Scala model and loses no text") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val corpus = randomCorpus(rnd, 60) :+ (999L -> "short")
      val (chunk, overlap) = (20 + rnd.nextInt(30), rnd.nextInt(10))
      val stride = chunk - overlap
      def model(text: String): Seq[(Int, Long, String)] = {
        val n = math.max(1,
          math.ceil((text.length - overlap).toDouble / stride).toInt)
        (0 until n).map { i =>
          (i, (i.toLong * stride),
            text.slice(i * stride, math.min(i * stride + chunk, text.length)))
        }
      }
      val got = TextAnalysis.chunkDocs(
          corpus.toDF("doc_id", "text"), chunk, overlap)
        .select("doc_id", "chunk_id", "chunk_start", "chunk_text")
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getString(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      corpus.foreach { case (id, text) =>
        withClue(s"seed=$seed doc=$id: ") {
          got(id) shouldBe model(text)
          // overlap-aware reconstruction: first chunk whole, then each
          // chunk minus its leading overlap — no character lost or invented
          val rebuilt = got(id).head._3 +
            got(id).tail.map(_._3.drop(overlap)).mkString
          rebuilt shouldBe text
        }
      }
    }
  }
}

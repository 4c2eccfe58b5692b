package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.log.BloomFilter

/** Per-file bloom-filter indexes: equality file skipping where min/max
  * stats are useless (high-cardinality keys in arrival order span the full
  * key range in every file). */
class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private def freshBloomTable(name: String, nFiles: Int = 8, rowsPerFile: Int = 5000) = {
    val dir = tmpDir(name).resolve("t").toString
    // id is round-robin across files: every file's [min,max] covers ~the
    // whole id domain, so range stats can never prune a point lookup
    val df = spark.range(nFiles.toLong * rowsPerFile)
      .withColumn("uid", concat(lit("u_"), col("id")))
      .withColumn("payload", col("id") % 97)
      .repartition(nFiles, col("id"))
    val t = LakeTable.create(spark, dir, df.schema)
    t.setProperties(Map("graft.bloomFilter.columns" -> "uid,id"))
    t.append(df)
    t
  }

  test("point lookups prune to ~one file; results stay exact") {
    val t = freshBloomTable("bloom-basic")
    val snap = t.snapshot()
    snap.numFiles should be >= 8
    // every file carries bloom refs for both columns
    all(snap.files.map(f => Option(f.bloom).fold(0)(_.size))) shouldBe 2

    // min/max alone cannot prune: every file spans ~the full id range
    val noBloooms = snap.files.map(_.copy(bloom = null))
    graft.log.Pruner.prune(noBloooms, Seq(col("uid") === "u_12345"),
      snap.schema).size shouldBe snap.numFiles

    // bloom pruning: the explicit-filters read path
    val pruned = graft.log.Pruner.prune(snap.files, Seq(col("uid") === "u_12345"),
      snap.schema, t.bloomIndex)
    pruned.size should be < snap.numFiles / 2
    // and the row actually comes back (through the same pruned path)
    val got = t.read(Seq(col("uid") === "u_12345"))
    got.count() shouldBe 1
    got.select("id").as[Long].head() shouldBe 12345L

    // absent key: typically zero files survive (fpp 1% over 8 files)
    val miss = graft.log.Pruner.prune(snap.files,
      Seq(col("uid") === "u_99999999"), snap.schema, t.bloomIndex)
    miss.size should be <= 1
    t.read(Seq(col("uid") === "u_99999999")).count() shouldBe 0

    // IN lists prune to the union of member files
    val inPruned = graft.log.Pruner.prune(snap.files,
      Seq(col("id").isin(7L, 11L)), snap.schema, t.bloomIndex)
    inPruned.size should be < snap.numFiles
    t.read(Seq(col("id").isin(7L, 11L))).count() shouldBe 2
  }

  test("Catalyst scan path (toDf/SQL) skips files via bloom") {
    val t = freshBloomTable("bloom-scan")
    val total = t.snapshot().numFiles
    val df = t.scan().filter(col("uid") === "u_777")
    df.collect().length shouldBe 1 // metrics populate on execution
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    scanned should be < total.toLong / 2
  }

  test("DML point lookups touch only bloom-surviving files") {
    val t = freshBloomTable("bloom-dml", nFiles = 8)
    val before = t.snapshot().numFiles
    t.update(col("uid") === "u_4242", Map("payload" -> lit(-1L)))
    // a rewrite of every candidate file would have replaced all 8
    val history = t.history(Some(1)).select("operationMetrics")
      .collect().head.getMap[String, String](0)
    history("numRemovedFiles").toInt should be <= 2
    before should be >= 8
    t.read().filter(col("payload") === -1L).count() shouldBe 1
    t.read().count() shouldBe 40000L
  }

  test("cross-type literals bloom-prune via the cast path") {
    val t = freshBloomTable("bloom-cast")
    val snap = t.snapshot()
    // an INT literal against the LONG id column: the pruner casts the
    // literal to the column type before hashing, so pruning still engages
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types.IntegerType
    val intEq = EqualTo(UnresolvedAttribute("id"), Literal(12345, IntegerType))
    val kept = snap.files.count(f =>
      graft.log.Pruner.mightMatch(f, intEq, snap.schema, t.bloomIndex))
    kept should be < snap.numFiles / 2
    // and through the public API with an int literal
    t.read(Seq(col("id") === 12345)).count() shouldBe 1
  }

  test("false-positive rate is near the configured fpp") {
    val n = 20000
    val (m, k) = BloomFilter.sizing(n.toLong, 0.01)
    val words = new Array[Long]((m / 64).toInt)
    val rnd = new scala.util.Random(3)
    val present = (1 to n).map(_ => rnd.nextLong()).toSet
    present.foreach(h => BloomFilter.positions(h, m, k).foreach(pos =>
      words((pos / 64).toInt) |= (1L << (pos % 64).toInt)))
    val loaded = BloomFilter.Loaded(k, m, words)
    present.forall(loaded.mightContain) shouldBe true // no false negatives
    val probes = (1 to 20000).map(_ => rnd.nextLong()).filterNot(present)
    val fp = probes.count(loaded.mightContain).toDouble / probes.size
    fp should be < 0.03
  }

  test("bloom survives serialize/deserialize round-trip; corrupt loads are conservative") {
    val (m, k) = BloomFilter.sizing(100L, 0.01)
    val words = new Array[Long]((m / 64).toInt)
    BloomFilter.positions(42L, m, k).foreach(pos =>
      words((pos / 64).toInt) |= (1L << (pos % 64).toInt))
    val rt = BloomFilter.deserialize(BloomFilter.serialize(k, m, words))
    rt.isDefined shouldBe true
    rt.get.mightContain(42L) shouldBe true
    BloomFilter.deserialize(Array[Byte](1, 2, 3)) shouldBe None
  }
}

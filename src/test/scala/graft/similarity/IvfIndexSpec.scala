package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The persistent IVF index: a cell-partitioned graft table whose searches
  * read only the probed cells' files. */
class IvfIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("index search matches the in-memory IVF pipeline exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    val idx = Similarity.buildIvfIndex(spark,
      tmpDir("ivfidx").resolve("t").toString, emb, centroids)
    val queries = emb.filter(col("vec_id") < 8)
    // search leaves nothing pinned in the block manager (the same leak
    // class as the r10 bm25SearchIndex persist): a retrieval service
    // calling this per request must not accumulate cached partitions
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val fromIndex = Similarity.searchIvfIndex(idx, queries, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect()
    spark.sparkContext.getPersistentRDDs.size shouldBe cachedBefore
    val inMemory = Similarity.ivfTopKTrained(emb, queries, k = 5, centroids, nprobe = 4)
      .orderBy("query_id", "rank").collect()
    fromIndex shouldBe inMemory
  }

  test("search reads only the probed cells' files (partition pruning)") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    val idx = Similarity.buildIvfIndex(spark,
      tmpDir("ivfprune").resolve("t").toString, emb, centroids)
    val total = idx.snapshot().numFiles
    total should be >= 8 // one+ file per populated cell
    // one query, 2 probes -> at most 2 cells' files
    val one = emb.filter(col("vec_id") === 3)
    val q = Similarity.searchIvfIndex(idx, one, k = 3, nprobe = 2)
    q.count() shouldBe 3
    import graft.functions.VectorFunctions
    val probed = one
      .select(explode(VectorFunctions.nearestCentroids(
        transform(col("embedding"), x => x.cast("double")), centroids, 2)).as("cell"))
      .collect().map(_.getInt(0)).toSet
    val pruned = idx.toDf.filter(col("cell").isin(probed.toSeq: _*))
    pruned.inputFiles // force plan
    val read = idx.read(Seq(col("cell").isin(probed.toSeq: _*)))
    read.inputFiles.length should be < total
  }

  test("incremental append matches an index built from the full corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.sampleCentroids(emb, nlist = 16)
    val old = emb.filter(col("vec_id") % 3 =!= 0)
    val batch = emb.filter(col("vec_id") % 3 === 0)
    val idx = Similarity.buildIvfIndex(spark,
      tmpDir("ivfinc").resolve("t").toString, old, centroids)
    Similarity.appendToIvfIndex(idx, batch)
    val full = Similarity.buildIvfIndex(spark,
      tmpDir("ivfinc").resolve("full").toString, emb, centroids)
    val queries = emb.filter(col("vec_id") < 8)
    val incr = Similarity.searchIvfIndex(idx, queries, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect()
    val scratch = Similarity.searchIvfIndex(full, queries, k = 5, nprobe = 4)
      .orderBy("query_id", "rank").collect()
    incr shouldBe scratch
    // the append is one commit on the same table, not a rebuild
    idx.history(None).count() shouldBe 3 // create + append + append
  }

  test("the index is a real table: versioned, reloadable codebook") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.trainCentroids(emb, nlist = 8)
    val dir = tmpDir("ivfreload").resolve("t").toString
    Similarity.buildIvfIndex(spark, dir, emb, centroids)
    // reopen cold: centroids come back bit-identical from properties
    val reopened = graft.table.LakeTable.forPath(spark, dir)
    val rt = Similarity.decodeCentroids(reopened.properties("graft.ivf.centroids"))
    rt.length shouldBe centroids.length
    rt.zip(centroids).foreach { case (a, b) => a shouldBe b }
    reopened.history(None).count() should be >= 2L // create + append
  }
}

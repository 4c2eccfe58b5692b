package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Training-data pipeline queries over the documents/embeddings tables:
  * dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
  * ANN search (brute-force + IVF), text analysis, multimodal features. */
object DataOps {

  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, sfDir))

  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, sfDir), minEstJaccard = 0.3)
      .orderBy("a", "b")

  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhash(Tables.documents(spark, sfDir))

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir),
      blockCol = "source", minJaccard = 0.8)

  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // candidates are blocked by the same trained IVF cells the ANN search
    // uses; at cosine 0.35 a qualifying pair can span cluster boundaries,
    // so probe enough cells for full recall vs the exact oracle
    val centroids = Similarity.trainCentroids(emb, nlist = 16)
    Dedup.embeddingNearDupPairs(emb, blockCol = "label", centroids,
      nprobe = 6, minCosine = 0.35)
  }

  def annCosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  def annIvfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 5, bits = 4)
  }

  /** Trained-codebook IVF (KMeans centroids + codegen'd cell assignment). */
  def annIvfTrained(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = Similarity.trainCentroids(emb, nlist = 16)
    Similarity.ivfTopKTrained(emb, emb.filter(col("vec_id") < 10), k = 5,
      centroids, nprobe = 2)
  }

  def textAnalysis(spark: SparkSession, sfDir: String): DataFrame =
    TextAnalysis.analyze(Tables.documents(spark, sfDir))
      .select("doc_id", "token_count", "char_count", "predicted_lang",
        "punct_ratio", "stopword_ratio", "quality_score", "fingerprint")

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.synthesize(Tables.documents(spark, sfDir)), dim = 16)
      .toDF()
      .select(col("media_id"), col("kind"), round(col("featureNorm"), 6).as("feature_norm"))

  // ------------------------------------------------------------ oracles
  // (LSH/SimHash/IVF/multimodal are hash-seeded Spark-side and not
  // SQL-expressible → rows-only checks by the driver.)

  /** DuckDB token expression mirroring TextAnalysis.tokens. */
  private val toks =
    """CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
       ELSE string_split_regex(trim(text), '\s+') END"""

  private def hitsSql(words: Seq[String]): String =
    s"len(list_intersect(list_distinct($toks), [${words.map(w => s"'$w'").mkString(",")}]))"

  val oracles: Map[String, String] = Map(
    "q21_exact_dedup" ->
      """SELECT * FROM documents
         WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""",
    "q24_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, source,
           list_distinct(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(trim(text), '\s+') END) AS toks
           FROM documents)
         SELECT x.doc_id AS a, y.doc_id AS b,
           ROUND(CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
                 len(list_distinct(x.toks || y.toks)), 6) AS jaccard
         FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
         WHERE CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE) /
               len(list_distinct(x.toks || y.toks)) >= 0.8""",
    "q25_ann_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
         s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
           FROM e, q WHERE e.vec_id <> q.query_id),
         r AS (SELECT *, CAST(ROW_NUMBER() OVER
             (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
           FROM s)
         SELECT query_id, rank, neighbor_id, cosine FROM r WHERE rank <= 5""",
    "q28_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         n AS (SELECT *, sqrt(list_dot_product(v, v)) AS norm FROM e)
         SELECT x.vec_id AS a, y.vec_id AS b,
           ROUND(list_dot_product(x.v, y.v) / (x.norm * y.norm), 6) AS cosine
         FROM n x JOIN n y ON x.label = y.label AND x.vec_id < y.vec_id
         WHERE list_dot_product(x.v, y.v) / (x.norm * y.norm) >= 0.35""",
    "q27_text_analysis" -> {
      val en = hitsSql(TextAnalysis.stopwords.head._2)
      val langCase = {
        val scores = TextAnalysis.stopwords.map { case (l, ws) => l -> hitsSql(ws) }
        val best = s"greatest(${scores.map(_._2).mkString(", ")})"
        val whens = scores.map { case (l, s) =>
          s"WHEN $s = $best AND $s > 0 THEN '$l'"
        }.mkString(" ")
        s"CASE $whens ELSE 'und' END"
      }
      s"""SELECT doc_id,
          CAST(len($toks) AS INT) AS token_count,
          CAST(length(text) AS INT) AS char_count,
          $langCase AS predicted_lang,
          CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) AS punct_ratio,
          CAST($en AS DOUBLE) / greatest(len(list_distinct($toks)), 1) AS stopword_ratio,
          ROUND(LEAST(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) * 0.4
            + (CAST($en AS DOUBLE) / greatest(len(list_distinct($toks)), 1)) * 0.3
            + (1.0 - CAST(length(text) - length(regexp_replace(text, '[!?.,;:]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1)) * 0.3, 6) AS quality_score,
          md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fingerprint
          FROM documents"""
    })
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables
import graft.analytics.{DataOps, Gold, MetaOps, QualityOps, TableOps}
import graft.transform.Silver

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one implemented operator/pipeline from
  * SURVEY.md §2; `oracleSql` carries the DuckDB-equivalent SQL over the
  * same parquet tables (column names aliased identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Gold.pricingSummary(Tables.lineitem(spark, "/root/testdata/sf0.001"))

  type Q = (SparkSession, String) => DataFrame

  private val analyticsQueries: Map[String, Q] = Map(
    "q1_pricing_summary" -> ((s, d) => Gold.pricingSummary(Tables.lineitem(s, d))),
    "q2_daily_user_activity" -> ((s, d) => Gold.dailyUserActivity(Tables.events(s, d))),
    "q3_daily_txn_analytics" -> ((s, d) =>
      Gold.dailyTransactionAnalytics(Tables.orders(s, d), Tables.customer(s, d))),
    "q4_user_ltv" -> ((s, d) =>
      Gold.userLtv(Tables.orders(s, d), Tables.events(s, d), Tables.customer(s, d))),
    "q5_cohort_retention" -> ((s, d) => Gold.cohortRetention(Tables.orders(s, d))),
    "q6_daily_kpis" -> ((s, d) =>
      Gold.dailyKpis(Tables.orders(s, d), Tables.events(s, d), Tables.customer(s, d))),
    "q7_top_customers" -> ((s, d) => Gold.topCustomers(Tables.orders(s, d), Tables.customer(s, d))),
    "q8_region_revenue" -> ((s, d) =>
      Gold.regionRevenue(Tables.lineitem(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d))))

  /** Table-format ops (SURVEY §2.9) + silver transforms (§2.14). */
  private val tableOpsQueries: Map[String, Q] = Map(
    "q9_merge_upsert" -> (TableOps.mergeUpsert _),
    "q10_update" -> (TableOps.updateWhere _),
    "q11_delete" -> (TableOps.deleteWhere _),
    "q12_time_travel" -> (TableOps.timeTravel _),
    "q13_restore" -> (TableOps.restore _),
    "q14_cdf_update" -> (TableOps.cdfUpdate _),
    "q15_replace_where" -> (TableOps.replaceWhere _),
    "q16_zorder_identity" -> (TableOps.zorderIdentity _),
    "q70_hilbert_identity" -> (TableOps.hilbertIdentity _),
    "q76_cluster_incremental" -> (TableOps.clusterIncremental _),
    "q94_row_tracking" -> (TableOps.rowTracking _),
    "q95_type_widening" -> (TableOps.typeWidening _),
    "q96_in_commit_timestamp" -> (TableOps.inCommitTimestamp _),
    "q97_cdf_row_ids" -> (TableOps.cdfRowIds _),
    "q79_stream_dedup_ingest" -> (MetaOps.streamDedupIngest _),
    "q109_stream_bm25" -> (MetaOps.streamBm25Ingest _),
    "q17_scd2" -> (TableOps.scd2 _),
    "q43_dv_delete" -> (TableOps.dvDelete _),
    "q44_merge_full_sync" -> (TableOps.mergeFullSync _),
    "q59_sql_merge" -> (TableOps.sqlMerge _),
    "q60_stream_upsert" -> (TableOps.streamUpsert _))

  private val silverQueries: Map[String, Q] = Map(
    "q18_clean_events" -> ((s, d) => Silver.cleanEvents(Tables.events(s, d)).drop("ts")),
    "q19_clean_orders" -> ((s, d) => Silver.cleanOrders(Tables.orders(s, d))),
    "q20_clean_customers" -> ((s, d) => Silver.cleanCustomers(Tables.customer(s, d))))

  /** Training-data pipeline ops: dedup, similarity search, text analysis,
    * multimodal plumbing. LSH/SimHash/IVF/multimodal are hash-seeded →
    * rows-only driver checks; the rest have DuckDB oracles. */
  private val dataOpsQueries: Map[String, Q] = Map(
    "q21_exact_dedup" -> (DataOps.exactDedup _),
    "q22_minhash_lsh" -> (DataOps.minhashLsh _),
    "q23_simhash" -> (DataOps.simhash _),
    "q24_ngram_jaccard" -> (DataOps.ngramJaccard _),
    "q25_ann_cosine_topk" -> (DataOps.annCosineTopK _),
    "q26_ann_ivf_topk" -> (DataOps.annIvfTopK _),
    "q27_text_analysis" -> (DataOps.textAnalysis _),
    "q28_embedding_neardup" -> (DataOps.embeddingNearDup _),
    "q29_multimodal_features" -> (DataOps.multimodalFeatures _),
    "q39_ann_ivf_trained" -> (DataOps.annIvfTrained _),
    "q40_train_test_split" -> (DataOps.trainTestSplit _),
    "q41_decontamination" -> (DataOps.decontamination _),
    "q42_pii_redaction" -> (DataOps.piiRedaction _),
    "q45_mixture_sample" -> (DataOps.mixtureSample _),
    "q77_alpha_mixture" -> (DataOps.alphaMixture _),
    "q78_hard_negatives" -> (DataOps.hardNegatives _),
    "q91_hard_negatives_pruned" -> (DataOps.hardNegativesPruned _),
    "q98_hard_negatives_trained" -> (DataOps.hardNegativesTrained _),
    "q99_margin_mining_trained" -> (DataOps.marginMiningTrained _),
    "q100_dsir_selection" -> (DataOps.dsirSelection _),
    "q101_dsir_resample" -> (DataOps.dsirResampling _),
    "q102_perplexity_tiers" -> (DataOps.perplexityTiering _),
    "q103_bm25_topk" -> (DataOps.bm25Retrieval _),
    "q104_hybrid_rrf" -> (DataOps.hybridRetrieval _),
    "q105_cluster_balanced" -> (DataOps.clusterBalancedSample _),
    "q106_stratified_split" -> (DataOps.stratifiedSplitGate _),
    "q107_bm25_indexed" -> (DataOps.bm25IndexedRetrieval _),
    "q108_bm25_dfcapped" -> (DataOps.bm25DfCappedRetrieval _),
    "q92_video_fingerprint" -> (DataOps.videoFingerprint _),
    "q93_ulaw_fingerprint" -> (DataOps.ulawFingerprint _),
    "q80_matryoshka" -> (DataOps.matryoshka _),
    "q81_normalized_dedup" -> (DataOps.normalizedDedup _),
    "q82_corpus_stats" -> (DataOps.corpusStats _),
    "q83_vocabulary" -> (DataOps.vocabularyBuild _),
    "q84_margin_mining" -> (DataOps.marginMiningPairs _),
    "q85_image_dedup" -> (DataOps.imageDedup _),
    "q86_image_neardup" -> (DataOps.imageNearDup _),
    "q87_audio_fingerprint" -> (DataOps.audioDedup _),
    "q88_oov_report" -> (DataOps.oovReport _),
    "q89_dup_stats" -> (DataOps.dupStats _),
    "q90_curriculum_shards" -> (DataOps.curriculumShards _),
    "q46_pack_sequences" -> (DataOps.packSequences _),
    "q47_sessionize" -> (DataOps.sessionize _),
    "q48_ann_ivf_index" -> (DataOps.annIvfIndex _),
    "q50_dedup_groups" -> (DataOps.nearDupGroups _),
    "q51_asof_join" -> (DataOps.asOfLastView _),
    "q52_range_join" -> (DataOps.weeklyRevenueRangeJoin _),
    "q53_quantize_int8" -> (DataOps.quantizeEmbeddings _),
    "q55_incremental_dedup" -> (DataOps.incrementalDedup _),
    "q61_incremental_neardedup" -> (DataOps.incrementalNearDedup _),
    "q56_repetition_signals" -> (DataOps.repetitionSignals _),
    "q57_bigram_stats" -> (DataOps.bigramStats _),
    "q58_pq_adc" -> (DataOps.pqAdcTopK _),
    "q63_dedup_segments" -> (DataOps.dedupSegments _),
    "q64_perplexity" -> (DataOps.perplexity _),
    "q65_semantic_dedup" -> (DataOps.semanticDedup _),
    "q66_budgeted_mixture" -> (DataOps.budgetedMixture _),
    "q68_semantic_dedup_indexed" -> (DataOps.semanticDedupIndexed _),
    "q73_chunk_documents" -> (DataOps.chunkDocuments _),
    "q71_binary_ann" -> (DataOps.annBinaryRerank _),
    "q69_shard_corpus" -> (DataOps.shardCorpus _))

  /** Quality validators (§2.13) + streaming ingestion (§2.11). */
  private val qualityOpsQueries: Map[String, Q] = Map(
    "q30_quality_report" -> (QualityOps.qualityReport _),
    "q31_duplicate_ids" -> (QualityOps.duplicateIds _),
    "q32_range_validation" -> (QualityOps.rangeValidation _),
    "q33_stream_ingest" -> (QualityOps.streamIngest _),
    "q75_filter_cascade" -> (QualityOps.filterCascade _))

  /** Metadata/maintenance surface (§2.9 M7/M10-M16). */
  private val metaOpsQueries: Map[String, Q] = Map(
    "q34_describe_history" -> (MetaOps.describeHistory _),
    "q35_describe_detail" -> (MetaOps.describeDetail _),
    "q36_vacuum" -> (MetaOps.vacuumKeepsLiveData _),
    "q37_deep_clone" -> (MetaOps.deepClone _),
    "q38_schema_evolution" -> (MetaOps.schemaEvolution _),
    "q49_convert" -> (MetaOps.convertInPlace _),
    "q110_convert_delta" -> (MetaOps.convertFromDelta _),
    "q111_delta_sync" -> (MetaOps.deltaSync _),
    "q112_delta_rewrite" -> (MetaOps.deltaRewrite _),
    "q113_delta_dv" -> (MetaOps.convertDeltaDv _),
    "q114_delta_mapped" -> (MetaOps.convertDeltaMapped _),
    "q115_iceberg_import" -> (MetaOps.convertIceberg _),
    "q116_iceberg_sync" -> (MetaOps.icebergSync _),
    "q117_iceberg_rewrite" -> (MetaOps.icebergRewriteDays _),
    "q118_iceberg_eqdelete" -> (MetaOps.icebergEqualityDelete _),
    "q119_iceberg_rewrite_sync" -> (MetaOps.icebergRewriteSync _),
    "q120_delta_rewrite_sync" -> (MetaOps.deltaRewriteSync _),
    "q121_stream_mirror" -> (MetaOps.streamMirror _),
    "q62_copy_into" -> (MetaOps.copyIntoIdempotent _),
    "q54_bloom_lookup" -> (TableOps.bloomPointLookup _),
    "q67_catalog_sql" -> (MetaOps.catalogSql _),
    "q74_native_sql_merge" -> (MetaOps.nativeSqlMerge _),
    "q72_stream_to_table" -> (MetaOps.streamToTable _))

  def queries: Map[String, Q] =
    analyticsQueries ++ tableOpsQueries ++ silverQueries ++ dataOpsQueries ++
      qualityOpsQueries ++ metaOpsQueries

  private val analyticsOracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
         CAST(((2 * ((2 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * 100) AS HUGEINT) * 10000 + COUNT(*)) // (2 * COUNT(*))) + 100) // 200) AS DOUBLE) / 10000.0 AS avg_qty,
         CAST(((2 * ((2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100) AS HUGEINT) * 10000 + COUNT(*)) // (2 * COUNT(*))) + 100) // 200) AS DOUBLE) / 10000.0 AS avg_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q2_daily_user_activity" ->
      """SELECT *, ROUND((last_event_sec - first_event_sec) / 60.0, 4) AS session_duration_minutes,
         total_events >= 5 AS is_power_user FROM (
           SELECT CAST(ts AS DATE) AS event_date, user_id,
             COUNT(*) AS total_events,
             COUNT(DISTINCT event_type) AS distinct_event_types,
             CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events,
             CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click_events,
             CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view_events,
             CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS first_event_sec,
             CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS last_event_sec
           FROM events GROUP BY 1, 2)""",
    "q3_daily_txn_analytics" ->
      """SELECT *, ROUND(CAST(fulfilled_orders AS DOUBLE) / CAST(total_orders AS DOUBLE), 4) AS success_rate,
         CASE WHEN total_amount >= 500000 THEN 'ENTERPRISE'
              WHEN total_amount >= 100000 THEN 'LARGE'
              WHEN total_amount >= 10000 THEN 'MEDIUM'
              ELSE 'SMALL' END AS customer_segment FROM (
           SELECT CAST(o.o_orderdate AS DATE) AS order_date, c.c_mktsegment,
             COUNT(*) AS total_orders,
             COUNT(DISTINCT o.o_custkey) AS distinct_customers,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
             CAST(((2 * ((2 * CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT) * 10000 + COUNT(*)) // (2 * COUNT(*))) + 100) // 200) AS DOUBLE) / 10000.0 AS avg_amount,
             MIN(o.o_totalprice) AS min_amount,
             MAX(o.o_totalprice) AS max_amount,
             CAST(SUM(CASE WHEN o.o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled_orders,
             CAST(SUM(CASE WHEN o.o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
             CAST(SUM(CASE WHEN o.o_orderpriority='1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
             COUNT(DISTINCT o.o_orderpriority) AS distinct_priorities
           FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2)""",
    "q4_user_ltv" ->
      """WITH txn AS (
           SELECT o_custkey AS user_id, COUNT(*) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
             CAST(((2 * ((2 * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS HUGEINT) * 10000 + COUNT(*)) // (2 * COUNT(*))) + 100) // 200) AS DOUBLE) / 10000.0 AS avg_order_value,
             CAST(FLOOR(EPOCH(MIN(o_orderdate))) AS BIGINT) AS first_order_sec,
             CAST(FLOOR(EPOCH(MAX(o_orderdate))) AS BIGINT) AS last_order_sec,
             COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS active_order_days
           FROM orders GROUP BY 1),
         eng AS (
           SELECT user_id, COUNT(*) AS event_count,
             COUNT(DISTINCT event_type) AS event_type_count,
             COUNT(DISTINCT CAST(ts AS DATE)) AS active_event_days,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_event_value
           FROM events GROUP BY 1)
         SELECT *, CASE WHEN ltv_score >= 200000 THEN 'PLATINUM'
                WHEN ltv_score >= 100000 THEN 'GOLD'
                WHEN ltv_score >= 50000 THEN 'SILVER'
                ELSE 'BRONZE' END AS ltv_segment
         FROM (
         SELECT user_id, c_mktsegment, order_count, total_spent, avg_order_value,
           active_order_days, event_count, event_type_count, active_event_days,
           total_event_value,
           CAST(ROUND(CAST(total_spent AS DECIMAL(20,2)) * 0.5 + order_count * 100 + event_count * 10 + active_event_days * 50, 4) AS DOUBLE) AS ltv_score
         FROM (
           SELECT c.c_custkey AS user_id, c.c_mktsegment,
             COALESCE(t.order_count, 0) AS order_count,
             COALESCE(t.total_spent, 0.0) AS total_spent,
             COALESCE(t.avg_order_value, 0.0) AS avg_order_value,
             COALESCE(t.active_order_days, 0) AS active_order_days,
             COALESCE(e.event_count, 0) AS event_count,
             COALESCE(e.event_type_count, 0) AS event_type_count,
             COALESCE(e.active_event_days, 0) AS active_event_days,
             COALESCE(e.total_event_value, 0.0) AS total_event_value
           FROM customer c
           LEFT JOIN txn t ON c.c_custkey = t.user_id
           LEFT JOIN eng e ON c.c_custkey = e.user_id))""",
    "q5_cohort_retention" ->
      """WITH first_order AS (
           SELECT o_custkey, MIN(DATE_TRUNC('month', o_orderdate)) AS cohort_ts
           FROM orders GROUP BY 1),
         activity AS (
           SELECT DISTINCT o_custkey, DATE_TRUNC('month', o_orderdate) AS activity_ts FROM orders),
         sizes AS (
           SELECT cohort_ts, COUNT(DISTINCT o_custkey) AS cohort_size FROM first_order GROUP BY 1)
         SELECT CAST(j.cohort_ts AS DATE) AS cohort_month, j.months_since_cohort,
           COUNT(DISTINCT j.o_custkey) AS active_users, s.cohort_size,
           ROUND(CAST(COUNT(DISTINCT j.o_custkey) AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 4) AS retention_rate
         FROM (
           SELECT a.o_custkey, f.cohort_ts,
             CAST(DATEDIFF('month', f.cohort_ts, a.activity_ts) AS INT) AS months_since_cohort
           FROM activity a JOIN first_order f USING (o_custkey)) j
         JOIN sizes s USING (cohort_ts)
         GROUP BY j.cohort_ts, j.months_since_cohort, s.cohort_size""",
    "q6_daily_kpis" ->
      """WITH revenue AS (
           SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
             COUNT(*) AS total_orders, COUNT(DISTINCT o_custkey) AS ordering_customers
           FROM orders),
         engagement AS (
           SELECT COUNT(*) AS total_events, COUNT(DISTINCT user_id) AS active_users,
             CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events
           FROM events),
         users AS (
           SELECT COUNT(*) AS total_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
           FROM customer)
         SELECT r.*, e.*, u.*,
           ROUND(CAST(purchase_events AS DOUBLE) / CAST(total_events AS DOUBLE), 4) AS conversion_rate,
           ROUND(total_revenue / CAST(total_customers AS DOUBLE), 4) AS revenue_per_customer,
           ROUND(CAST(total_orders AS DOUBLE) / CAST(total_customers AS DOUBLE), 4) AS orders_per_customer
         FROM revenue r, engagement e, users u""",
    "q7_top_customers" ->
      """SELECT CAST(rank AS INTEGER) AS rank, custkey, c_name, c_mktsegment, revenue, order_count FROM (
           SELECT ROW_NUMBER() OVER (ORDER BY revenue_dec DESC, o_custkey ASC) AS rank,
             o_custkey AS custkey, c_name, c_mktsegment,
             CAST(revenue_dec AS DOUBLE) AS revenue, order_count
           FROM (
             SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec,
               COUNT(*) AS order_count
             FROM orders GROUP BY 1) r
           JOIN customer c ON r.o_custkey = c.c_custkey)
         WHERE rank <= 20""",
    "q8_region_revenue" ->
      """SELECT r.r_name,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
         COUNT(*) AS lineitem_count,
         COUNT(DISTINCT l.l_suppkey) AS supplier_count
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name""")

  private val silverOracles: Map[String, String] = Map(
    "q18_clean_events" ->
      """SELECT event_id, user_id, lower(trim(event_type)) AS event_type, value, props,
         CAST(ts AS DATE) AS event_date, CAST(EXTRACT(HOUR FROM ts) AS INT) AS event_hour,
         CASE WHEN lower(trim(event_type)) IN ('purchase','cart','checkout') THEN 'commerce'
              WHEN lower(trim(event_type)) IN ('click','view','scroll') THEN 'engagement'
              WHEN lower(trim(event_type)) = 'error' THEN 'system'
              ELSE 'other' END AS event_category,
         COALESCE(value >= 100.0, FALSE) AS is_high_value
         FROM events
         WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL""",
    "q19_clean_orders" ->
      """SELECT o_orderkey, o_custkey, upper(trim(o_orderstatus)) AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority,
         CASE WHEN o_totalprice >= 500000 THEN 'ENTERPRISE'
              WHEN o_totalprice >= 100000 THEN 'LARGE'
              WHEN o_totalprice >= 10000 THEN 'MEDIUM'
              ELSE 'SMALL' END AS amount_bucket,
         o_orderpriority IN ('1-URGENT','2-HIGH') AS is_urgent,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year
         FROM orders WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL""",
    "q20_clean_customers" ->
      """SELECT c_custkey, trim(c_name) AS c_name, c_nationkey, c_acctbal,
         upper(trim(c_mktsegment)) AS c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
              WHEN c_acctbal < 1000 THEN 'LOW'
              WHEN c_acctbal < 5000 THEN 'MEDIUM'
              ELSE 'HIGH' END AS balance_bucket,
         c_acctbal >= 5000 AS is_premium
         FROM customer WHERE c_custkey IS NOT NULL""")

  def oracleSql: Map[String, String] =
    analyticsOracles ++ TableOps.oracles ++ silverOracles ++ DataOps.oracles ++
      QualityOps.oracles ++ MetaOps.oracles
}

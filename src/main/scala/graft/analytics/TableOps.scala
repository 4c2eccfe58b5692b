package graft.analytics

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.table.LakeTable
import graft.transform.Scd2

/** Driver-contract queries exercising the graft table format end-to-end
  * (SURVEY §2.9): each builds a scratch LakeTable from a testdata table,
  * applies DML/maintenance, and returns the resulting DataFrame so the
  * DuckDB oracle can recompute the expected state straight from the source
  * parquet. Temp dirs are throwaway — determinism comes from the testdata.
  */
object TableOps {

  private def scratch(name: String): String =
    Files.createTempDirectory(s"graft-$name").resolve("t").toString

  /** MERGE upsert-all (M1): source = even keys at +1000 price; target
    * misses keys divisible by 3. */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val target = orders.filter(col("o_orderkey") % 3 =!= 0)
    val source = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val t = LakeTable.createFrom(spark, scratch("merge"), target)
    t.merge(source, col("target.o_orderkey") === col("source.o_orderkey"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    t.read()
  }

  /** SQL `MERGE INTO` text form (§2.19): the q9 upsert driven through
    * [[graft.table.GraftSql]] with arbitrary aliases plus a conditional
    * DELETE clause — expensive matched rows are dropped instead of updated. */
  def sqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val dir = scratch("sqlmerge")
    LakeTable.createFrom(spark, dir, orders.filter(col("o_orderkey") % 3 =!= 0))
    orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .createOrReplaceTempView("sql_merge_src")
    graft.table.GraftSql(spark).run(
      s"""MERGE INTO '$dir' AS t USING sql_merge_src AS s
          ON t.o_orderkey = s.o_orderkey
          WHEN MATCHED AND s.o_totalprice > 400000.0 THEN DELETE
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
    LakeTable.forPath(spark, dir).read()
  }

  /** Streaming CDC upsert (§2.19): two sequential change batches stream
    * through `startUpsertStream` — updates, flagged deletes, a re-insert of
    * a deleted key, and a ghost delete (key never present). The final table
    * is the deterministic fold of the two batches over the initial state. */
  def streamUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.streaming.StreamIngest
    val orders = Tables.orders(spark, sfDir)
    val table = LakeTable.createFrom(spark, scratch("supsert"),
      orders.filter(col("o_orderkey") % 3 =!= 0))
    val srcDir = Files.createTempDirectory("graft-supsert-src").toString
    val ck = Files.createTempDirectory("graft-supsert-ck").toString
    val cdcSchema = org.apache.spark.sql.types.StructType(
      orders.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("seq",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_deleted",
          org.apache.spark.sql.types.BooleanType)))
    def runBatch(batch: DataFrame): Unit = {
      // parquet CDC files: the gate here is exactly-once upsert semantics
      // (q33 covers JSON ingestion); a coalesced JSON leg would spend more
      // time single-thread encoding/parsing than merging
      batch.coalesce(1).write.mode("append").parquet(srcDir)
      // AvailableNow: drain what's there, then the query stops itself —
      // no processAllAvailable polling handshake + explicit stop teardown
      val anow = StreamIngest.StreamConfig(format = "parquet",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      val q = StreamIngest.startUpsertStream(
        StreamIngest.fileSource(spark, srcDir, cdcSchema, anow),
        table, ck, keyCols = Seq("o_orderkey"),
        sequenceCol = Some("seq"), deleteCol = Some("_deleted"),
        config = anow)
      try { require(q.awaitTermination(300000), "stream did not drain") }
      finally if (q.isActive) q.stop()
    }
    // batch 1: even keys update to +1000; every 10th key is a delete
    runBatch(orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      .withColumn("seq", lit(1L))
      .withColumn("_deleted", col("o_orderkey") % 10 === 0))
    // batch 2: every 4th key re-upserts at +2000 (re-inserting keys batch 1
    // deleted, e.g. %20 == 0)
    runBatch(orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(2000.0))
      .withColumn("seq", lit(2L))
      .withColumn("_deleted", lit(false)))
    table.read()
  }

  /** Full-sync MERGE with WHEN NOT MATCHED BY SOURCE: source rows upsert;
    * unmatched open orders are re-prioritized, other unmatched cheap orders
    * are dropped (Delta's whenNotMatchedBySource surface, first-match-wins
    * across the two NMBS clauses). */
  def mergeFullSync(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val source = orders.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val t = LakeTable.createFrom(spark, scratch("mergefs"), orders)
    t.merge(source, col("target.o_orderkey") === col("source.o_orderkey"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceUpdate(Map("o_orderpriority" -> lit("5-LOW")),
        condition = Some(col("target.o_orderstatus") === "O"))
      .whenNotMatchedBySourceDelete(Some(col("target.o_totalprice") < 50000.0))
      .execute()
    t.read()
  }

  /** UPDATE with predicate (M4): 5% uplift on open orders. */
  def updateWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val t = LakeTable.createFrom(spark, scratch("update"), Tables.orders(spark, sfDir))
    t.update(col("o_orderstatus") === "O",
      Map("o_totalprice" -> col("o_totalprice") * 1.05))
    t.read()
  }

  /** DELETE with predicate (M5): retention purge of small fulfilled orders. */
  def deleteWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val t = LakeTable.createFrom(spark, scratch("delete"), Tables.orders(spark, sfDir))
    t.delete(col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0)
    t.read()
  }

  /** Deletion-vector DML: with graft.enableDeletionVectors, DELETE masks
    * rows (data files untouched, a second delete accumulates into the
    * vectors) and UPDATE masks + appends only the changed rows. */
  def dvDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val t = LakeTable.create(spark, scratch("dv-delete"), orders.schema,
      properties = Map("graft.enableDeletionVectors" -> "true"))
    t.append(orders)
    t.delete(col("o_orderstatus") === "F" && col("o_totalprice") < 100000.0)
    t.delete(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") >= 400000.0)
    t.update(col("o_totalprice") >= 500000.0, Map("o_orderpriority" -> lit("5-LOW")))
    t.read()
  }

  /** Time travel (S8): v1 = even keys, v2 adds odd keys; read back v1. */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val t = LakeTable.createFrom(spark, scratch("tt"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.append(orders.filter(col("o_orderkey") % 2 =!= 0))
    t.versionAsOf(1)
  }

  /** RESTORE (M7): delete everything open, then roll back. */
  def restore(spark: SparkSession, sfDir: String): DataFrame = {
    val t = LakeTable.createFrom(spark, scratch("restore"), Tables.orders(spark, sfDir))
    t.delete(col("o_orderstatus") === "O")
    t.restoreToVersion(1)
    t.read()
  }

  /** CDF (S10): update_preimage/postimage pairs for an acctbal adjustment. */
  def cdfUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
    val t = LakeTable.create(spark, scratch("cdf"), customer.schema,
      properties = Map("graft.enableChangeDataFeed" -> "true"), ifNotExists = false)
    t.append(customer)
    t.update(col("c_custkey") % 5 === 0, Map("c_acctbal" -> (col("c_acctbal") + 100.0)))
    t.changes(2, Some(2)).drop("_commit_version", "_commit_timestamp")
  }

  /** replaceWhere (W3): idempotent partition-scoped rewrite of open orders. */
  def replaceWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val t = LakeTable.create(spark, scratch("rw"), orders.schema,
      partitionColumns = Seq("o_orderstatus"), ifNotExists = false)
    t.append(orders)
    t.overwriteWhere(col("o_orderstatus") === "O",
      orders.filter(col("o_orderstatus") === "O")
        .withColumn("o_totalprice", col("o_totalprice") + 5.0))
    t.read()
  }

  /** OPTIMIZE ZORDER (M9) is data-identical: lineitem survives a full
    * clustered rewrite bit-for-bit. */
  def zorderIdentity(spark: SparkSession, sfDir: String): DataFrame = {
    val t = LakeTable.createFrom(spark, scratch("zorder"), Tables.lineitem(spark, sfDir))
    t.optimizeZOrder(Seq("l_partkey", "l_suppkey"))
    t.read()
  }

  /** OPTIMIZE … CLUSTER BY (Hilbert curve) is equally data-identical;
    * exercised through the SQL form so the q70 gate covers parse +
    * dispatch + rewrite in one pass (see `HilbertSpec` for the curve's
    * adjacency/bijection proofs and the tightness-vs-zorder comparison). */
  def hilbertIdentity(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("hilbert")
    val t = LakeTable.createFrom(spark, dir, Tables.lineitem(spark, sfDir))
    graft.table.GraftSql(spark)
      .run(s"OPTIMIZE '$dir' CLUSTER BY (l_partkey, l_suppkey)").collect()
    t.read()
  }

  /** Incremental OPTIMIZE identity gate (q76): the first wave is clustered,
    * a second wave is appended, and the second OPTIMIZE must rewrite ONLY
    * the new files — asserted structurally (the first pass's outputs
    * survive, and the commit's skip metric equals their count) — while the
    * mixed-generation table still reads back bit-for-bit against the
    * oracle. The liquid-clustering property, gated end-to-end. */
  def clusterIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val t = LakeTable.createFrom(spark, scratch("incz"),
      orders.filter(col("o_orderkey") % 2 === 0))
    t.optimizeZOrder(Seq("o_custkey"), targetFileSize = 2L * 1024 * 1024)
    val clustered = t.snapshot().files.map(_.path).toSet
    t.append(orders.filter(col("o_orderkey") % 2 =!= 0))
    val v = t.optimizeZOrder(Seq("o_custkey"), targetFileSize = 2L * 1024 * 1024)
    val snap = t.snapshot()
    val skipped = snap.commits.find(_.version == v)
      .flatMap(_.operationMetrics.get("numFilesSkippedAlreadyClustered")).getOrElse(-1L)
    require(skipped == clustered.size &&
        clustered.subsetOf(snap.files.map(_.path).toSet),
      s"incremental OPTIMIZE touched already-clustered files " +
        s"(skipped=$skipped, expected=${clustered.size})")
    t.read()
  }

  /** SCD Type 2 (M6): initial load at ts0; batch at ts1 changes acctbal for
    * keys %4==0 and introduces new entities (key+1000000) for keys %4==1. */
  def scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
    val tracked = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val ts0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val ts1 = Timestamp.valueOf("2026-02-01 00:00:00")
    val t = Scd2.initialize(spark, scratch("scd2"), customer, tracked, ts0)
    val changed = customer.filter(col("c_custkey") % 4 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 50.0)
    val fresh = customer.filter(col("c_custkey") % 4 === 1)
      .withColumn("c_custkey", col("c_custkey") + 1000000L)
    Scd2.upsert(t, changed.unionByName(fresh), Seq("c_custkey"), tracked, ts1)
    t.read()
      .drop("record_hash")
      .withColumn("effective_start", col("effective_start").cast("timestamp_ntz"))
      .withColumn("effective_end", col("effective_end").cast("timestamp_ntz"))
  }

  /** Per-file bloom index (§2.17): point lookups on a high-cardinality key
    * go through the bloom-pruned read path (round-robin repartition makes
    * every file span the full key range, so min/max stats alone cannot
    * skip anything — the bloom sidecars do the work). */
  def bloomPointLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val t = LakeTable.create(spark, scratch("bloom"), orders.schema)
    t.setProperties(Map("graft.bloomFilter.columns" -> "o_orderkey"))
    t.append(orders.repartition(8, col("o_orderkey")))
    t.read(Seq(col("o_orderkey").isin(32L, 4000L, 9988L, 14977L)))
      .orderBy("o_orderkey")
  }

  /** Row tracking end-to-end (q94, the Delta rowTracking feature): two
    * deterministic single-file appends (evens then odds, each sorted by
    * doc_id) make id assignment arithmetically replayable — `_row_id` =
    * row_number over (doc_id % 2, doc_id) − 1 and `_row_commit_version`
    * = the producing append's version — then OPTIMIZE must preserve both
    * through the rewrite (materialized columns) and a DV DELETE must
    * drop rows without moving any survivor's id. The oracle recomputes
    * all of it from the source parquet, so the gate proves assignment
    * order, high-water-mark continuation across commits, materialization,
    * and DV stability bit-for-bit. */
  def rowTracking(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val t = LakeTable.create(spark, scratch("rowtrack"), docs.schema,
      properties = Map(
        "graft.enableRowTracking" -> "true",
        "graft.enableDeletionVectors" -> "true"), ifNotExists = false)
    t.append(docs.filter(col("doc_id") % 2 === 0)
      .repartition(1).sortWithinPartitions("doc_id")) // v1: ids 0..nEven-1
    t.append(docs.filter(col("doc_id") % 2 === 1)
      .repartition(1).sortWithinPartitions("doc_id")) // v2: continues
    t.optimizeCompact() // materializes ids; must be an identity on them
    t.delete(col("doc_id") % 7 === 0) // DV mask — survivor ids untouched
    t.withRowIds().select(col("_row_id"), col("_row_commit_version"),
      col("doc_id"), col("source"))
  }

  /** Type widening end-to-end (Delta's `typeWidening` feature): INT/FLOAT
    * files are written first, the columns widen to BIGINT/DOUBLE through
    * the SQL surface (METADATA-ONLY — the files never move), a second
    * append lands values beyond the int range, and an UPDATE rewrite then
    * touches BOTH generations — its read resolves the old INT parquet
    * under the LONG schema (Spark 4's widening scan), the exact path a
    * 100 TB table takes when its ids outgrow INT without a rewrite. The
    * oracle recomputes every value from the source parquet; the float leg
    * uses small integral values so float→double is bit-exact on both
    * engines. */
  def typeWidening(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val base = orders
      .withColumn("val", col("o_custkey").cast("int"))
      .withColumn("ratio", (col("o_custkey") % 1024).cast("float"))
      .select("o_orderkey", "val", "ratio")
    val dir = scratch("widen")
    val t = LakeTable.create(spark, dir, base.schema,
      properties = Map("delta.enableTypeWidening" -> "true"), ifNotExists = false)
    t.append(base.filter(col("o_orderkey") % 2 === 0)) // v1: INT + FLOAT files
    val sql = graft.table.GraftSql(spark)
    sql.run(s"ALTER TABLE '$dir' ALTER COLUMN val TYPE BIGINT")
    sql.run(s"ALTER TABLE '$dir' ALTER COLUMN ratio TYPE DOUBLE")
    t.append(base.filter(col("o_orderkey") % 2 === 1)
      .withColumn("val", col("val") + lit(3000000000L))) // needs BIGINT now
    t.update(col("o_orderkey") % 5 === 0, Map("val" -> (col("val") + 1L)))
    LakeTable.forPath(spark, dir).read().select("o_orderkey", "val", "ratio")
  }

  /** Row ids in the Change Data Feed (row tracking × CDF): the same
    * deterministic id assignment as q94 (single sorted file per append —
    * `_row_id` = row_number over (doc_id % 2, doc_id) − 1), then a DV
    * UPDATE and a DV DELETE whose sidecars must record each image's
    * resolved id — updates keep their id across pre/post, deletes name the
    * exact rows the mask killed, and the synthesized inserts resolve
    * through the broadcast base map. The oracle replays the entire feed
    * arithmetically: ids, change types, and the post-update values the
    * delete images must reflect. */
  def cdfRowIds(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
    val t = LakeTable.create(spark, scratch("cdfrowid"), docs.schema,
      properties = Map(
        "graft.enableRowTracking" -> "true",
        "graft.enableChangeDataFeed" -> "true",
        "graft.enableDeletionVectors" -> "true"), ifNotExists = false)
    t.append(docs.filter(col("doc_id") % 2 === 0)
      .repartition(1).sortWithinPartitions("doc_id")) // v1: ids 0..nEven-1
    t.append(docs.filter(col("doc_id") % 2 === 1)
      .repartition(1).sortWithinPartitions("doc_id")) // v2: continues
    t.update(col("doc_id") % 10 === 0,
      Map("source" -> concat(col("source"), lit("!")))) // v3: DV sidecar
    t.delete(col("doc_id") % 7 === 0) // v4: DV sidecar, post-update values
    t.changes(0).select("_row_id", "doc_id", "source", "_change_type")
  }

  /** In-commit timestamps: timestamp time travel against a SKEWED writer
    * clock. Commit timestamps live in the CommitInfo action and are
    * clamped to strictly increase (`max(clock, last+1)` — Delta's
    * `inCommitTimestamp` discipline, inherent here), so when the odd-keys
    * append arrives with its wall clock 5 s BEHIND the even-keys commit,
    * its timestamp lands one past the previous commit and
    * `timestampAsOf(T1)` still resolves to exactly the even-keys version.
    * An engine trusting raw clocks (or file mtimes, as pre-ICT Delta)
    * would include the backdated odd rows. The injected clock makes the
    * whole sequence deterministic; a later DELETE proves the probe reads
    * history, not the live state. */
  def inCommitTimestamp(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val t = LakeTable.create(spark, scratch("ict"), orders.schema,
      properties = Map("delta.enableInCommitTimestamps" -> "true"),
      ifNotExists = false)
    val t0 = t.log.snapshot().commits.last.timestamp
    val T1 = t0 + 10000L
    t.clockMillis = () => T1
    t.append(orders.filter(col("o_orderkey") % 2 === 0)) // v1 @ T1
    t.clockMillis = () => T1 - 5000L // writer clock skewed BACKWARD
    t.append(orders.filter(col("o_orderkey") % 2 === 1)) // v2: clamps to T1+1
    t.clockMillis = () => T1 + 20000L
    t.delete(col("o_custkey") % 3 === 0) // v3: live state differs from T1
    t.timestampAsOf(T1) // resolves v1: evens only, pre-delete
  }

  // ------------------------------------------------------------ oracles

  private val ordersCols =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

  val oracles: Map[String, String] = Map(
    "q97_cdf_row_ids" ->
      """WITH ids AS (
           SELECT doc_id, source,
                  CAST(row_number() OVER (ORDER BY doc_id % 2, doc_id) - 1
                       AS BIGINT) AS _row_id
           FROM documents)
         SELECT _row_id, doc_id, source, 'insert' AS _change_type FROM ids
         UNION ALL
         SELECT _row_id, doc_id, source, 'update_preimage' FROM ids
         WHERE doc_id % 10 = 0
         UNION ALL
         SELECT _row_id, doc_id, source || '!', 'update_postimage' FROM ids
         WHERE doc_id % 10 = 0
         UNION ALL
         SELECT _row_id, doc_id,
                CASE WHEN doc_id % 10 = 0 THEN source || '!' ELSE source END,
                'delete'
         FROM ids WHERE doc_id % 7 = 0""",
    "q96_in_commit_timestamp" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 2 = 0""",
    "q95_type_widening" ->
      """SELECT o_orderkey,
           CAST(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey
                     ELSE o_custkey + 3000000000 END
                + CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS BIGINT) AS val,
           CAST(CAST(o_custkey % 1024 AS REAL) AS DOUBLE) AS ratio
         FROM orders""",
    "q94_row_tracking" ->
      """WITH ids AS (
           SELECT doc_id, source,
                  CAST(row_number() OVER (ORDER BY doc_id % 2, doc_id) - 1
                       AS BIGINT) AS _row_id,
                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END
                       AS BIGINT) AS _row_commit_version
           FROM documents)
         SELECT _row_id, _row_commit_version, doc_id, source
         FROM ids WHERE doc_id % 7 <> 0""",
    "q54_bloom_lookup" ->
      """SELECT * FROM orders WHERE o_orderkey IN (32, 4000, 9988, 14977)
         ORDER BY o_orderkey""",
    "q9_merge_upsert" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0""",
    "q59_sql_merge" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority
          FROM orders
          WHERE (o_orderkey % 3 <> 0 AND o_orderkey % 2 <> 0)
             OR (o_orderkey % 3 <> 0 AND o_orderkey % 2 = 0 AND o_totalprice + 1000.0 <= 400000.0)
             OR (o_orderkey % 3 = 0 AND o_orderkey % 2 = 0)""",
    "q60_stream_upsert" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 2000.0
               WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
               ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority
          FROM orders
          WHERE (o_orderkey % 4 = 0)
             OR (o_orderkey % 2 = 0 AND o_orderkey % 10 <> 0)
             OR (o_orderkey % 2 <> 0 AND o_orderkey % 3 <> 0)""",
    "q44_merge_full_sync" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          o_orderdate,
          CASE WHEN o_orderkey % 2 <> 0 AND o_orderstatus = 'O' THEN '5-LOW'
               ELSE o_orderpriority END AS o_orderpriority
          FROM orders
          WHERE o_orderkey % 2 = 0 OR o_orderstatus = 'O' OR o_totalprice >= 50000.0""",
    "q10_update" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.05 ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority FROM orders""",
    "q11_delete" ->
      s"""SELECT $ordersCols FROM orders
          WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)""",
    "q12_time_travel" ->
      s"""SELECT $ordersCols FROM orders WHERE o_orderkey % 2 = 0""",
    "q43_dv_delete" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
            CASE WHEN o_totalprice >= 500000.0 THEN '5-LOW' ELSE o_orderpriority END AS o_orderpriority
          FROM orders
          WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000.0)
            AND NOT (o_orderpriority = '1-URGENT' AND o_totalprice >= 400000.0)""",
    "q13_restore" ->
      s"""SELECT $ordersCols FROM orders""",
    "q14_cdf_update" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         'update_preimage' AS _change_type FROM customer WHERE c_custkey % 5 = 0
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0, c_mktsegment,
         'update_postimage' FROM customer WHERE c_custkey % 5 = 0""",
    "q15_replace_where" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 5.0 ELSE o_totalprice END AS o_totalprice,
          o_orderdate, o_orderpriority FROM orders""",
    "q16_zorder_identity" ->
      """SELECT * FROM lineitem""",
    "q70_hilbert_identity" ->
      """SELECT * FROM lineitem""",
    "q76_cluster_incremental" ->
      """SELECT * FROM orders""",
    "q17_scd2" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         TIMESTAMP '2026-01-01 00:00:00' AS effective_start,
         CAST(NULL AS TIMESTAMP) AS effective_end, TRUE AS is_current
         FROM customer WHERE c_custkey % 4 <> 0
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-02-01 00:00:00', FALSE
         FROM customer WHERE c_custkey % 4 = 0
         UNION ALL
         SELECT c_custkey, c_name, c_nationkey, c_acctbal + 50.0, c_mktsegment,
         TIMESTAMP '2026-02-01 00:00:00', NULL, TRUE
         FROM customer WHERE c_custkey % 4 = 0
         UNION ALL
         SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment,
         TIMESTAMP '2026-02-01 00:00:00', NULL, TRUE
         FROM customer WHERE c_custkey % 4 = 1""")
}

package graft.migrate

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.LakeTable

/** Randomized FOREIGN-writer Iceberg lifecycles vs a plain-Scala model:
  * a sequence of hand-published snapshots (random live sets + random
  * position-delete masks, spec-faithful Avro + metadata JSON authored
  * here), an arbitrary convert point, then syncs at arbitrary later
  * snapshots — the graft live set, record counts, masks, and content
  * must equal the model at every stop. Syncs deliberately SKIP
  * intermediate snapshots (the net-difference shape must not care). */
class IcebergSyncFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val jackson = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }
  private def json(v: Any): String = jackson.writeValueAsString(v)

  private val listSchema = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"partition_spec_id","type":"int"},
      {"name":"content","type":"int"},
      {"name":"sequence_number","type":"long"},
      {"name":"min_sequence_number","type":"long"},
      {"name":"added_snapshot_id","type":"long"}]}""")
  private val entrySchema = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{
        "type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"partition","type":{
            "type":"record","name":"r102","fields":[]}},
          {"name":"record_count","type":"long"},
          {"name":"file_size_in_bytes","type":"long"}]}}]}""")

  private def writeAvro(target: Path, schema: org.apache.avro.Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, target.toFile)
    try rows.foreach(w.append) finally w.close()
  }

  test("randomized foreign snapshots with arbitrary convert/sync points " +
    "match the model's live set, masks, and content") {
    val rnd = new scala.util.Random(20260816L)
    (0 until 3).foreach { trial =>
      val dir = tmpDir(s"iceberg-fuzz-$trial").resolve("t")
      Files.createDirectories(dir)
      val metaDir = dir.resolve("metadata")
      Files.createDirectories(metaDir)
      // pool: file k holds ids [k*10, k*10+10)
      val contents: Map[String, Seq[Long]] = (0 until 8).map { k =>
        s"f$k.parquet" -> (k * 10L until k * 10L + 10).toSeq
      }.toMap
      contents.foreach { case (name, ids) =>
        val staging = Files.createTempDirectory("iceberg-fuzz-stage")
        ids.toDF("id").coalesce(1)
          .write.mode("overwrite").parquet(staging.resolve("out").toString)
        val part = {
          val s = Files.list(staging.resolve("out"))
          try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
          finally s.close()
        }
        Files.move(part, dir.resolve(name))
        graft.log.TxLog.deleteRecursively(staging)
      }
      // model: live set + per-file masked row positions
      val live = mutable.LinkedHashSet.empty[String]
      val masked = mutable.Map.empty[String, Set[Long]]
      var version = 0L
      def mutate(): Unit = {
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(4) match {
            case 0 if live.size > 1 =>
              val name = live.toSeq(rnd.nextInt(live.size))
              live.remove(name); masked.remove(name): Unit
            case 1 if live.nonEmpty => // (re)mask a live file
              val name = live.toSeq(rnd.nextInt(live.size))
              val m = (0 until 10).filter(_ => rnd.nextBoolean()).map(_.toLong).toSet
              if (m.size < 10) { // a fully-masked file still has rows=0, fine
                if (m.isEmpty) masked.remove(name) else masked(name) = m
              }: Unit
            case 2 if masked.nonEmpty => // purge one mask
              masked.remove(masked.keys.toSeq(rnd.nextInt(masked.size))): Unit
            case _ => // add a pool file
              live.add(contents.keys.toSeq(rnd.nextInt(contents.size))): Unit
          }
        }
        if (live.isEmpty) live.add("f0.parquet"): Unit
      }
      /** Publish the model state as the next foreign snapshot. */
      def publish(): Unit = {
        version += 1
        val seq = version
        val mData = metaDir.resolve(s"m-$seq.avro")
        writeAvro(mData, entrySchema, live.toSeq.map { name =>
          val dfs = entrySchema.getField("data_file").schema()
          val d = new GenericData.Record(dfs)
          d.put("content", 0)
          d.put("file_path", dir.resolve(name).toString)
          d.put("file_format", "PARQUET")
          d.put("partition",
            new GenericData.Record(dfs.getField("partition").schema()))
          d.put("record_count", contents(name).size.toLong)
          d.put("file_size_in_bytes", Files.size(dir.resolve(name)))
          val e = new GenericData.Record(entrySchema)
          e.put("status", 1)
          e.put("data_file", d)
          e
        })
        val liveMasks = masked.toSeq.filter { case (n, _) => live.contains(n) }
        val deleteManifest: Option[Path] =
          if (liveMasks.isEmpty) None
          else {
            val rows = liveMasks.flatMap { case (n, ps) =>
              ps.toSeq.map(p => (dir.resolve(n).toString, p)) }
            val staging = Files.createTempDirectory("iceberg-fuzz-del")
            rows.toDF("file_path", "pos").coalesce(1)
              .write.mode("overwrite").parquet(staging.resolve("out").toString)
            val part = {
              val s = Files.list(staging.resolve("out"))
              try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
              finally s.close()
            }
            val del = metaDir.resolve(s"del-$seq.parquet")
            Files.move(part, del)
            graft.log.TxLog.deleteRecursively(staging)
            val mDel = metaDir.resolve(s"m-del-$seq.avro")
            val dfs = entrySchema.getField("data_file").schema()
            val d = new GenericData.Record(dfs)
            d.put("content", 1)
            d.put("file_path", del.toString)
            d.put("file_format", "PARQUET")
            d.put("partition",
              new GenericData.Record(dfs.getField("partition").schema()))
            d.put("record_count", rows.size.toLong)
            d.put("file_size_in_bytes", Files.size(del))
            val e = new GenericData.Record(entrySchema)
            e.put("status", 1)
            e.put("data_file", d)
            writeAvro(mDel, entrySchema, Seq(e))
            Some(mDel)
          }
        val listPath = metaDir.resolve(s"snap-$seq.avro")
        def row(p: Path, content: Int): GenericRecord = {
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", p.toString)
          r.put("manifest_length", Files.size(p))
          r.put("partition_spec_id", 0)
          r.put("content", content)
          r.put("sequence_number", seq)
          r.put("min_sequence_number", seq)
          r.put("added_snapshot_id", 1000 + seq)
          r
        }
        writeAvro(listPath, listSchema,
          Seq(row(mData, 0)) ++ deleteManifest.map(row(_, 1)))
        Files.write(metaDir.resolve(s"v$version.metadata.json"), json(Map(
          "format-version" -> 2,
          "table-uuid" -> "fuzz-0000",
          "location" -> dir.toString,
          "last-sequence-number" -> seq,
          "last-updated-ms" -> 1700000000000L,
          "last-column-id" -> 1,
          "current-schema-id" -> 0,
          "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
            "fields" -> Seq(Map("id" -> 1, "name" -> "id",
              "required" -> false, "type" -> "long")))),
          "default-spec-id" -> 0,
          "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
          "last-partition-id" -> 999,
          "default-sort-order-id" -> 0,
          "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
          "properties" -> Map.empty,
          "current-snapshot-id" -> (1000 + seq),
          "snapshots" -> Seq(Map(
            "snapshot-id" -> (1000 + seq), "timestamp-ms" -> 1700000000000L,
            "sequence-number" -> seq, "schema-id" -> 0,
            "summary" -> Map.empty,
            "manifest-list" -> listPath.toString)),
          "snapshot-log" -> Nil, "metadata-log" -> Nil))
          .getBytes(StandardCharsets.UTF_8))
        Files.write(metaDir.resolve("version-hint.text"),
          version.toString.getBytes(StandardCharsets.UTF_8)): Unit
      }
      def check(stage: String): Unit = {
        val t = LakeTable.forPath(spark, dir.toString)
        val snap = t.snapshot()
        def expectedIds(name: String): Seq[Long] = {
          val m = masked.getOrElse(name, Set.empty)
          contents(name).zipWithIndex.collect {
            case (id, i) if !m.contains(i.toLong) => id }
        }
        withClue(s"trial=$trial stage=$stage live=$live masked=$masked: ") {
          snap.files.map(_.path).toSet shouldBe live.toSet
          snap.dvs.values.map(_.numDeleted).sum shouldBe
            live.toSeq.map(n => masked.getOrElse(n, Set.empty).size.toLong).sum
          val got = t.read().agg(coalesce(sum("id"), lit(0L))).head().getLong(0)
          got shouldBe live.toSeq.flatMap(expectedIds).sum
        }
      }

      mutate(); publish()
      val preConvert = 1 + rnd.nextInt(2)
      (0 until preConvert).foreach { _ => mutate(); publish() }
      LakeTable.convert(spark, dir.toString)
      check("convert")
      // the source keeps publishing; sync at random points (skipping
      // intermediate snapshots is the norm, not the exception)
      (0 until 3).foreach { round =>
        (0 until 1 + rnd.nextInt(2)).foreach { _ => mutate(); publish() }
        IcebergImport.sync(spark, dir.toString)
        check(s"sync-$round")
      }
      // replayed sync is a no-op
      val v = LakeTable.forPath(spark, dir.toString).version
      IcebergImport.sync(spark, dir.toString) shouldBe v
      check("re-sync")
    }
  }

  /** Entry schema with equality_ids and an optional explicit entry-level
    * sequence number — the rewrite-fuzz shape (r13, extended r14 for
    * compaction-born EXISTING entries). */
  private val eqEntrySchema = new org.apache.avro.Schema.Parser().parse("""{
    "type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"sequence_number","type":["null","long"],"default":null},
      {"name":"data_file","type":{
        "type":"record","name":"r2","fields":[
          {"name":"content","type":"int"},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"partition","type":{
            "type":"record","name":"r102","fields":[]}},
          {"name":"record_count","type":"long"},
          {"name":"file_size_in_bytes","type":"long"},
          {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""")

  test("randomized sequence-interleaved equality + position deletes " +
    "rewrite-import to exactly the model's surviving rows (r13)") {
    val rnd = new scala.util.Random(20260817L)
    (0 until 4).foreach { trial =>
      val dir = tmpDir(s"iceberg-eqfuzz-$trial").resolve("t")
      Files.createDirectories(dir)
      val metaDir = dir.resolve("metadata")
      Files.createDirectories(metaDir)
      def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", id).build()
      def writeOne(target: Path, df: org.apache.spark.sql.DataFrame): Unit = {
        val staging = Files.createTempDirectory("iceberg-eqfuzz-stage")
        df.coalesce(1).write.mode("overwrite")
          .parquet(staging.resolve("out").toString)
        val part = {
          val s = Files.list(staging.resolve("out"))
          try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
          finally s.close()
        }
        Files.move(part, target)
        graft.log.TxLog.deleteRecursively(staging): Unit
      }
      // data files: random seqs, disjoint id slices (order inside a file
      // is the written order — position deletes index into it)
      val nFiles = 3 + rnd.nextInt(3)
      val dataFiles: Seq[(String, Seq[Long], Long)] = (0 until nFiles).map {
        k => (s"f$k.parquet", (k * 10L until k * 10L + 10).toSeq,
          1L + rnd.nextInt(5)) }
      dataFiles.foreach { case (name, ids, _) =>
        writeOne(dir.resolve(name),
          ids.toDF("id0").select(col("id0").as("id", fid(1)))) }
      // equality deletes: random key sets at random seqs; alternate
      // with/without footer field ids (both resolution paths)
      val nEq = 1 + rnd.nextInt(3)
      val eqDels: Seq[(String, Set[Long], Long)] = (0 until nEq).map { j =>
        val keys = (0 until nFiles * 10)
          .filter(_ => rnd.nextInt(4) == 0).map(_.toLong).toSet + 1L
        (s"eq$j.parquet", keys, 1L + rnd.nextInt(6))
      }
      eqDels.zipWithIndex.foreach { case ((name, keys, _), j) =>
        val df0 = keys.toSeq.toDF("id0")
        val df = if (j % 2 == 0) df0.select(col("id0").as("id", fid(1)))
          else df0.select(col("id0").as("id"))
        writeOne(metaDir.resolve(name), df) }
      // one position delete file at a random seq (path-specific — applies
      // regardless of sequence in this importer, like real paths do)
      val posTargets: Seq[(String, Long)] = dataFiles
        .filter(_ => rnd.nextBoolean())
        .map { case (name, _, _) => (name, rnd.nextInt(10).toLong) }
      if (posTargets.nonEmpty)
        writeOne(metaDir.resolve("posdel.parquet"),
          posTargets.map { case (n, p) => (dir.resolve(n).toString, p) }
            .toDF("file_path", "pos"))
      // manifests: one per data file (its own seq), one per delete
      def mk(name: String, content: Int, path: Path, count: Long,
          eqIds: Seq[Int]): Path = {
        val dfs = eqEntrySchema.getField("data_file").schema()
        val d = new GenericData.Record(dfs)
        d.put("content", content)
        d.put("file_path", path.toString)
        d.put("file_format", "PARQUET")
        d.put("partition",
          new GenericData.Record(dfs.getField("partition").schema()))
        d.put("record_count", count)
        d.put("file_size_in_bytes", Files.size(path))
        if (eqIds.nonEmpty)
          d.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
        val e = new GenericData.Record(eqEntrySchema)
        e.put("status", 1)
        e.put("data_file", d)
        val m = metaDir.resolve(name)
        writeAvro(m, eqEntrySchema, Seq(e))
        m
      }
      val manifests: Seq[(Path, Int, Long)] =
        dataFiles.map { case (n, ids, seq) =>
          (mk(s"m-$n.avro", 0, dir.resolve(n), ids.size.toLong, Nil), 0, seq)
        } ++ eqDels.map { case (n, keys, seq) =>
          (mk(s"m-$n.avro", 2, metaDir.resolve(n), keys.size.toLong, Seq(1)),
            1, seq)
        } ++ (if (posTargets.isEmpty) Nil else Seq(
          (mk("m-pos.avro", 1, metaDir.resolve("posdel.parquet"),
            posTargets.size.toLong, Nil), 1, 6L)))
      val listPath = metaDir.resolve("snap-1.avro")
      writeAvro(listPath, listSchema, manifests.map { case (p, content, seq) =>
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", p.toString)
        r.put("manifest_length", Files.size(p))
        r.put("partition_spec_id", 0)
        r.put("content", content)
        r.put("sequence_number", seq)
        r.put("min_sequence_number", seq)
        r.put("added_snapshot_id", 1001L)
        r
      })
      Files.write(metaDir.resolve("v1.metadata.json"), json(Map(
        "format-version" -> 2, "table-uuid" -> s"eqfuzz-$trial",
        "location" -> dir.toString,
        "last-sequence-number" -> 6, "last-updated-ms" -> 1700000000000L,
        "last-column-id" -> 1, "current-schema-id" -> 0,
        "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
          "fields" -> Seq(Map("id" -> 1, "name" -> "id",
            "required" -> false, "type" -> "long")))),
        "default-spec-id" -> 0,
        "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
        "last-partition-id" -> 999, "default-sort-order-id" -> 0,
        "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
        "properties" -> Map.empty, "current-snapshot-id" -> 1001,
        "snapshots" -> Seq(Map(
          "snapshot-id" -> 1001, "timestamp-ms" -> 1700000000000L,
          "sequence-number" -> 6, "schema-id" -> 0,
          "summary" -> Map.empty, "manifest-list" -> listPath.toString)),
        "snapshot-log" -> Nil, "metadata-log" -> Nil))
        .getBytes(StandardCharsets.UTF_8))
      Files.write(metaDir.resolve("version-hint.text"),
        "1".getBytes(StandardCharsets.UTF_8))

      // model: a row survives unless position-deleted, or equality-
      // deleted by a delete with a STRICTLY larger sequence
      val posSet = posTargets.toSet
      val expected: Seq[Long] = dataFiles.flatMap { case (name, ids, dseq) =>
        ids.zipWithIndex.collect {
          case (id, pos) if !posSet.contains((name, pos.toLong)) &&
            !eqDels.exists { case (_, keys, eseq) =>
              keys.contains(id) && dseq < eseq } => id
        }
      }
      val dest = tmpDir(s"iceberg-eqfuzz-$trial").resolve("dest").toString
      val t = IcebergImport.convertRewrite(spark, dir.toString, dest)
      withClue(s"trial=$trial files=$dataFiles eq=$eqDels pos=$posTargets: ") {
        t.read().select("id").as[Long].collect().sorted.toSeq shouldBe
          expected.sorted
      }
    }
  }

  test("randomized followable-rewrite lifecycles — appends, removes, " +
    "compactions keeping old sequence numbers, equality and position " +
    "deletes at arbitrary sync points — match the model's surviving rows") {
    val rnd = new scala.util.Random(20260818L)
    (0 until 3).foreach { trial =>
      val dir = tmpDir(s"iceberg-rwfuzz-$trial").resolve("t")
      Files.createDirectories(dir)
      val metaDir = dir.resolve("metadata")
      Files.createDirectories(metaDir)
      def fid(id: Long) = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", id).build()
      def writeOne(target: Path, df: org.apache.spark.sql.DataFrame): Unit = {
        val staging = Files.createTempDirectory("iceberg-rwfuzz-stage")
        df.coalesce(1).write.mode("overwrite")
          .parquet(staging.resolve("out").toString)
        val part = {
          val s = Files.list(staging.resolve("out"))
          try s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
          finally s.close()
        }
        Files.move(part, target)
        graft.log.TxLog.deleteRecursively(staging): Unit
      }
      def idFile(target: Path, ids: Seq[Long]): Unit =
        writeOne(target, ids.toDF("id0").select(col("id0").as("id", fid(1))))

      // ---- model: live files (ids in written order + data seq), masked
      // positions per live file, all equality deletes ever published ----
      val live = mutable.LinkedHashMap.empty[String, (Seq[Long], Long)]
      val posMasks = mutable.Map.empty[String, Set[Long]]
        .withDefaultValue(Set.empty)
      // (delete-file name, keys, seq) — delete files stay in the manifests
      val eqDels = mutable.ArrayBuffer.empty[(String, Set[Long], Long)]
      // pos-delete files currently in the manifests: name -> target file
      val posDelFiles = mutable.LinkedHashMap.empty[String, String]
      var seq = 0L
      var version = 0L
      var nextId = 0L
      var nFile = 0
      def mutate(): Unit = {
        seq += 1 // every publish is one foreign snapshot at this seq
        (0 until rnd.nextInt(3)).foreach { _ =>
          rnd.nextInt(6) match {
            case 0 => // append a new data file
              val name = s"f$nFile.parquet"; nFile += 1
              val ids = (nextId until nextId + 5).toSeq; nextId += 5
              idFile(dir.resolve(name), ids)
              live(name) = (ids, seq)
            case 1 if live.size > 1 => // copy-on-write remove
              val name = live.keys.toSeq(rnd.nextInt(live.size))
              live.remove(name); posMasks.remove(name)
              posDelFiles.filterInPlace((_, tgt) => tgt != name): Unit
            case 2 if live.nonEmpty => // compaction: new path, OLD seq,
              // position deletes applied by the compactor, eq deletes NOT
              val name = live.keys.toSeq(rnd.nextInt(live.size))
              val (ids, fseq) = live(name)
              val kept = ids.zipWithIndex.collect {
                case (id, p) if !posMasks(name)(p.toLong) => id }
              val cname = s"c$nFile.parquet"; nFile += 1
              idFile(dir.resolve(cname), kept)
              live.remove(name); posMasks.remove(name)
              posDelFiles.filterInPlace((_, tgt) => tgt != name)
              live(cname) = (kept, fseq)
            case 3 if live.nonEmpty => // new position-delete file
              val name = live.keys.toSeq(rnd.nextInt(live.size))
              val fresh = (0 until live(name)._1.size)
                .filter(_ => rnd.nextInt(4) == 0).map(_.toLong).toSet --
                posMasks(name)
              if (fresh.nonEmpty) {
                val dname = s"pd$nFile.parquet"; nFile += 1
                writeOne(metaDir.resolve(dname), fresh.toSeq.sorted
                  .map(p => (dir.resolve(name).toString, p))
                  .toDF("file_path", "pos"))
                posDelFiles(dname) = name
                posMasks(name) = posMasks(name) ++ fresh
              }: Unit
            case 4 if eqDels.nonEmpty => // DELETE-FILE compaction: a new
              // path carrying the OLD sequence — the shape whose ungated
              // re-application over-deleted re-inserted keys (review r14)
              val j = rnd.nextInt(eqDels.size)
              val (_, keys, eseq) = eqDels(j)
              val cname = s"eqc$nFile.parquet"; nFile += 1
              idFile(metaDir.resolve(cname), keys.toSeq.sorted)
              eqDels(j) = ((cname, keys, eseq))
            case _ => // new equality delete (table-wide: unpartitioned)
              val keys = (0L until nextId)
                .filter(_ => rnd.nextInt(6) == 0).toSet
              if (keys.nonEmpty) {
                val dname = s"eq$nFile.parquet"; nFile += 1
                idFile(metaDir.resolve(dname), keys.toSeq.sorted)
                eqDels += ((dname, keys, seq))
              }: Unit
          }
        }
        if (live.isEmpty) {
          val name = s"f$nFile.parquet"; nFile += 1
          val ids = (nextId until nextId + 5).toSeq; nextId += 5
          idFile(dir.resolve(name), ids)
          live(name) = (ids, seq)
        }
      }
      def publish(): Unit = {
        version += 1
        def mk(name: String, content: Int, path: Path, count: Long,
            eqIds: Seq[Int], entrySeq: Long, status: Int): Path = {
          val dfs = eqEntrySchema.getField("data_file").schema()
          val d = new GenericData.Record(dfs)
          d.put("content", content)
          d.put("file_path", path.toString)
          d.put("file_format", "PARQUET")
          d.put("partition",
            new GenericData.Record(dfs.getField("partition").schema()))
          d.put("record_count", count)
          d.put("file_size_in_bytes", Files.size(path))
          if (eqIds.nonEmpty)
            d.put("equality_ids", eqIds.map(Integer.valueOf).asJava)
          val e = new GenericData.Record(eqEntrySchema)
          e.put("status", status)
          e.put("sequence_number", java.lang.Long.valueOf(entrySeq))
          e.put("data_file", d)
          val m = metaDir.resolve(name)
          writeAvro(m, eqEntrySchema, Seq(e))
          m
        }
        // every entry carries its EXPLICIT data sequence (the compaction
        // shape); manifest-level seq is the publish seq
        val manifests: Seq[(Path, Int, Long)] =
          live.toSeq.zipWithIndex.map { case ((n, (ids, fseq)), i) =>
            (mk(s"m-$version-d$i.avro", 0, dir.resolve(n), ids.size.toLong,
              Nil, fseq, if (fseq < seq) 0 else 1), 0, fseq)
          } ++ eqDels.toSeq.zipWithIndex.map { case ((n, keys, eseq), i) =>
            (mk(s"m-$version-e$i.avro", 2, metaDir.resolve(n),
              keys.size.toLong, Seq(1), eseq, 1), 1, eseq)
          } ++ posDelFiles.keys.toSeq.zipWithIndex.map { case (n, i) =>
            (mk(s"m-$version-p$i.avro", 1, metaDir.resolve(n), 1L, Nil,
              seq, 1), 1, seq)
          }
        val listPath = metaDir.resolve(s"snap-$version.avro")
        writeAvro(listPath, listSchema, manifests.map { case (p, content, s0) =>
          val r = new GenericData.Record(listSchema)
          r.put("manifest_path", p.toString)
          r.put("manifest_length", Files.size(p))
          r.put("partition_spec_id", 0)
          r.put("content", content)
          r.put("sequence_number", s0)
          r.put("min_sequence_number", s0)
          r.put("added_snapshot_id", 1000 + version)
          r
        })
        Files.write(metaDir.resolve(s"v$version.metadata.json"), json(Map(
          "format-version" -> 2, "table-uuid" -> s"rwfuzz-$trial",
          "location" -> dir.toString,
          "last-sequence-number" -> seq, "last-updated-ms" -> 1700000000000L,
          "last-column-id" -> 1, "current-schema-id" -> 0,
          "schemas" -> Seq(Map("type" -> "struct", "schema-id" -> 0,
            "fields" -> Seq(Map("id" -> 1, "name" -> "id",
              "required" -> false, "type" -> "long")))),
          "default-spec-id" -> 0,
          "partition-specs" -> Seq(Map("spec-id" -> 0, "fields" -> Nil)),
          "last-partition-id" -> 999, "default-sort-order-id" -> 0,
          "sort-orders" -> Seq(Map("order-id" -> 0, "fields" -> Nil)),
          "properties" -> Map.empty, "current-snapshot-id" -> (1000 + version),
          "snapshots" -> Seq(Map(
            "snapshot-id" -> (1000 + version),
            "timestamp-ms" -> 1700000000000L,
            "sequence-number" -> seq, "schema-id" -> 0,
            "summary" -> Map.empty, "manifest-list" -> listPath.toString)),
          "snapshot-log" -> Nil, "metadata-log" -> Nil))
          .getBytes(StandardCharsets.UTF_8))
        Files.write(metaDir.resolve("version-hint.text"),
          version.toString.getBytes(StandardCharsets.UTF_8)): Unit
      }
      def expected(): Seq[Long] = live.toSeq.flatMap { case (n, (ids, fseq)) =>
        ids.zipWithIndex.collect {
          case (id, p) if !posMasks(n)(p.toLong) &&
            !eqDels.exists { case (_, keys, eseq) =>
              keys.contains(id) && fseq < eseq } => id
        }
      }
      def check(dest: String, stage: String): Unit =
        withClue(s"trial=$trial stage=$stage live=$live masks=$posMasks " +
          s"eq=${eqDels.map(d => (d._2, d._3))}: ") {
          LakeTable.forPath(spark, dest).read()
            .select("id").as[Long].collect().sorted.toSeq shouldBe
            expected().sorted
        }

      mutate(); publish()
      val dest = tmpDir(s"iceberg-rwfuzz-$trial").resolve("dest").toString
      IcebergImport.convertRewrite(spark, dir.toString, dest, follow = true)
      check(dest, "import")
      (0 until 3).foreach { round =>
        // 1-2 foreign snapshots per sync (skipping snapshots is the norm)
        (0 until 1 + rnd.nextInt(2)).foreach { _ => mutate(); publish() }
        IcebergImport.syncRewrite(spark, dir.toString, dest)
        check(dest, s"sync-$round")
      }
      val v = LakeTable.forPath(spark, dest).version
      IcebergImport.syncRewrite(spark, dir.toString, dest) shouldBe v
      check(dest, "re-sync")
    }
  }
}

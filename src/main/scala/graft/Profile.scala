package graft

/** Ad-hoc stage profiler for one SparkEntry query: times sub-plan variants
  * to localize a slow stage. Dev tool, not part of the driver contract.
  * Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def timed(label: String)(f: => Any): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("cluster")) {
      // decompose the 2-d cluster rewrite: key expression vs shuffle vs
      // write, z-order vs hilbert (r14: bench hilbert_sec ran 7.5x
      // zorder_sec on the same data)
      import graft.table.LakeTable
      val li = graft.core.Tables.lineitem(spark, sfDir)
      val li4 = li.union(li).union(li).union(li)
      val liBig = li4.union(li4).union(li4).union(li4)
      liBig.count(): Unit
      def tmp(n: String) = java.nio.file.Files
        .createTempDirectory(s"pc-$n").resolve("t").toString
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      (1 to 2).foreach { i =>
        val tz = LakeTable.createFrom(spark, tmp(s"z$i"), liBig)
        timed(s"#$i optimizeZOrder 2d")(
          tz.optimizeZOrder(Seq("l_partkey", "l_suppkey"),
            targetFileSize = 16L * 1024 * 1024))
        val th = LakeTable.createFrom(spark, tmp(s"h$i"), liBig)
        timed(s"#$i optimizeHilbert 2d")(
          th.optimizeHilbert(Seq("l_partkey", "l_suppkey"),
            targetFileSize = 16L * 1024 * 1024))
        val tk = LakeTable.createFrom(spark, tmp(s"k$i"), liBig)
        val df = tk.read()
        val typed = Seq(col("l_partkey") -> df.schema("l_partkey").dataType,
          col("l_suppkey") -> df.schema("l_suppkey").dataType)
        timed(s"#$i zvalue noop")(
          noop(df.withColumn("__z", graft.table.ZOrder.zvalue(df, typed))))
        timed(s"#$i hvalue noop")(
          noop(df.withColumn("__z", graft.table.ZOrder.hvalue(df, typed))))
        timed(s"#$i zvalue rangepartition noop")(
          noop(df.withColumn("__z", graft.table.ZOrder.zvalue(df, typed))
            .repartitionByRange(12, col("__z")).sortWithinPartitions("__z")))
        timed(s"#$i hvalue rangepartition noop")(
          noop(df.withColumn("__z", graft.table.ZOrder.hvalue(df, typed))
            .repartitionByRange(12, col("__z")).sortWithinPartitions("__z")))
      }
      spark.stop(); return
    }
    if (args.contains("merge")) { profileMerge(spark); spark.stop(); return }
    if (args.contains("skew")) { profileSkew(spark); spark.stop(); return }
    if (args.contains("bloom")) { profileBloom(spark, sfDir); spark.stop(); return }
    if (args.contains("jobs")) {
      // per-job wall attribution for named queries (r14 optimization):
      //   runMain graft.Profile /root/testdata/sf0.1 jobs q119 q109
      // Each query runs twice (rep1 = warmup); rep2's jobs print with their
      // callSite.short, so the slow step is directly a code line. The gap
      // between the jobs' summed wall and the query wall is driver-side
      // work (planning, log replay, commits, footer reads).
      val wanted = args.filter(a => a.startsWith("q") && a != "jobs")
      val sc = spark.sparkContext
      case class J(id: Long, site: String, start: Long, var end: Long = 0L)
      val jobs = new java.util.concurrent.ConcurrentHashMap[Long, J]()
      val order = new java.util.concurrent.ConcurrentLinkedQueue[J]()
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}
        override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
          case s: SparkListenerSQLExecutionStart =>
            // root executions only: sub-executions share the root's wall
            val j = J(s.executionId, s.description.takeWhile(_ != '\n'),
              System.nanoTime())
            jobs.put(s.executionId, j); order.add(j): Unit
          case en: SparkListenerSQLExecutionEnd =>
            Option(jobs.get(en.executionId)).foreach(_.end = System.nanoTime())
          case _ =>
        }
      })
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int, Long, Long)]()
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(0L)
          stages.add((i.name.takeWhile(_ != '\n'), wall, i.numTasks,
            i.taskMetrics.executorRunTime,
            i.taskMetrics.shuffleWriteMetrics.bytesWritten +
              i.taskMetrics.shuffleReadMetrics.totalBytesRead)): Unit
        }
      })
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => wanted.exists(w => n == w || n.startsWith(w + "_")) }
        .foreach { case (n, fn) =>
          def rep(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          rep() // warmup
          Thread.sleep(500); jobs.clear(); order.clear(); stages.clear()
          val wall = rep()
          Thread.sleep(1000)
          import scala.jdk.CollectionConverters._
          val js = order.iterator().asScala.toSeq.filter(_.end > 0)
          val bySite = js.groupBy(_.site).map { case (s, g) =>
            (s, g.map(j => (j.end - j.start) / 1e6).sum, g.size) }
            .toSeq.sortBy(-_._2)
          println(f"==== $n wall=$wall%.2f s, ${js.size} jobs, " +
            f"job-sum=${js.map(j => (j.end - j.start) / 1e9).sum}%.2f s")
          bySite.take(25).foreach { case (site, ms, cnt) =>
            println(f"  ${ms}%9.0f ms  x$cnt%-4d $site") }
          val bySt = stages.iterator().asScala.toSeq.groupBy(_._1).map {
            case (s, g) => (s, g.map(_._2).sum, g.map(_._3).sum,
              g.map(_._4).sum, g.map(_._5).sum) }.toSeq.sortBy(-_._2)
          bySt.take(12).foreach { case (st, wallMs, tasks, run, shuf) =>
            println(f"    stage ${wallMs}%7d ms run=${run}%7d ms " +
              f"tasks=$tasks%-4d shufMB=${shuf / 1e6}%8.1f  $st") }
          spark.catalog.clearCache()
        }
      spark.stop(); return
    }
    if (args.contains("write")) {
      // decompose one table write: raw parquet vs stageWrite vs full create
      import graft.table.LakeTable
      val li = graft.core.Tables.lineitem(spark, sfDir)
      li.count(): Unit
      def tmp(n: String) = java.nio.file.Files
        .createTempDirectory(s"pw-$n").resolve("t").toString
      (1 to 3).foreach { i =>
        timed(s"#$i raw parquet write (600k rows)")(
          li.write.mode("overwrite").parquet(tmp(s"raw$i")))
        timed(s"#$i raw repartition(8) write")(
          li.repartition(8).write.mode("overwrite").parquet(tmp(s"rp$i")))
        timed(s"#$i LakeTable.createFrom")(
          LakeTable.createFrom(spark, tmp(s"cf$i"), li))
        val t = LakeTable.create(spark, tmp(s"ap$i"), li.schema)
        timed(s"#$i append to existing")(t.append(li))
      }
      spark.stop(); return
    }
    if (args.contains("ab")) {
      // interleaved A/B of one session conf across named queries:
      //   runMain graft.Profile <sfDir> ab spark.graft.read.spread q102 q17
      // Runs (A=false, B=true) rounds back-to-back in one JVM so host drift
      // cancels (the same discipline as Bench.abSpeedupPct).
      val confKey = args(args.indexOf("ab") + 1)
      val wanted = args.filter(a => a.startsWith("q") && a != confKey)
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => wanted.exists(w => n == w || n.startsWith(w + "_")) }
        .foreach { case (n, fn) =>
          def rep(v: Boolean): Double = {
            spark.conf.set(confKey, v.toString)
            val t0 = System.nanoTime()
            noop(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }
          rep(false); rep(true) // warm both shapes
          val rounds = (1 to 3).map { _ => (rep(false), rep(true)) }
          def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
          println(f"==== $n $confKey=false ${med(rounds.map(_._1))}%6.2f s   " +
            f"true ${med(rounds.map(_._2))}%6.2f s   " +
            f"(rounds ${rounds.map(r => f"${r._1}%.2f/${r._2}%.2f").mkString(" ")})")
          spark.catalog.clearCache()
        }
      spark.stop(); return
    }
    if (args.contains("explain")) {
      // shuffle audit for named queries (sfDir comes FIRST):
      //   runMain graft.Profile /root/testdata/sf0.01 explain q45 q46
      val wanted = args.filter(_.startsWith("q"))
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => wanted.isEmpty || wanted.exists(w => n.startsWith(w)) }
        .foreach { case (n, q) =>
          val plan = q(spark, sfDir).queryExecution.executedPlan.toString
          println(s"==== $n  exchanges=${"Exchange".r.findAllIn(plan).length}")
          println(plan.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Sort ") ||
              l.contains("Window"))
            .mkString("\n"))
        }
      spark.stop(); return
    }
    if (args.contains("fastplan")) {
      // shape of the low-shuffle merge's phase-2: does the left-outer
      // broadcast the persisted 1M-row source build side?
      import graft.table.LakeTable
      val n = sys.env.getOrElse("SPARK_GRAFT_N", "2000000").toLong
      val gen = spark.range(n)
        .withColumn("user_id", concat(lit("user_"), col("id") % 100000))
        .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
      val t = LakeTable.createFrom(spark,
        java.nio.file.Files.createTempDirectory("fp").resolve("t").toString, gen)
      val src = spark.range(0, n, 10)
        .withColumn("user_id", concat(lit("u_"), col("id")))
        .withColumn("amount", lit(java.math.BigDecimal.ONE).cast("decimal(18,2)"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      src.count()
      val lo = t.read().alias("target")
        .join(src.withColumn("__src", lit(true)).alias("source"),
          col("target.id") === col("source.id"), "left_outer")
      lo.explain("formatted")
      spark.stop(); return
    }
    if (args.contains("benchmerge")) {
      import graft.table.LakeTable
      val orders = graft.core.Tables.orders(spark, sfDir)
      val mt = LakeTable.createFrom(spark,
        java.nio.file.Files.createTempDirectory("bm").resolve("t").toString, orders)
      val src = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      timed("merge 10% run1")(
        mt.merge(src, col("target.o_orderkey") === col("source.o_orderkey"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
      timed("merge 10% run2")(
        mt.merge(src, col("target.o_orderkey") === col("source.o_orderkey"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
      timed("merge 10% run3")(
        mt.merge(src, col("target.o_orderkey") === col("source.o_orderkey"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
      // cost floor: the bare rewrite write
      timed("plain write same rows")(
        mt.read().write.mode("overwrite").parquet(
          java.nio.file.Files.createTempDirectory("bm-out").toString))
      spark.stop(); return
    }
    if (args.contains("ivf")) {
      // recall of trained IVF vs exact brute force per nprobe
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val emb = graft.core.Tables.embeddings(spark, sf)
        val qs = emb.filter(col("vec_id") >= 20 && col("vec_id") < 30)
        val exact = graft.similarity.Similarity.cosineTopK(emb, qs, k = 5)
          .select("query_id", "rank", "neighbor_id").collect().toSet
        val cents = graft.similarity.Similarity.trainCentroids(emb, nlist = 16)
        for (np <- Seq(4, 6, 8, 10, 12)) {
          val approx = graft.similarity.Similarity.ivfTopKTrained(emb, qs, 5, cents, nprobe = np)
            .select("query_id", "rank", "neighbor_id").collect().toSet
          println(s"$sf nprobe=$np identical=${approx == exact} overlap=${(approx & exact).size}/${exact.size}")
        }
      }
      spark.stop(); return
    }
    if (args.contains("simhash")) {
      // hamming distance distribution of simhash over exact near-dup pairs
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val docs = graft.core.Tables.documents(spark, sf)
        val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, blockCol = "source", minJaccard = 0.8)
        val sh = graft.dedup.Dedup.simhash(docs)
        val ham = pairs
          .join(sh.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
          .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
          .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        println(s"$sf: " + ham.agg(max("hamming"), avg("hamming"), count(lit(1))).collect().head)
        // and the hamming distribution for NON-dup pairs (J < 0.3 sample)
        val far = graft.dedup.Dedup.ngramJaccardPairs(docs, blockCol = "source", minJaccard = 0.0)
          .filter(col("jaccard") < 0.3).limit(20000)
        val farham = far
          .join(sh.select(col("doc_id").as("a"), col("simhash").as("ha")), "a")
          .join(sh.select(col("doc_id").as("b"), col("simhash").as("hb")), "b")
          .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        println(s"$sf far: " + farham.agg(min("hamming"), avg("hamming")).collect().head)
      }
      spark.stop(); return
    }

    def events = graft.core.Tables.events(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("warmup count")(events.count())
    timed("full-width read -> noop")(noop(events))
    timed("filter -> noop")(noop(events.filter(col("user_id").isNotNull &&
      col("ts").isNotNull && col("event_type").isNotNull)))
    timed("dropDuplicates(event_id) -> noop")(noop(events.dropDuplicates("event_id")))
    timed("full cleanEvents -> noop")(noop(
      graft.transform.Silver.cleanEvents(events).drop("ts")))
    timed("cleanEvents again (2nd run)")(noop(
      graft.transform.Silver.cleanEvents(events).drop("ts")))
    timed("cleanEvents without dedup")(noop(
      graft.transform.Silver.cleanEvents(events).drop("ts")))
    spark.stop()
  }

  /** Why is the skewed shuffle join > 2x the uniform one? */
  /** q54 stage breakdown: where does the bloom-lookup gate's time go —
    * table create, property commit, bloom-sidecar append, or the read? */
  def profileBloom(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.table.LakeTable
    val orders = graft.core.Tables.orders(spark, sfDir)
    orders.count(): Unit // warm the source read
    (1 to 3).foreach { rep =>
      val dir = java.nio.file.Files.createTempDirectory("pb").resolve("t").toString
      var t: LakeTable = null
      timed(s"rep$rep create") { t = LakeTable.create(spark, dir, orders.schema) }
      timed(s"rep$rep setProperties")(
        t.setProperties(Map("graft.bloomFilter.columns" -> "o_orderkey")))
      timed(s"rep$rep append+blooms")(
        t.append(orders.repartition(8, col("o_orderkey"))))
      timed(s"rep$rep append no-bloom")(
        t.append(orders.limit(0))) // commit-only overhead probe
      timed(s"rep$rep read isin")(
        t.read(Seq(col("o_orderkey").isin(32L, 4000L, 9988L, 14977L)))
          .orderBy("o_orderkey").collect())
    }
  }

  def profileSkew(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val n = 10000000L
    def fact(skewed: Boolean) = {
      val uid =
        if (skewed) when(col("id") % 2 === 0, lit("user_0"))
          .otherwise(concat(lit("user_"), col("id") % 100000))
        else concat(lit("user_"), col("id") % 100000)
      spark.range(n).withColumn("user_id", uid)
        .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
    }
    val dim = spark.range(100000)
      .withColumn("user_id", concat(lit("user_"), col("id")))
      .withColumn("segment", (col("id") % 17).cast("int"))
      .drop("id")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (thr <- Seq("16m", "16m", "8m", "4m", "2m")) {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", thr)
      for (skewed <- Seq(false, true)) {
        val df = fact(skewed).join(dim, "user_id").groupBy("segment").agg(sum("amount"))
        timed(s"join thr=$thr skewed=$skewed")(noop(df))
        if (skewed) {
          val plan = df.queryExecution.executedPlan.toString
          println(plan.linesIterator
            .filter(l => l.contains("AQEShuffleRead") || l.contains("SortMergeJoin") ||
              l.contains("ShuffledHashJoin") || l.contains("skewed"))
            .mkString("  ", "\n  ", ""))
        }
      }
    }
    // shuffled hash join instead of SMJ: no per-slice sort of the hot key
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    for (skewed <- Seq(false, true))
      timed(s"join SHJ skewed=$skewed")(
        noop(fact(skewed).join(dim, "user_id").groupBy("segment").agg(sum("amount"))))
  }

  /** Decompose the Strain merge into its constituent jobs. */
  def profileMerge(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import graft.table.LakeTable
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "5000000").toLong
    val gen = spark.range(n)
      .withColumn("user_id", concat(lit("user_"), col("id") % 100000))
      .withColumn("amount", (col("id") % 1000).cast("decimal(18,2)"))
      .withColumn("day", date_add(lit(java.sql.Date.valueOf("2024-01-01")), (col("id") % 30).cast("int")))
    val dir = java.nio.file.Files.createTempDirectory("pm").resolve("t").toString
    val t = LakeTable.create(spark, dir, gen.schema)
    timed("append 5M")(t.append(gen))
    println(f"table files=${t.snapshot().numFiles} " +
      f"scanPartitions=${t.read().rdd.getNumPartitions} " +
      f"bytes=${t.snapshot().files.map(_.size).sum / 1e6}%.1f MB")
    val src0 = spark.range(0, n, 10)
      .withColumn("user_id", concat(lit("u_"), col("id")))
      .withColumn("amount", lit(java.math.BigDecimal.valueOf(1)).cast("decimal(18,2)"))
      .withColumn("day", lit(java.sql.Date.valueOf("2024-02-01")))
    val src = src0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("src cache materialize (count)")(src.count())
    timed("src agg count+bounds only")(
      src.agg(count(lit(1)), min(col("id")), max(col("id"))).collect())
    timed("src agg +count_distinct(struct)")(
      src.agg(count(lit(1)), min(col("id")), max(col("id")),
        count_distinct(struct(col("id")))).collect())
    timed("src agg +count_distinct(col)")(
      src.agg(count(lit(1)), min(col("id")), max(col("id")),
        count_distinct(col("id"))).collect())
    val tgt = t.read().withColumn("__file", input_file_name())
      .withColumn("__prid", monotonically_increasing_id()).alias("target")
    timed("probe join+agg (full guard)")(
      tgt.join(src.alias("source"), col("target.id") === col("source.id"), "inner")
        .select(col("target.__file").as("__f"), col("target.__prid").as("__p"))
        .agg(collect_set(col("__f")), count(lit(1)), count_distinct(col("__p"))).collect())
    timed("probe join+agg (files only)")(
      t.read().withColumn("__file", input_file_name()).alias("target")
        .join(src.alias("source"), col("target.id") === col("source.id"), "inner")
        .select(col("target.__file").as("__f"))
        .agg(collect_set(col("__f"))).collect())
    val tgtT = t.read().withColumn("__rid", monotonically_increasing_id())
      .withColumn("__tgt", lit(true)).alias("target")
    val srcT = src.withColumn("__src", lit(true)).alias("source")
    val joined = tgtT.join(srcT, col("target.id") === col("source.id"), "full_outer")
    val out = java.nio.file.Files.createTempDirectory("pm-out").toString
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    timed("phase2 join -> write (SHJ preferred)")(
      joined.select(coalesce(col("source.id"), col("target.id")).as("id"),
        coalesce(col("source.user_id"), col("target.user_id")).as("user_id"),
        coalesce(col("source.amount"), col("target.amount")).as("amount"),
        coalesce(col("source.day"), col("target.day")).as("day"))
        .write.mode("overwrite").parquet(out))
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    timed("phase2 join -> parquet write")(
      joined.select(coalesce(col("source.id"), col("target.id")).as("id"),
        coalesce(col("source.user_id"), col("target.user_id")).as("user_id"),
        coalesce(col("source.amount"), col("target.amount")).as("amount"),
        coalesce(col("source.day"), col("target.day")).as("day"))
        .write.mode("overwrite").parquet(out))
    timed("footer stats")({
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      val files = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq
      } finally s.close()
      graft.log.Stats.fromFooters(files, gen.schema)
    })
    timed("plain rewrite write (no join)")(
      t.read().write.mode("overwrite").parquet(out))
    src.unpersist()
    (1 to 3).foreach { i =>
      timed(s"lake merge end-to-end #$i")(
        t.merge(src0, col("target.id") === col("source.id"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
    }
  }
}

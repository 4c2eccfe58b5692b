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
}

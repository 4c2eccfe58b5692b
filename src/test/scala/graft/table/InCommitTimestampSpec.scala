package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** In-commit timestamps: commit timestamps live in the CommitInfo action
  * and are clamped strictly monotonic regardless of writer clock skew —
  * timestamp time travel and RESTORE TIMESTAMP binary-search a monotone
  * sequence by construction. */
class InCommitTimestampSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String, props: Map[String, String] = Map.empty): LakeTable =
    LakeTable.create(spark, tmpDir(prefix).resolve("t").toString,
      StructType(Seq(StructField("k", LongType))),
      partitionColumns = Nil, properties = props)

  test("a backdated writer clock clamps to last+1; time travel stays correct") {
    val t = fresh("ict-clamp")
    val t0 = t.log.snapshot().commits.last.timestamp
    val T1 = t0 + 10000L
    t.clockMillis = () => T1
    t.append(Seq(1L, 2L).toDF("k")) // v1 @ T1
    t.clockMillis = () => T1 - 7000L // skewed 7s behind
    t.append(Seq(3L).toDF("k")) // v2 must clamp
    val cs = t.log.snapshot().commits
    cs.map(_.timestamp) shouldBe cs.map(_.timestamp).sorted
    cs.last.timestamp shouldBe T1 + 1
    t.timestampAsOf(T1).as[Long].collect().sorted shouldBe Array(1L, 2L)
    // a probe before v0 refuses instead of resolving arbitrarily
    an[IllegalArgumentException] should be thrownBy t.timestampAsOf(t0 - 1)
    // RESTORE TIMESTAMP resolves through the same clamped sequence
    t.clockMillis = () => T1 + 20000L
    t.restoreToTimestamp(T1)
    t.read().as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("the enabling property stamps the inCommitTimestamp writer feature") {
    val t = fresh("ict-feature",
      Map("delta.enableInCommitTimestamps" -> "true"))
    t.log.snapshot().protocol.writerSet should contain("inCommitTimestamp")
  }
}

package graft

/** Driver-contract pins: the flagship entry() must return rows at the
  * driver's sf0.001 smoke scale, and the queries/oracle maps must stay in
  * 1:1 correspondence — a typo'd oracle key would otherwise silently
  * downgrade its query from hash-checked to rows-only, and an orphan
  * oracle would be dead SQL nobody runs. */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows at the driver's smoke scale") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("queries and oracles are in exact 1:1 correspondence") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    withClue(s"oracles without a query: ${os.diff(qs).toSeq.sorted}\n") {
      os.diff(qs) shouldBe empty
    }
    withClue(s"queries without an oracle (rows-only downgrade): ${qs.diff(os).toSeq.sorted}\n") {
      qs.diff(os) shouldBe empty
    }
  }
}

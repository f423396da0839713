package graft

/** Mirrors the driver's t1 smoke: entry() on sf0.001 must analyze,
  * execute and return rows. */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns rows on the smallest scale factor") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_qty"))
  }

  test("every driver query analyzes and plans at the smallest scale factor") {
    // q_ch_sketches once broke at ANALYSIS time (a projection type
    // mismatch) without any spec noticing: Verify skipped it, the bench
    // recorded -1, and the round shipped a dead query. Forcing the
    // executed plan of every entry catches that class in seconds
    // without running anything.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, sf).queryExecution.executedPlan; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every query key has either an oracle or a documented rows-only status") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    val rowsOnly = qs -- os
    // the intentional rows-only set: approximate sketches, catalog
    // listings, recall-spec ANN
    assert(rowsOnly == Set(
      "q_uniq", "q_ch_sketches", "q_sketch_rollup",
      "cat_tables"), rowsOnly)
  }
}

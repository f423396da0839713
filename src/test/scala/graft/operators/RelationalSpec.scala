package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary has one row per (returnflag, linestatus)") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
    // count_order column sums to the filtered row count
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0)
  }

  test("q6 returns a single revenue row") {
    val rows = Relational.q6ForecastRevenue(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("revenue") > 0)
  }

  test("q3 is a deterministic top-20") {
    val a = Relational.q3ShippingPriority(spark, sf).collect()
    val b = Relational.q3ShippingPriority(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length <= 20)
  }

  test("every declared query runs and has an oracle or is rows-only") {
    Relational.queries.foreach { case (name, q) =>
      val df = q(spark, sf)
      assert(df.columns.nonEmpty, name)
    }
    assert(Relational.oracles.keySet.subsetOf(Relational.queries.keySet))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.{Dedup, Relational}

/** SURVEY §4: the plans must be the plans we'd want at 100 TB —
  * filters reaching the parquet scan, pruned read schemas, broadcast
  * dimension joins, bounded shuffle counts. */
class PlanQualitySpec extends SparkSpec {

  private def formatted(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  private def countShuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => 0
      }
      self + inner + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("q6 pushes its filters into the parquet scan") {
    val plan = formatted(Relational.q6ForecastRevenue(spark, sf))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("IsNotNull(l_shipdate"))
    assert(plan.contains("LessThan(l_quantity,24"))
  }

  test("q1 prunes the read schema to referenced columns only") {
    val plan = formatted(Relational.q1PricingSummary(spark, sf))
    val read = "ReadSchema: struct<([^>\n]*)".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    // 7 referenced columns, not the full lineitem schema
    assert(read.count(_ == ':') <= 7, read)
    assert(!read.contains("l_orderkey"))
  }

  test("q5 broadcasts every dimension join side") {
    val df = Relational.q5SupplierVolume(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"))
    // supplier, nation, region joins all broadcast: >= 3 broadcast exchanges
    val n = "BroadcastExchange".r.findAllIn(plan).size
    assert(n >= 3, s"expected >=3 BroadcastExchange, got $n")
  }

  test("q1 aggregation runs inside whole-stage codegen") {
    val df = Relational.q1PricingSummary(spark, sf)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert("WholeStageCodegen".r.findAllIn(codegen).nonEmpty, codegen.take(200))
    assert(formatted(df).contains("HashAggregate"))
  }

  test("text_entropy is a narrow scan: no shuffle before the final sort") {
    // one native expression per row — the only wide dependency is the
    // presentation orderBy
    val n = countShuffles(graft.operators.TextOps.textEntropy(spark, sf))
    assert(n <= 1, s"expected <=1 shuffle, got $n")
  }

  test("q_ch_search pushes the doc_id filter down and prunes the schema") {
    // re-point the view at the parquet table in case an earlier suite
    // shadowed it with a local relation (shared session)
    graft.sql.TableEnv.register(spark, sf)
    graft.Tables(spark, sf, "documents").createOrReplaceTempView("documents")
    val plan = formatted(SparkEntry.queries("q_ch_search")(spark, sf))
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("LessThan(doc_id,200"), plan.take(400))
    val read = "ReadSchema: struct<([^>\n]*)".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(read.count(_ == ':') <= 2, read) // doc_id + text only
  }

  test("cross-tab and bitmap aggregates partial-aggregate map-side") {
    graft.sql.TableEnv.register(spark, sf)
    // the contingency-table state must reduce BEFORE the shuffle: an
    // ObjectHashAggregate partial stage per aggregate, no row buffering
    val assoc = formatted(SparkEntry.queries("q_ch_assoc")(spark, sf))
    assert(assoc.toLowerCase.contains("objecthashaggregate"), assoc.take(400))
    assert("cramersv".r.findAllIn(assoc.toLowerCase).size >= 2, assoc.take(400))
    val bm = formatted(SparkEntry.queries("q_ch_bitmap")(spark, sf))
    assert("groupbitmapor".r.findAllIn(bm.toLowerCase).size >= 2, bm.take(400))
    val wq = formatted(SparkEntry.queries("q_ch_weighted")(spark, sf))
    assert("sumkahan".r.findAllIn(wq.toLowerCase).size >= 2, wq.take(400))
  }

  test("numbers() plans as a scan-free Range leaf") {
    graft.sql.TableEnv.register(spark, sf)
    val plan = formatted(SparkEntry.queries("q_ch_numbers")(spark, sf))
    assert(plan.contains("Range"), plan.take(400))
    assert(!plan.contains("Scan parquet"), plan.take(400))
  }

  test("generateRandom and values() stay scan-free leaves") {
    graft.sql.TableEnv.register(spark, sf)
    // generateRandom = lazy Range + projected hash columns: a LIMIT
    // stops generation; nothing reads the warehouse
    val gr = graft.sql.QueryGuard.plan(spark,
      "SELECT a, s FROM generateRandom('a Int64, s String', 7) LIMIT 5")
    gr.collect()
    val grPlan = gr.queryExecution.executedPlan.toString()
    assert(grPlan.contains("Range"), grPlan.take(400))
    assert(!grPlan.contains("Scan parquet"), grPlan.take(400))
    // values() = a LocalRelation-backed inline table, also scan-free
    val v = graft.sql.QueryGuard.plan(spark,
      "SELECT a FROM values('a Int64', (1), (2)) ORDER BY a")
    v.collect()
    val vPlan = v.queryExecution.optimizedPlan.toString()
    assert(!vPlan.contains("Relation") || vPlan.contains("LocalRelation"),
      vPlan.take(400))
  }

  test("generateSeries/zeros stay scan-free Range leaves; merge() pushes filters into every member scan") {
    graft.sql.TableEnv.register(spark, sf)
    val gs = formatted(graft.sql.QueryGuard.plan(spark,
      "SELECT sum(generate_series) AS s FROM generateSeries(1, 1000)"))
    assert(gs.contains("Range"), gs.take(400))
    assert(!gs.contains("Scan parquet"), gs.take(400))
    // merge() is a by-name union of ordinary relations: the outer
    // WHERE must reach the parquet scan of every member as a pushed
    // filter, and the aggregation must partial map-side
    val m = formatted(graft.sql.QueryGuard.plan(spark,
      "SELECT count() AS n FROM merge('default', '^(orders)$') " +
        "WHERE o_orderkey % 2 = 1"))
    assert(m.contains("PushedFilters:"), m.take(600))
    assert(m.contains("Scan parquet"))
  }

  test("sequenceNextNode partial-aggregates map-side (mergeable object agg)") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT o_custkey % 8 AS g, sequenceNextNode('forward', 'head')(
        |    timestamp_seconds(o_orderkey), toString(o_orderkey % 3),
        |    1, 1) AS nxt
        |FROM orders GROUP BY o_custkey % 8""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // ObjectHashAggregate twice (partial + final) around one shuffle:
    // the buffer merges map-side instead of shipping raw rows
    val n = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(n >= 2, plan.take(600))
  }

  test("truthiness filters stay pushdown-eligible: Truthy replaces to a plain comparison") {
    graft.sql.TableEnv.register(spark, sf)
    // WHERE o_custkey (CH flag-style truthiness) must reach the scan
    // as NOT(EqualTo(o_custkey, 0)) — RuntimeReplaceable means the
    // executed plan never carries the Truthy node itself
    val df = graft.sql.QueryGuard.plan(spark,
      "SELECT count(*) AS n FROM orders WHERE o_custkey")
    df.collect()
    val plan = formatted(df)
    assert(plan.contains("PushedFilters:"), plan.take(600))
    assert(plan.contains("Not(EqualTo(o_custkey,0))"), plan.take(1200))
    assert(!plan.contains("truthy"), plan.take(1200))
    // and the arithmetic form stays inside whole-stage codegen
    val df2 = graft.sql.QueryGuard.plan(spark,
      "SELECT count(*) AS n FROM orders WHERE o_orderkey % 2")
    df2.collect()
    val plan2 = df2.queryExecution.executedPlan.toString()
    // the `*(n)` markers are whole-stage codegen stage ids — the
    // truthiness filter must not fall out of codegen
    assert(plan2.contains("*(1) Filter"), plan2.take(800))
    assert(!plan2.toLowerCase.contains("truthy"), plan2.take(1200))
  }

  test("minhash candidate generation uses a bounded number of shuffles") {
    // groupBy(band,bkey) + distinct + final orderBy = 3 wide deps max
    val n = countShuffles(Dedup.dedupMinhash(spark, sf))
    assert(n <= 3, s"expected <=3 shuffles, got $n")
  }

  test("brute-force ANN broadcasts the query side, no sort-merge join") {
    val df = graft.operators.Ann.annBruteforce(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastExchange"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("ANN top-k partial-aggregates before the shuffle (two-phase)") {
    val df = graft.operators.Ann.annBruteforce(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    // CosTopK is object-hash aggregated: a partial (map-side) stage and a
    // final stage must both be present, and no per-query window remains
    assert("costopk".r.findAllIn(plan.toLowerCase).size >= 2, plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("centroid analytics stays within its budgeted shuffle count") {
    // (label,pos) agg + label agg + member join + final label agg + sort
    val n = countShuffles(
      graft.operators.Embeddings.embCentroids(spark, "/root/testdata/sf0.01"))
    assert(n <= 6, s"expected <=6 shuffles, got $n")
  }

  test("binned interval join plans as an equi-join, not a nested loop") {
    val df = graft.operators.Events.evErrorContext(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("embedding near-dup has no cartesian and no nested-loop join") {
    val df = Dedup.dedupEmbedding(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    // candidate generation and cosine verify are FUSED in the band
    // bucket: the plan has NO join at all, and the bucket aggregate
    // partial-combines map-side
    assert(!plan.contains("Join"),
      "expected the fused no-join plan: " + plan.take(600))
    assert(plan.contains("partial"),
      "expected a partial (map-side) bucket aggregate")
  }

  test("partitioned layout prunes non-matching partitions at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.Tables(spark, sf, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val df = spark.read.parquet(tmp)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .groupBy("user_id").count()
    val plan = formatted(df)
    // the partition filter must prune at planning time, not post-scan
    assert(plan.contains("PartitionFilters: [isnotnull(event_type") ||
      plan.contains("PartitionFilters: [(event_type"), plan.take(800))
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString()).mkString
    assert(!scanned.contains("event_type=view"), "pruned partition was scanned")
  }

  test("decontamination broadcasts the benchmark side") {
    val df = graft.operators.TextOps.textDecontaminate(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("tfidf joins the 1-row corpus count as a broadcast") {
    val df = graft.operators.TextOps.textTfidf(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastExchange"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("SQL join hints pass through the read-only guard to the planner") {
    graft.sql.TableEnv.register(spark, sf)
    val sql =
      """SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin
    graft.sql.QueryGuard.parseReadOnly(spark, sql)
    val df = spark.sql(sql)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
  }

  test("surprisal scoring broadcasts the frequency table, never self-joins") {
    val df = graft.operators.Curation.textSurprisal(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("SortMergeJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("signature computation is shuffle-free up to the bucket groupBy") {
    // the per-doc simhash pipeline is narrow: only the final sort shuffles
    val n = countShuffles(Dedup.dedupSimhash(spark, sf))
    assert(n <= 1, s"expected <=1 shuffle, got $n")
  }

  test("boilerplate DF count shuffles 64-bit span hashes, not strings") {
    val plan = formatted(
      graft.operators.Curation.textBoilerplate(spark, sf))
    // the document-frequency aggregate keys on native spanKeys output:
    // the corpus-wide shuffle carries 16-byte (hash, doc_id) rows, and
    // span strings are only ever BUILT for candidate positions (the
    // concat_ws sits behind the broadcast candidate-position join)
    assert(plan.toLowerCase.contains("spankeys"), plan.take(600))
    // candidate sets broadcast back — no sort-merge join of span strings
    assert(!plan.contains("SortMergeJoin"), "expected broadcast joins only")
  }

  test("mix_cap partial-aggregates: no per-key window exchange") {
    // the whole point of the SampleAgg formulation: map-side reduction
    // to <= N ids per key, never a row_number window that funnels a
    // heavy key through one reducer
    val plan = formatted(graft.operators.Curation.mixCap(spark, sf))
    assert(!plan.contains("Window"), "expected no window exchange")
    assert(plan.contains("partial"), "expected partial aggregation")
  }

  test("multimodal decode pipelines stay narrow after the id spread") {
    // synthesis + decode are mapPartitions over repartitioned 8-byte
    // ids: one round-robin exchange to spread codec work, one final
    // presentation sort — nothing else may shuffle
    val nFeat = countShuffles(graft.operators.Multimodal.mmFeatures(spark, sf))
    assert(nFeat <= 2, s"mm_features: expected <=2 shuffles, got $nFeat")
    val nFrames = countShuffles(graft.operators.Multimodal.mmFrames(spark, sf))
    assert(nFrames <= 2, s"mm_frames: expected <=2 shuffles, got $nFrames")
  }

  test("ForEachAgg partial-aggregates map-side before the shuffle") {
    graft.functions.CHFunctions.register(spark)
    graft.sql.TableEnv.register(spark, sf)
    val df = spark.sql(
      """SELECT l_returnflag,
        |  sumForEach(sequence(1, CAST(l_linenumber AS INT))) AS s
        |FROM lineitem GROUP BY 1""".stripMargin)
    val plan = formatted(df)
    // the positional accumulator rides ObjectHashAggregate with a
    // partial phase: per-task combine, one shuffle of tiny buffers
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial"), "expected partial aggregation")
    assert(countShuffles(df) <= 2,
      "expected the single aggregate exchange (plus AQE reads)")
  }

  test("pasted ASOF JOIN plans the custom sort-merge exec") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT a.event_id, b.event_id AS prior
        |FROM (SELECT * FROM events WHERE event_type = 'click') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') b
        |  ON a.user_id = b.user_id AND a.ts >= b.ts""".stripMargin)
    val plan = formatted(df)
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "expected the keyed sort-merge")
  }

  test("hoisted subquery views do not block filter pushdown") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT * FROM (
        |  SELECT c.c_custkey, c.c_mktsegment FROM customer c
        |  ANY LEFT JOIN orders o ON c.c_custkey = o.o_custkey) t
        |WHERE t.c_custkey < 100""".stripMargin)
    val plan = formatted(df)
    // Catalyst optimizes through the registered temp view: the outer
    // predicate reaches the customer parquet scan
    assert(plan.contains("PushedFilters:") &&
      plan.contains("LessThan(c_custkey,100)"), plan.take(900))
  }

  test("pasted ANY JOIN dedupes on the key, no nested loop") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT count(*) AS n FROM customer c
        |ANY LEFT JOIN orders o ON c.c_custkey = o.o_custkey""".stripMargin)
    val plan = formatted(df)
    // the dedup is a MERGEABLE min(struct(*)) partial aggregate — a
    // per-key window would funnel a skewed key through one reducer's
    // sort; partial aggregation combines map-side instead
    assert(!plan.contains("Window"),
      "ANY JOIN dedup must not use a window: " + plan.take(800))
    assert(plan.contains("partial"),
      "expected a partial (map-side combine) dedup aggregate")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "expected an equi-join")
  }

  test("plain-join prefix before ASOF keeps keyed joins end to end") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT e.event_id, c.c_name, p.event_id AS prior_view
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |JOIN customer c ON e.user_id = c.c_custkey
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin)
    val plan = formatted(df)
    // the materialized prefix stays a keyed join (customer is small →
    // broadcast hash) feeding the custom ASOF sort-merge — never a
    // nested loop over the prefix view
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"), "expected a keyed prefix join")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), "expected keyed joins only")
  }

  test("per-group nested fill joins on the outer axis, no cartesian") {
    graft.sql.TableEnv.register(spark, sf)
    val df = graft.sql.QueryGuard.plan(spark,
      """SELECT d, m, n FROM (
        |  SELECT CAST(l_quantity AS INT) AS d,
        |    CAST(month(l_shipdate) AS INT) AS m, count(*) AS n
        |  FROM lineitem
        |  WHERE CAST(l_quantity AS INT) IN (3, 7, 11)
        |    AND month(l_shipdate) <= CAST(l_quantity AS INT)
        |  GROUP BY 1, 2) t
        |ORDER BY d WITH FILL, m WITH FILL""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // the unbounded inner axis derives bounds per outer group through
    // an equi-join on the outer axis column — a cartesian grid blowup
    // here would scale with |result| × |axis| instead of the runs
    assert(!plan.contains("CartesianProduct"), plan.take(900))
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import graft.Q
import graft.sql.{QueryGuard, TableEnv}

/** The breadth of the SELECT dialect (SURVEY §2 B4): each query here is
  * executed through the guarded SQL path (`QueryGuard` + `spark.sql`) —
  * the same surface the reference exposes via `run_select_query`
  * (mcp_server.py:433). Where the Spark SQL text is also valid DuckDB
  * SQL the oracle is the identical string; otherwise a dialect-adjusted
  * oracle is provided.
  *
  * Determinism rules (so results hash-match across engines):
  *  - every query has a total ORDER BY;
  *  - every computed float is rounded;
  *  - window orderings include a unique key tiebreak.
  */
object SqlSurface {

  /** name -> (spark sql, oracle sql override — None = same text). */
  private val defs: Seq[(String, String, Option[String])] = Seq(

    ("q_left_join",
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
      None),

    ("q_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
      None),

    ("q_window_rank",
      """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price,
        |  CAST(rnk AS INT) AS rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
      None),

    ("q_window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) / 1e2, 2) AS running_total,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS prev_order
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
      None),

    // B4h extension: positional window values over explicit full frames
    ("q_window_firstlast",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS first_ord,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ord,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nth2_ord
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
      None),

    // the ReplacingMergeTree FINAL pattern: a changelog collapses to
    // its latest row per key (version = event time, id tiebreak) —
    // merge-on-read in one window pass, the same shape CH users run
    // `SELECT ... FINAL` for
    ("q_replacing_merge",
      """SELECT user_id, event_type, event_id AS last_event,
        |  round(value, 2) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
      None),

    ("q_cte_union",
      """WITH hi AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000),
        |     lo AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice < 20000)
        |SELECT 'high' AS bucket, o_custkey, round(o_totalprice, 2) AS price FROM hi
        |UNION ALL
        |SELECT 'low' AS bucket, o_custkey, round(o_totalprice, 2) AS price FROM lo
        |ORDER BY bucket, o_custkey, price""".stripMargin,
      None),

    // GROUP BY ALL (every non-aggregate select item groups implicitly —
    // supported verbatim by both engines)
    ("q_group_all",
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders GROUP BY ALL ORDER BY 1, 2""".stripMargin,
      None),

    ("q_having",
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS spend
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 3 ORDER BY o_custkey""".stripMargin,
      None),

    ("q_argmax",
      """SELECT c_nationkey, max_by(c_name, c_acctbal) AS top_customer,
        |  round(max(c_acctbal), 2) AS top_bal,
        |  min_by(c_name, c_acctbal) AS bottom_customer
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
      None),

    ("q_quantile",
      """SELECT l_returnflag,
        |  round(percentile(l_quantity, 0.5), 4) AS p50_qty,
        |  round(percentile(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(percentile(l_discount, 0.25), 4) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      Some("""SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
        |  round(quantile_cont(l_discount, 0.25), 4) AS p25_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    ("q_topk",
      """SELECT p_brand, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY cnt DESC, p_brand LIMIT 10""".stripMargin,
      None),

    // Array results are stringified (array_join / array_to_string) so the
    // driver's pandas sort can hash the column; the groupArray semantics
    // under test are unchanged.
    ("q_group_array",
      """SELECT l_orderkey, array_join(array_sort(collect_list(l_linenumber)), ',') AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
      Some("""SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    ("q_array_hof",
      """SELECT doc_id,
        |  size(filter(split(text, ' '), t -> length(t) > 4)) AS n_long_tokens,
        |  array_join(transform(slice(split(text, ' '), 1, 3), t -> upper(t)), ',') AS first3_upper
        |FROM documents ORDER BY doc_id""".stripMargin,
      Some("""SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS INT) AS n_long_tokens,
        |  array_to_string(list_transform(string_split(text, ' ')[1:3], t -> upper(t)), ',') AS first3_upper
        |FROM documents ORDER BY doc_id""".stripMargin)),

    ("q_token_freq",
      """SELECT token, count(*) AS cnt
        |FROM (SELECT explode(split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
      Some("""SELECT token, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin)),

    ("q_setops",
      """SELECT 'i' AS op, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') a
        |UNION ALL
        |SELECT 'e' AS op, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') b
        |ORDER BY op, o_custkey""".stripMargin,
      None),

    ("q_subquery",
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        |FROM customer c1
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
      None),

    ("q_json_extract",
      """SELECT event_type,
        |  round(avg(CAST(get_json_object(props, '$.k') AS DOUBLE)), 4) AS avg_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      Some("""SELECT event_type,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    ("q_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
      None),

    ("q_cube",
      """SELECT coalesce(l_returnflag, '*') AS rf, coalesce(l_linestatus, '*') AS ls,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
      None),

    ("q_full_join",
      """SELECT coalesce(a.k, b.k) AS k, a.n_urgent, b.n_building
        |FROM (SELECT o_custkey AS k, count(*) AS n_urgent FROM orders
        |      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) a
        |FULL OUTER JOIN (SELECT c_custkey AS k, count(*) AS n_building FROM customer
        |      WHERE c_mktsegment = 'BUILDING' GROUP BY 1) b
        |ON a.k = b.k
        |ORDER BY k""".stripMargin,
      None),

    // ClickHouse LIMIT n BY col ≡ top-n per group via row_number
    ("q_limit_by",
      """SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS bal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 2 ORDER BY c_nationkey, bal DESC, c_custkey""".stripMargin,
      None),

    // ClickHouse SAMPLE ≡ deterministic hash sampling on the key —
    // md5-based so both engines select identical rows
    ("q_sample",
      """SELECT count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders WHERE substring(md5(CAST(o_orderkey AS STRING)), 1, 1) = 'a'""".stripMargin,
      Some("""SELECT count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'""".stripMargin)),

    // SAMPLE k OFFSET m (the CH disjoint-sample construct: reads a
    // DIFFERENT deterministic slice than SAMPLE k — parallel workers
    // each take `SAMPLE 1/N OFFSET i/N` and cover the table exactly
    // once). Hash-bucket membership in [offset, offset+rate).
    ("q_sample_offset",
      """SELECT count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders
        |WHERE CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 4), 16, 10)
        |           AS BIGINT) % 100 BETWEEN 50 AND 59""".stripMargin,
      Some("""SELECT count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 1e2, 2) AS total
        |FROM orders
        |WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
        |      % 100 BETWEEN 50 AND 59""".stripMargin)),

    ("q_moving_avg",
      """SELECT month, n,
        |  round(avg(n) OVER (ORDER BY month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
        |  round(sum(CAST(n AS DOUBLE)) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum
        |FROM (SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n
        |      FROM orders GROUP BY 1) t
        |ORDER BY month""".stripMargin,
      Some("""SELECT month, n,
        |  round(avg(n) OVER (ORDER BY month
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
        |  round(sum(n) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum
        |FROM (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |      count(*) AS n FROM orders GROUP BY 1) t
        |ORDER BY month""".stripMargin)),

    ("q_grouping_sets",
      """SELECT coalesce(o_orderstatus, '*') AS status,
        |  coalesce(o_orderpriority, '*') AS priority,
        |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
      None),

    ("q_window_dist",
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
      None),

    // PIVOT dialects differ; both sides express it as FILTERed aggs
    ("q_pivot",
      """SELECT c_nationkey,
        |  round(sum(CASE WHEN c_mktsegment = 'BUILDING'
        |    THEN CAST(round(c_acctbal * 100.0) AS BIGINT) END) / 1e2, 2) AS building,
        |  round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |    THEN CAST(round(c_acctbal * 100.0) AS BIGINT) END) / 1e2, 2) AS automobile,
        |  round(sum(CASE WHEN c_mktsegment = 'MACHINERY'
        |    THEN CAST(round(c_acctbal * 100.0) AS BIGINT) END) / 1e2, 2) AS machinery
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
      None),

    ("q_string_funcs",
      """SELECT c_custkey,
        |  upper(substring(c_name, 1, 8)) AS up8,
        |  length(c_name) AS name_len,
        |  replace(c_mktsegment, 'ING', '_') AS seg_repl,
        |  concat(c_mktsegment, '#', CAST(c_nationkey AS STRING)) AS seg_key,
        |  lpad(CAST(c_nationkey AS STRING), 4, '0') AS nat_pad,
        |  position('u' IN c_name) AS u_pos,
        |  trim(BOTH '0' FROM CAST(c_custkey AS STRING)) AS trimmed
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,
      Some("""SELECT c_custkey,
        |  upper(substring(c_name, 1, 8)) AS up8,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  replace(c_mktsegment, 'ING', '_') AS seg_repl,
        |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_key,
        |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_pad,
        |  CAST(position('u' IN c_name) AS INT) AS u_pos,
        |  trim(CAST(c_custkey AS VARCHAR), '0') AS trimmed
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin)),

    ("q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_extendedprice - 30000.0), 2) AS dev,
        |  ceil(l_quantity / 7.0) AS q7,
        |  floor(l_extendedprice / 1000.0) AS price_k,
        |  round(sqrt(l_extendedprice), 4) AS root,
        |  round(ln(l_extendedprice + 1.0), 6) AS lnp,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  pmod(l_orderkey, 7) AS ok_mod
        |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey < 2000
        |ORDER BY l_orderkey""".stripMargin,
      Some("""SELECT l_orderkey, l_linenumber,
        |  round(abs(l_extendedprice - 30000.0), 2) AS dev,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS q7,
        |  CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
        |  round(sqrt(l_extendedprice), 4) AS root,
        |  round(ln(l_extendedprice + 1.0), 6) AS lnp,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  l_orderkey % 7 AS ok_mod
        |FROM lineitem WHERE l_linenumber = 1 AND l_orderkey < 2000
        |ORDER BY l_orderkey""".stripMargin)),

    ("q_date_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  quarter(o_orderdate) AS q,
        |  dayofweek(o_orderdate) AS dow,
        |  CAST(date_add(CAST(o_orderdate AS DATE), 30) AS TIMESTAMP) AS due,
        |  datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
      Some("""SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin)),

    ("q_null_handling",
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED') AS seg,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS pos_bal,
        |  count(*) OVER () AS total
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,
      None),

    // Fixed-bin histogram (the GROUP BY width_bucket shape ClickHouse's
    // histogram() feeds dashboards with). Bin arithmetic is explicit
    // floor division in BOTH engines so edge semantics match exactly;
    // one partial-agg shuffle, O(bins) output regardless of corpus.
    // Bin 9 is the overflow bucket (everything >= 270000 clamps into
    // it), so its hi is the observed max, not the nominal bin edge.
    ("q_histogram",
      """WITH b AS (
        |  SELECT CAST(least(floor(o_totalprice / 30000), 9) AS BIGINT) AS bin,
        |    o_totalprice
        |  FROM orders)
        |SELECT bin, bin * 30000 AS lo,
        |  CASE WHEN bin = 9 THEN round(max(o_totalprice), 2)
        |       ELSE CAST((bin + 1) * 30000 AS DOUBLE) END AS hi,
        |  count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / count(*) / 1e2, 2) AS avg_price
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
      Some("""WITH b AS (
        |  SELECT CAST(least(floor(o_totalprice / 30000), 9) AS BIGINT) AS bin,
        |    o_totalprice
        |  FROM orders)
        |SELECT bin, bin * 30000 AS lo,
        |  CASE WHEN bin = 9 THEN round(max(o_totalprice), 2)
        |       ELSE CAST((bin + 1) * 30000 AS DOUBLE) END AS hi,
        |  count(*) AS n, round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / count(*) / 1e2, 2) AS avg_price
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // Interval-overlap sweep (ClickHouse maxIntersections shape): each
    // order holds a half-open 30-day window [d, d+30); +1/-1 deltas
    // cumsum in (date, delta) order — the -1 sorts first so back-to-back
    // windows don't overlap — and the peak plus its first date come from
    // one co-partitioned self-join. Scale shape: the window partitions
    // by o_custkey (high-cardinality, tiny partitions), the max/peak
    // aggregates reuse that exchange, and only the top-10 leaves the
    // cluster. Same-key delta ties are symmetric (+1/+1), so the ROWS
    // frame is order-insensitive within ties and both engines agree.
    ("q_interval_overlap",
      """WITH ev AS (
        |  SELECT o_custkey, s.d AS d, s.delta AS delta
        |  FROM orders
        |  LATERAL VIEW explode(array(
        |    named_struct('d', CAST(o_orderdate AS DATE), 'delta', 1),
        |    named_struct('d', date_add(CAST(o_orderdate AS DATE), 30), 'delta', -1))) t AS s),
        |run AS (
        |  SELECT o_custkey, d, delta,
        |    sum(delta) OVER (PARTITION BY o_custkey ORDER BY d, delta
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM ev),
        |mx AS (SELECT o_custkey, max(open) AS max_open FROM run GROUP BY o_custkey)
        |SELECT r.o_custkey AS custkey, m.max_open, min(r.d) AS first_peak
        |FROM run r JOIN mx m ON r.o_custkey = m.o_custkey AND r.open = m.max_open
        |GROUP BY 1, 2
        |ORDER BY max_open DESC, custkey LIMIT 10""".stripMargin,
      Some("""WITH ev AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, 1 AS delta FROM orders
        |  UNION ALL
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) + 30 AS d, -1 AS delta FROM orders),
        |run AS (
        |  SELECT o_custkey, d, delta,
        |    sum(delta) OVER (PARTITION BY o_custkey ORDER BY d, delta
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM ev),
        |mx AS (SELECT o_custkey, CAST(max(open) AS BIGINT) AS max_open
        |       FROM run GROUP BY o_custkey)
        |SELECT r.o_custkey AS custkey, m.max_open, min(r.d) AS first_peak
        |FROM run r JOIN mx m ON r.o_custkey = m.o_custkey AND r.open = m.max_open
        |GROUP BY 1, 2
        |ORDER BY max_open DESC, custkey LIMIT 10""".stripMargin)),

    // Approximate distinct (ClickHouse `uniq`) — engine-specific sketch,
    // no cross-engine oracle; exact variant is verified as q_distinct.
    ("q_uniq",
      """SELECT approx_count_distinct(o_custkey) AS approx_cust FROM orders""",
      Some(""))) // "" sentinel: rows-only, no oracle entry

  private def runSql(sql: String): Q = (s: SparkSession, dir: String) => {
    TableEnv.register(s, dir)
    QueryGuard.parseReadOnly(s, sql)
    s.sql(sql)
  }

  val queries: Map[String, Q] =
    defs.map { case (n, sql, _) => n -> runSql(sql) }.toMap

  val oracles: Map[String, String] =
    defs.flatMap {
      case (_, _, Some("")) => None
      case (n, sql, o) => Some(n -> o.getOrElse(sql))
    }.toMap
}

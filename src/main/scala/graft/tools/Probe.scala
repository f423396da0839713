package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run a list of realistic pasted-ClickHouse snippets
  * through the full served path (QueryGuard.plan) against a testdata
  * dir and report which ones plan+execute vs die — a gap-finder for
  * the dialect shims, not part of the product surface.
  *
  * Usage: sbt "runMain graft.tools.Probe /root/testdata/sf0.001"
  */
object Probe {

  /** (label, sql) — realistic idioms a CH user would paste. */
  val snippets: Seq[(String, String)] = Seq(
    "count_noargs" -> "SELECT count() AS n FROM orders",
    "count_if_comb" ->
      "SELECT countIf(o_totalprice > 1000) AS big, sumIf(o_totalprice, o_orderpriority = '1-URGENT') AS urgent FROM orders",
    "any_anylast" ->
      "SELECT any(o_orderpriority) AS a, anyLast(o_orderstatus) AS b FROM orders",
    "limit_comma" -> "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5, 10",
    "top_n" -> "SELECT TOP 5 o_orderkey FROM orders ORDER BY o_orderkey",
    "arrayjoin_fn" ->
      "SELECT arrayJoin([1, 2, 3]) AS v, o_orderkey FROM orders LIMIT 9",
    "arrayjoin_fn_col" ->
      "SELECT arrayJoin(splitByChar(' ', text)) AS tok FROM documents LIMIT 20",
    "multi_if" ->
      "SELECT multiIf(o_totalprice > 100000, 'hi', o_totalprice > 1000, 'mid', 'lo') AS band, count() AS n FROM orders GROUP BY band",
    "if_fn" -> "SELECT if(o_totalprice > 1000, 'big', 'small') AS t, count() AS n FROM orders GROUP BY t",
    "tuple_access" -> "SELECT tuple(o_orderkey, o_totalprice).1 AS k FROM orders LIMIT 3",
    "tuple_element" -> "SELECT tupleElement(tuple(o_orderkey, o_totalprice), 2) AS p FROM orders LIMIT 3",
    "untuple" -> "SELECT untuple(tuple(o_orderkey, o_totalprice)) FROM orders LIMIT 3",
    "date_trunc_names" ->
      "SELECT toStartOfMonth(o_orderdate) AS m, toMonday(o_orderdate) AS w, count() AS n FROM orders GROUP BY m, w ORDER BY m, w LIMIT 5",
    "to_start_interval" ->
      "SELECT toStartOfInterval(o_orderdate, INTERVAL 3 month) AS q, count() AS n FROM orders GROUP BY q ORDER BY q LIMIT 5",
    "now_today" -> "SELECT now() >= toDateTime('2020-01-01 00:00:00') AS a, today() > toDate('2020-01-01') AS b",
    "format_datetime" ->
      "SELECT formatDateTime(o_orderdate, '%Y-%m') AS ym, count() AS n FROM orders GROUP BY ym ORDER BY ym LIMIT 3",
    "has_indexof" ->
      "SELECT has(splitByChar(' ', text), 'spark') AS h, indexOf(splitByChar(' ', text), 'the') AS i FROM documents LIMIT 5",
    "empty_notempty" ->
      "SELECT empty(text) AS e, notEmpty(text) AS ne FROM documents LIMIT 3",
    "utf8_fns" ->
      "SELECT lengthUTF8(text) AS l, lowerUTF8(substring(text, 1, 10)) AS lo FROM documents LIMIT 3",
    "starts_ends" ->
      "SELECT startsWith(o_orderpriority, '1') AS s, endsWith(o_orderpriority, 'URGENT') AS e FROM orders LIMIT 3",
    "pad_fns" ->
      "SELECT leftPad(toString(o_orderkey), 10, '0') AS lp, rightPad(o_orderstatus, 3, '.') AS rp FROM orders LIMIT 3",
    "array_string_concat" ->
      "SELECT arrayStringConcat(splitByString(' ', substring(text, 1, 50)), '-') AS j FROM documents LIMIT 3",
    "quantile_param" ->
      "SELECT quantile(0.9)(o_totalprice) AS p90, quantiles(0.5, 0.9)(o_totalprice) AS ps FROM orders",
    "group_array_param" ->
      "SELECT groupArray(3)(o_orderkey) AS g FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10)",
    "join_using_semi" ->
      "SELECT count() AS n FROM orders LEFT SEMI JOIN customer ON o_custkey = c_custkey",
    "anti_join_ch" ->
      "SELECT count() AS n FROM customer LEFT ANTI JOIN orders ON c_custkey = o_custkey",
    "in_tuple" ->
      "SELECT count() AS n FROM orders WHERE o_orderstatus IN ('O', 'F')",
    "not_in_sub" ->
      "SELECT count() AS n FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    "to_decimal" ->
      "SELECT toDecimal64(o_totalprice, 4) AS d, toDecimal32(1.5, 2) AS d2 FROM orders LIMIT 3",
    "to_datetime64" ->
      "SELECT toDateTime64('2024-01-02 03:04:05.123', 3) AS t",
    "to_typename" -> "SELECT toTypeName(o_orderkey) AS t FROM orders LIMIT 1",
    "transform_fn" ->
      "SELECT transform(o_orderstatus, ['O', 'F'], ['open', 'filled'], 'other') AS s, count() AS n FROM orders GROUP BY s",
    "case_expr" ->
      "SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled' ELSE 'other' END AS s, count() AS n FROM orders GROUP BY s",
    "intdiv_mod" ->
      "SELECT intDiv(o_orderkey, 7) AS d, modulo(o_orderkey, 7) AS m FROM orders LIMIT 3",
    "greatest_least" ->
      "SELECT greatest(o_orderkey, 100) AS g, least(o_orderkey, 100) AS l FROM orders LIMIT 3",
    "running_acc" ->
      "SELECT o_orderkey, sum(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt FROM orders ORDER BY o_orderkey LIMIT 5",
    "with_scalar" ->
      "WITH 100 AS thresh SELECT count() AS n FROM orders WHERE o_totalprice > thresh",
    "subquery_in_select" ->
      "SELECT o_orderkey, (SELECT max(c_custkey) FROM customer) AS mx FROM orders LIMIT 3",
    "exists_sub" ->
      "SELECT count() AS n FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "array_slice" ->
      "SELECT arraySlice([1,2,3,4,5], 2, 3) AS s",
    "array_sort_desc" ->
      "SELECT arraySort(x -> -x, [3,1,2]) AS a, arrayReverseSort([3,1,2]) AS b",
    "range_fn" -> "SELECT range(5) AS r, range(2, 5) AS r2",
    "array_concat" -> "SELECT arrayConcat([1,2], [3]) AS c",
    "array_flatten" -> "SELECT arrayFlatten([[1,2],[3]]) AS f",
    "array_compact" -> "SELECT arrayCompact([1,1,2,2,3]) AS c",
    "array_zip" -> "SELECT arrayZip([1,2], ['a','b']) AS z",
    "array_enumerate" -> "SELECT arrayEnumerate([9,8,7]) AS e",
    "bitmask" ->
      "SELECT bitAnd(o_orderkey, 255) AS a, bitOr(o_orderkey, 1) AS o, bitXor(o_orderkey, 5) AS x, bitNot(o_orderkey) AS n FROM orders LIMIT 3",
    "hex_unhex" -> "SELECT hex(255) AS h, unhex('ff') AS u, hex(toString('ab')) AS hs",
    "md5_sha" -> "SELECT lower(hex(MD5('abc'))) AS m, lower(hex(SHA256('abc'))) AS s",
    "coalesce_ifnull" ->
      "SELECT coalesce(NULL, 1) AS c, ifNull(NULL, 2) AS i, nullIf(1, 1) AS n, assumeNotNull(nullIf(2, 3)) AS a",
    "is_null_ops" ->
      "SELECT isNull(nullIf(1,1)) AS a, isNotNull(1) AS b, isNaN(0.0/0.0) AS c, isFinite(1.0) AS d, isInfinite(1.0/0.0) AS e",
    "least_greatest_arrays" -> "SELECT arrayMin([3,1,2]) AS mn, arrayMax([3,1,2]) AS mx, arraySum([1,2,3]) AS s, arrayAvg([1,2,3]) AS a",
    "global_in" ->
      "SELECT count() AS n FROM orders WHERE o_custkey GLOBAL IN (SELECT c_custkey FROM customer LIMIT 10)",
    "interval_arith" ->
      "SELECT o_orderdate + INTERVAL 1 MONTH AS m, addDays(o_orderdate, 7) AS d FROM orders LIMIT 3",
    "date_diff" ->
      "SELECT dateDiff('day', toDate('2024-01-01'), toDate('2024-02-01')) AS dd",
    "to_yyyymm" ->
      "SELECT toYYYYMM(o_orderdate) AS m, toYYYYMMDD(o_orderdate) AS d FROM orders LIMIT 3",
    "position_fns" ->
      "SELECT position(text, 'the') AS p, positionCaseInsensitive(text, 'THE') AS pc FROM documents LIMIT 3",
    "extract_regex" ->
      "SELECT extract(text, '([a-z]+)') AS e, extractAll(substring(text, 1, 30), '([a-z]+)') AS ea FROM documents LIMIT 3",
    "replace_fns" ->
      "SELECT replaceOne(text, 'the', 'a') AS r1, replaceAll(text, 'the', 'a') AS ra, replaceRegexpAll(text, '[aeiou]', '') AS rr FROM documents LIMIT 2",
    "trim_fns" -> "SELECT trimBoth('  x  ') AS b, trimLeft('  x') AS l, trimRight('x  ') AS r",
    "concat_ws" -> "SELECT concatWithSeparator('-', 'a', 'b', 'c') AS c",
    "cast_colon" -> "SELECT '123'::UInt32 + 1 AS v",
    "to_fixed_string" -> "SELECT toFixedString('ab', 4) AS f",
    "uuid_fns" -> "SELECT toString(generateUUIDv4()) != '' AS ok, toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS u",
    "format_readable" ->
      "SELECT formatReadableSize(123456789) AS s, formatReadableQuantity(1234567) AS q",
    "bar_fn" -> "SELECT bar(5, 0, 10, 10) AS b",
    "least_sq" ->
      "SELECT simpleLinearRegression(o_orderkey, o_totalprice) AS lr FROM (SELECT * FROM orders LIMIT 100)",
    "num_literals" -> "SELECT 1_000_000 AS a",
    "neighbor_like" ->
      "SELECT o_orderkey, lagInFrame(o_totalprice) OVER (ORDER BY o_orderkey) AS prev FROM orders ORDER BY o_orderkey LIMIT 5",
    "agg_state_merge" ->
      "SELECT uniqMerge(s) AS u FROM (SELECT uniqState(o_custkey) AS s FROM orders GROUP BY o_orderstatus)",
    "group_concat" ->
      "SELECT groupConcat(',')(o_orderstatus) AS g FROM (SELECT o_orderstatus FROM orders LIMIT 5)",
    "order_by_alias_pos" ->
      "SELECT o_orderstatus AS s, count() AS n FROM orders GROUP BY 1 ORDER BY 2 DESC",
    "having_count" ->
      "SELECT o_custkey, count() AS n FROM orders GROUP BY o_custkey HAVING count() > 2 ORDER BY o_custkey LIMIT 5",
    "distinct_count_if" ->
      "SELECT uniqExactIf(o_custkey, o_totalprice > 1000) AS u FROM orders",
    "arg_min_max" ->
      "SELECT argMin(o_orderkey, o_totalprice) AS amn, argMax(o_orderkey, o_totalprice) AS amx FROM orders",
    "nested_agg_if" ->
      "SELECT avgIf(o_totalprice, o_orderstatus = 'O') AS a, maxIf(o_totalprice, o_orderstatus = 'F') AS m, minIf(o_totalprice, true) AS mi FROM orders",
    // ---- round-12 wave: verdict item 7 + adjacent paste idioms ----
    "into_outfile" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3 INTO OUTFILE '/tmp/probe_out.csv' FORMAT CSVWithNames",
    "into_outfile_bare" ->
      "SELECT count() AS n FROM orders INTO OUTFILE '/tmp/probe_out2.txt'",
    "settings_subquery" ->
      "SELECT count() AS n FROM (SELECT * FROM orders WHERE o_totalprice > 100 SETTINGS max_threads = 2)",
    "settings_cte" ->
      "WITH w AS (SELECT o_custkey FROM orders SETTINGS max_threads = 1) SELECT count() AS n FROM w",
    "where_alias" ->
      "SELECT o_orderkey AS k, o_totalprice * 2 AS dbl FROM orders WHERE dbl > 100 ORDER BY k LIMIT 3",
    "where_alias_chain" ->
      "SELECT o_totalprice * 2 AS d, d + 1 AS e FROM orders WHERE e > 100 LIMIT 3",
    "lambda_zip" ->
      "SELECT arrayMap((x, y) -> x + y, [1, 2], [10, 20]) AS z",
    "lambda_zip3" ->
      "SELECT arraySum((x, y) -> x * y, [1, 2], [3, 4]) AS dot, arrayFilter((x, y) -> y > 0, ['a', 'b'], [1, 0]) AS f",
    "any_heavy" -> "SELECT anyHeavy(o_orderstatus) AS h FROM orders",
    "quantile_timing" ->
      "SELECT quantileTiming(0.9)(o_totalprice) AS p, quantileTDigest(0.5)(o_totalprice) AS t FROM orders",
    "or_combinators" ->
      "SELECT sumOrNull(o_totalprice) AS sn, maxOrDefault(o_orderkey) AS md FROM orders WHERE o_totalprice < 0",
    "group_cube" ->
      "SELECT o_orderstatus, count() AS n FROM orders GROUP BY o_orderstatus WITH CUBE ORDER BY o_orderstatus, n",
    "group_rollup" ->
      "SELECT o_orderstatus, count() AS n FROM orders GROUP BY o_orderstatus WITH ROLLUP ORDER BY o_orderstatus, n",
    "star_except" ->
      "SELECT * EXCEPT (o_orderdate) FROM orders LIMIT 1",
    "format_null" -> "SELECT count() AS n FROM orders FORMAT Null",
    "tuple_chain" ->
      "SELECT tuple(tuple(o_orderkey, o_totalprice), o_orderstatus).1.2 AS p FROM orders LIMIT 3",
    "todatetime_tz" ->
      "SELECT toDateTime64('2024-01-01 09:00:00', 3, 'Asia/Tokyo') AS t",
    // ---- round-13 wave: the fixed surfaces + untried corners ----
    "values_tablefn" ->
      "SELECT a, s FROM values('a Int32, s String', (1, 'x'), (2, 'y')) ORDER BY a",
    "values_noschema" ->
      "SELECT c1, c2 FROM values((1, 'x'), (2, 'y')) ORDER BY c1",
    "bracket_array_join" ->
      "SELECT a FROM orders ARRAY JOIN [7, 8] AS a LIMIT 4",
    "bare_combinators" ->
      "SELECT arrayCount([0, 1, 2]) AS c, arrayExists([0, 0]) AS e, arrayFirst([0, 5, 3]) AS f",
    "generate_random" ->
      "SELECT a, s FROM generateRandom('a Int32, s String', 7) LIMIT 5",
    "to_timezone" ->
      "SELECT toTimeZone(toDateTime('2024-01-01 12:00:00'), 'Asia/Tokyo') AS t",
    "accurate_cast" ->
      "SELECT accurateCastOrNull(300, 'Int8') AS a, accurateCast(77, 'Int16') AS b",
    "now64_prec" ->
      "SELECT now64(9) >= toDateTime('2020-01-01 00:00:00') AS ok",
    "format_dt_tokens" ->
      ("SELECT formatDateTime(toDateTime('2024-03-05 14:30:45'), '%a %b %d, %Y %r') AS s, " +
        "formatDateTime(toDateTime('2024-03-05 14:30:45'), '%Q of %Y at %H:%i:%S') AS q"),
    "summap_filtered_if" ->
      "SELECT sumMapFiltered([1, 2])(ks, vs) AS m FROM (SELECT array(1, 2, 3) AS ks, array(toInt64(10), 20, 30) AS vs)",
    "map_populate" ->
      "SELECT mapContains(map(1, 'a', 2, 'b'), 2) AS h, mapKeys(map(1, 'a')) AS ks",
    "array_enumerate2" ->
      "SELECT arrayEnumerate([9, 8, 7]) AS e, arrayCumSum([1, 2, 3]) AS cs, arrayDifference([5, 9, 4]) AS d",
    "transform_fn2" ->
      "SELECT transform(o_orderstatus, ['O', 'F'], ['open', 'full'], '?') AS t, count() AS n FROM orders GROUP BY t ORDER BY t",
    "neg_subscript" ->
      "SELECT [10, 20, 30][-1] AS last_el, [10, 20, 30][2] AS second",
    "exists_sub2" ->
      "SELECT count() AS n FROM orders WHERE EXISTS(SELECT 1 FROM customer WHERE c_custkey = o_custkey)",
    "global_in2" ->
      "SELECT count() AS n FROM orders WHERE o_custkey GLOBAL IN (SELECT c_custkey FROM customer LIMIT 100)",
    "ordinal_group" ->
      "SELECT o_orderstatus, count() AS n FROM orders GROUP BY 1 ORDER BY 1",
    "with_cube_kw" ->
      "SELECT o_orderstatus AS s, count() AS n FROM orders GROUP BY o_orderstatus WITH CUBE ORDER BY s NULLS FIRST",
    "countif_distinct" ->
      "SELECT uniqIf(o_custkey, o_totalprice > 1000) AS u FROM orders",
    "array_fold" ->
      "SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], toInt64(0)) AS s",
    "range_scalar" ->
      "SELECT range(3) AS r, range(2, 5) AS r2",
    "str_funcs2" ->
      ("SELECT countMatches('a1b2c3', '[0-9]') AS cm, extractAll('a1b2', '[0-9]') AS ea, " +
        "positionCaseInsensitive('Hello', 'LL') AS p"),
    "date_name" ->
      "SELECT dateName('month', toDate('2024-03-05')) AS m, monthName(toDate('2024-03-05')) AS mn",
    "to_unix_ts" ->
      "SELECT toUnixTimestamp(toDateTime('2024-01-01 00:00:00')) AS u, fromUnixTimestamp(1704067200) AS d",
    "if_not_finite" ->
      "SELECT ifNotFinite(1.0 / 0.0, -1.0) AS a, isFinite(2.5) AS b, isInfinite(1.0 / 0.0) AS c, isNaN(0.0 / 0.0) AS d",
    // ---- round-13 wave 2: more pasted-idiom corners ----
    "array_zip_rotate" ->
      "SELECT arrayZip([1, 2], ['a', 'b']) AS z, arrayRotateLeft([1, 2, 3], 1) AS rl",
    "array_intersect2" ->
      "SELECT hasAny([1, 2], [2, 9]) AS ha, hasAll([1, 2, 3], [1, 3]) AS hb, arrayIntersect([1, 2, 3], [2, 3, 4]) AS ai",
    "array_resize" ->
      "SELECT arrayResize([1, 2], 4) AS a, arrayResize([1, 2, 3], 2) AS b, arrayCompact([1, 1, 2, 2, 1]) AS c",
    "hex_bin" ->
      "SELECT hex(255) AS h, unhex('414243') AS u, bin(5) AS b, reverse('abc') AS r, repeat('ab', 3) AS rp",
    "multi_search" ->
      "SELECT multiSearchAny(text, ['spark', 'data']) AS m FROM documents LIMIT 5",
    "ngram_dist" ->
      "SELECT ngramDistance('hello', 'hallo') AS d, ngramSearch('hello world', 'hello') AS s",
    "cut_domain" ->
      "SELECT cutToFirstSignificantSubdomain('https://news.example.co.uk/path') AS d, firstSignificantSubdomain('https://news.example.co.uk/') AS f",
    "json_raw" ->
      ("SELECT JSONExtractArrayRaw('{\"a\":[1,2,3]}', 'a') AS ar, " +
        "JSONExtractRaw('{\"a\":{\"b\":1}}', 'a') AS r, " +
        "simpleJSONExtractString('{\"k\":\"v\"}', 'k') AS s"),
    "age_datediff" ->
      "SELECT age('day', toDate('2024-01-01'), toDate('2024-03-05')) AS d, toLastDayOfMonth(toDate('2024-02-05')) AS ld",
    "start_of_second" ->
      "SELECT toStartOfSecond(toDateTime64('2024-01-01 09:30:45.123', 3)) AS s, subtractMonths(toDate('2024-03-31'), 1) AS m",
    "readable_delta" ->
      "SELECT formatReadableTimeDelta(93784) AS d, formatReadableQuantity(1234567) AS q",
    "bitmask_list" ->
      "SELECT bitmaskToList(50) AS l, bitmaskToArray(50) AS a, bitCount(255) AS c",
    "char_ascii" ->
      "SELECT char(72, 105) AS c, ascii('A') AS a, chr(66) AS b",
    "tuple_named" ->
      "SELECT tupleNames(CAST((1, 'x') AS Tuple(a Int32, b String))) AS n",
    "url_extras" ->
      "SELECT queryString('https://h/p?a=1&b=2') AS qs, fragment('https://h/p#frag') AS f, netloc('https://u:p@h:8080/x') AS n",
    "encode_decode" ->
      "SELECT base64Encode('abc') AS e, base64Decode('YWJj') AS d, encodeURLComponent('a b&c') AS u, decodeURLComponent('a%20b') AS du",
    "math_corner" ->
      "SELECT intDiv(7, 2) AS i, intDivOrZero(7, 0) AS z, moduloOrZero(7, 0) AS m, gcd(12, 18) AS g, lcm(4, 6) AS l",
    "sign_degrees" ->
      "SELECT sign(-3.5) AS s, degrees(pi()) AS d, radians(180.0) AS r, cbrt(27.0) AS c",
    "trunc_banker" ->
      "SELECT roundBankers(2.5) AS rb, roundToExp2(20) AS r2, roundDuration(95) AS rd, roundAge(35) AS ra",
    "greatest_least2" ->
      "SELECT greatest(1, 5, 3) AS g, least(1, 5, 3) AS l, greatest('a', 'c') AS gs",
    // ---- round-13 wave 3 ----
    "utf8_family" ->
      "SELECT substringUTF8('héllo', 2, 3) AS s, reverseUTF8('héllo') AS r, positionUTF8('héllo', 'llo') AS p, upperUTF8('héllo') AS u",
    "left_right" ->
      "SELECT left('hello', 2) AS l, right('hello', 2) AS r, substringIndex('a.b.c', '.', 2) AS si",
    "split_regexp" ->
      "SELECT splitByRegexp('[0-9]+', 'a1b22c') AS s, splitByWhitespace('a  b\tc') AS w, tokens('a,b c') AS t",
    "hash_family" ->
      "SELECT sipHash64('abc') AS s, cityHash64('abc') AS c, farmFingerprint64('abc') AS f, intHash32(42) AS i, intHash64(42) AS i64, javaHash('abc') AS j",
    "relative_date" ->
      "SELECT toRelativeDayNum(toDate('2024-01-02')) AS d, toRelativeHourNum(toDateTime('2024-01-01 05:00:00')) AS h, toDayOfYear(toDate('2024-02-01')) AS dy, toISOWeek(toDate('2024-01-04')) AS iw, toISOYear(toDate('2024-01-01')) AS iy",
    "interval_make" ->
      "SELECT toIntervalDay(3) + toDate('2024-01-01') AS d, toIntervalMonth(2) + toDate('2024-01-15') AS m",
    "map_lambdas" ->
      "SELECT mapApply((k, v) -> (k, v * 2), map(1, 10, 2, 20)) AS ma, mapFilter((k, v) -> v > 10, map(1, 10, 2, 20)) AS mf",
    "tuple_arith" ->
      "SELECT tuplePlus((1, 2), (10, 20)) AS p, tupleMinus((5, 7), (1, 2)) AS m, dotProduct([1.0, 2.0], [3.0, 4.0]) AS dp",
    "vector_dist" ->
      "SELECT L2Distance([0.0, 3.0], [4.0, 0.0]) AS l2, cosineDistance([1.0, 0.0], [0.0, 1.0]) AS cd, L1Distance([1.0, 2.0], [3.0, 1.0]) AS l1",
    "rand_dists" ->
      "SELECT randUniform(0, 1) BETWEEN 0 AND 1 AS u, abs(randNormal(0, 1)) < 100 AS n, randBernoulli(0.5) IN (0, 1) AS b",
    "to_valid_utf8" ->
      "SELECT toValidUTF8('ok') AS v, normalizeUTF8NFC('é') != '' AS n",
    "week_modes" ->
      "SELECT toStartOfWeek(toDate('2024-01-04')) AS w0, toStartOfWeek(toDate('2024-01-04'), 1) AS w1, toWeek(toDate('2024-01-04'), 3) AS wk3",
    "snowflake_ts" ->
      "SELECT space(3) AS sp, repeat('-', 4) AS rp, initcap('hello world') AS ic",
    "base58" ->
      "SELECT base58Encode('abc') AS e, base58Decode(base58Encode('abc')) AS d, tryBase64Decode('###') AS t",
    "geo_fns" ->
      "SELECT greatCircleDistance(-1.0, 51.0, 0.0, 52.0) > 0 AS g, geohashEncode(-5.6, 42.6) AS gh",
    "arr_partial_sort" ->
      "SELECT arrayPartialSort(2, [3, 1, 2]) AS ps, arrayShuffle([1, 2, 3], 42) AS sh, arrayReverseFill(x -> x > 1, [1, 2, 1]) AS rf",
    "pos_neg_args" ->
      "SELECT substring('hello', -3) AS s, substring('hello', -3, 2) AS s2, trim(BOTH 'x' FROM 'xxhixx') AS t",
    // ---- round-13 wave 4 ----
    "env_fns" ->
      "SELECT hostName() != '' AS h, version() != '' AS v, currentDatabase() AS db, timezone() AS tz, uptime() >= 0 AS up, currentUser() AS u",
    "parse_best_effort" ->
      "SELECT parseDateTimeBestEffort('2024-01-15 10:30:00') AS a, parseDateTimeBestEffortOrNull('garbage') AS b, parseDateTime32BestEffort('15/01/2024') AS c",
    "stats_names" ->
      "SELECT skewPop(o_totalprice) AS sk, skewSamp(o_totalprice) AS sks, kurtPop(o_totalprice) AS ku, kurtSamp(o_totalprice) AS kus, varPop(o_totalprice) AS vp, stddevSamp(o_totalprice) AS sd, covarPop(o_totalprice, o_orderkey) AS cv, corr(o_totalprice, o_orderkey) AS cr FROM orders",
    "json_more" ->
      ("SELECT JSONType('{\"a\":[1]}', 'a') AS t, JSONExtractUInt('{\"a\":7}', 'a') AS u, " +
        "visitParamHas('{\"k\":1}', 'k') AS h, JSONKey('{\"x\":1}', 1) AS k"),
    "map_ops" ->
      "SELECT mapUpdate(map(1, 'a'), map(2, 'b'))[2] AS mu, mapConcat(map(1, 'a'), map(2, 'b'))[1] AS mc, mapAdd(map(1, 10), map(1, 5))[1] AS ma",
    "uuid_more" ->
      "SELECT toUUIDOrNull('nope') AS bad, toUUIDOrNull('61f0c404-5cb3-11e7-907b-a6006ad3dba0') IS NOT NULL AS ok, UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') != '' AS n",
    "reinterpret" ->
      "SELECT reinterpretAsUInt32(toString(char(1))) >= 0 AS r, reinterpretAsString(65) AS s",
    "date_or_zero" ->
      "SELECT toDateOrZero('nope') AS d, toDateTimeOrZero('nope') AS t, toInt32OrDefault('x', 9) AS i",
    "array_split" ->
      "SELECT arraySplit(x -> x = 0, [1, 2, 0, 3, 0, 4]) AS s, arrayReverseSplit(x -> x = 0, [1, 2, 0, 3]) AS rs",
    "year_week" ->
      "SELECT toYearWeek(toDate('2024-01-04')) AS yw, toISOWeek(toDate('2024-01-04')) AS iw",
    // ---- round-13 wave 5 ----
    "noop_hints" ->
      "SELECT materialize(7) AS m, ignore(o_orderkey, 'x') AS i, indexHint(o_orderkey > 5) AS h, count() AS n FROM orders GROUP BY m, i, h",
    "parse_mysql_fmt" ->
      "SELECT parseDateTime('2024*01*15', '%Y*%m*%d') AS p, parseDateTimeOrNull('bad', '%Y-%m-%d') AS pn, formatDateTimeInJodaSyntax(toDateTime('2024-01-15 10:30:00'), 'yyyy/MM/dd HH:mm') AS j, parseDateTimeInJodaSyntax('2024/01/15 10:30', 'yyyy/MM/dd HH:mm') AS jp",
    "snowflake" ->
      "SELECT dateTimeToSnowflake(toDateTime('2024-01-01 00:00:00')) AS sf, toString(snowflakeToDateTime(dateTimeToSnowflake(toDateTime('2024-01-01 00:00:00')))) AS rt",
    "width_bucket" ->
      "SELECT widthBucket(3.5, 0, 10, 5) AS w",
    "str_dist_more" ->
      "SELECT damerauLevenshteinDistance('abc', 'acb') AS d, jaroSimilarity('abc', 'abd') > 0 AS j, stringJaccardIndex('apple', 'apples') > 0.5 AS sj, byteHammingDistance('abc', 'abd') AS bh",
    // sleep()/sleepEachRow() reject loudly by design — pinned in
    // DialectStressSpec, not probed (a probe FAIL would read as a gap)
    "window_clause" ->
      ("SELECT o_orderkey, sum(o_totalprice) OVER w AS rt FROM orders " +
        "WINDOW w AS (ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "ORDER BY o_orderkey LIMIT 5"),
    "qualify_clause" ->
      ("SELECT o_custkey, o_orderkey FROM orders " +
        "QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1 LIMIT 5"),
    "setop_modifiers" ->
      ("SELECT o_orderstatus FROM orders INTERSECT DISTINCT SELECT o_orderstatus FROM orders " +
        "UNION ALL SELECT 'Z' EXCEPT DISTINCT SELECT 'Q'"),
    "case_insensitive_fns" ->
      "SELECT COUNTIF(o_totalprice > 1000) AS a, SUMIF(o_totalprice, o_orderstatus = 'O') AS b, toSTARTofMONTH(o_orderdate) AS m FROM orders GROUP BY m ORDER BY m LIMIT 2",
    "in_bracket" ->
      "SELECT count() AS n FROM orders WHERE o_orderkey IN [1, 2, 3]",
    "not_in_bracket" ->
      "SELECT count() AS n FROM orders WHERE o_orderstatus = 'O' AND o_orderkey NOT IN [1, 2]",
    "explain_syntax" ->
      "EXPLAIN SYNTAX SELECT o_orderkey FROM orders FINAL WHERE o_orderkey IN [1, 2] SETTINGS max_threads = 2",
    "explain_plan" ->
      "EXPLAIN SELECT count() FROM orders WHERE o_totalprice > 100",
    "explain_pipeline" ->
      "EXPLAIN PIPELINE SELECT count() FROM orders",
    "explain_estimate" ->
      "EXPLAIN ESTIMATE SELECT * FROM orders WHERE o_orderkey < 10",
    "explain_ast" -> "EXPLAIN AST SELECT 1",
    "explain_settings" -> "EXPLAIN header = 1, json = 0 SELECT 1",
    // ---- round-13 wave 6 ----
    "cast_fn_form" ->
      "SELECT CAST(o_orderkey, 'UInt32') AS a, CAST('1.5', 'Float64') AS b FROM orders LIMIT 3",
    "position_in_form" ->
      "SELECT position('lo' IN 'hello') AS p",
    "tuple_in" ->
      "SELECT count() AS n FROM orders WHERE (o_orderstatus, o_orderpriority) IN (('O', '1-URGENT'), ('F', '2-HIGH'))",
    "sum_count" ->
      "SELECT sumCount(o_totalprice) AS sc, countEqual([1, 2, 1], 1) AS ce FROM orders",
    "date_add_unit" ->
      "SELECT dateAdd('day', 3, toDate('2024-01-01')) AS a, dateAdd(DAY, 3, toDate('2024-01-01')) AS b, dateSub('month', 1, toDate('2024-03-15')) AS c, toDateTime('2024-01-01 00:00:00') + INTERVAL 2 HOUR AS d",
    "round_negative" ->
      "SELECT round(1234.5, -2) AS r, trunc(12.789, 1) AS t, truncate(12.789) AS t0, floor(12.7, 0) AS f",
    "exp_log" ->
      "SELECT exp10(3) AS e10, intExp2(10) AS i2, intExp10(3) AS i10, log1p(0.0) AS l1",
    "concat_coerce" ->
      "SELECT concat('k=', o_orderkey) AS c, concat(o_orderstatus, '-', o_totalprice) AS c2 FROM orders LIMIT 3",
    "readable_decimal" ->
      "SELECT formatReadableDecimalSize(1234567) AS d",
    "day_of_week_mode" ->
      "SELECT toDayOfWeek(toDate('2024-01-07')) AS d0, toDayOfWeek(toDate('2024-01-07'), 1) AS d1, toQuarter(toDate('2024-05-05')) AS q",
    // ---- round-14 wave (numeric truthiness + r13 verdict asks) ----
    "truthy_where_mod" ->
      "SELECT count() AS n FROM orders WHERE o_orderkey % 2",
    "truthy_where_position" ->
      "SELECT count() AS n FROM orders WHERE position(o_orderpriority, 'URGENT')",
    "truthy_if_num" -> "SELECT if(2, 'a', 'b') AS x",
    "truthy_and_or" ->
      "SELECT count() AS n FROM orders WHERE (o_orderkey % 2) AND (o_custkey % 3) OR 0",
    "truthy_settings_changed" ->
      "SELECT count() AS n FROM system.settings WHERE changed",
    "truthy_not" ->
      "SELECT count() AS n FROM orders WHERE NOT (o_orderkey % 2)",
    "truthy_multiif" ->
      "SELECT multiIf(o_orderkey % 2, 'odd', 'even') AS p, count() AS n FROM orders GROUP BY p ORDER BY p",
    "truthy_case" ->
      "SELECT CASE WHEN o_orderkey % 2 THEN 'odd' ELSE 'even' END AS p, count() AS n FROM orders GROUP BY p ORDER BY p",
    "truthy_having" ->
      "SELECT o_orderstatus, count() AS n FROM orders GROUP BY o_orderstatus HAVING count() % 2",
    "truthy_subquery" ->
      "SELECT count() AS n FROM orders WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 2)",
    "qualify_implicit_agg" ->
      "SELECT sum(o_totalprice) AS s FROM orders QUALIFY sum(o_totalprice) OVER () > 0",
    "qualify_implicit_agg_nested" ->
      "SELECT sum(o_totalprice) AS s FROM orders QUALIFY sum(sum(o_totalprice)) OVER () > 0",
    "qualify_distinct" ->
      "SELECT DISTINCT o_orderstatus, rank() OVER (ORDER BY o_orderstatus) AS r FROM orders QUALIFY r <= 2",
    "gen_random_ranges" ->
      "SELECT max(a) <= 255 AND min(a) >= 0 AS u8, max(b) <= 65535 AS u16, min(c) < 0 AS i8neg FROM (SELECT a, b, c FROM generateRandom('a UInt8, b UInt16, c Int8') LIMIT 1000)",
    "date_add_date_out" ->
      "SELECT dateSub('day', 2, toDate('2024-03-01')) AS d, dateAdd('month', 1, toDate('2024-01-31')) AS m, dateAdd('hour', 2, toDateTime('2024-01-01 00:00:00')) AS t",
    "uniq_combined_param" ->
      "SELECT uniqCombined(17)(o_custkey) AS u, uniq(o_custkey) AS u2 FROM orders",
    "wire_array_cells" ->
      "SELECT [1, 2, 3] AS arr, map('k', 1) AS m, CAST(1.5 AS DECIMAL(10,2)) AS d",
    "reinterpret_numeric" ->
      "SELECT reinterpretAsUInt32(65) AS a, reinterpretAsString(65) AS s",
    "accurate_cast_null" ->
      "SELECT accurateCast(NULL, 'UInt8') AS a, accurateCastOrNull(NULL, 'UInt8') AS b",
    "format_month_name" ->
      "SELECT formatDateTime(toDate('2024-03-05'), '%M %Y') AS m",
    "intexp_negative" ->
      "SELECT intExp10(3) AS a, intExp2(10) AS b",
    "snowflake_ms" ->
      "SELECT snowflakeToDateTime(dateTimeToSnowflake(toDateTime('2024-01-01 00:00:00'))) AS rt",
    "rand_dists" ->
      "SELECT randNormal() >= -1e9 AS a, randNormal(10, 2) >= -1e9 AS b, randUniform(0, 1) BETWEEN 0 AND 1 AS c",
    "truthy_lambda" ->
      "SELECT arrayFilter(x -> x % 2, [1, 2, 3, 4, 5]) AS f, arrayExists(x -> x - 1, [1, 1, 2]) AS e, arrayCount(x -> x % 2, [1, 2, 3]) AS c, arrayFirst(x -> x % 2, [2, 4, 5, 7]) AS fst, arrayAll(x -> x, [1, 2]) AS al",
    "transform_null_default" ->
      "SELECT transform(5, [1, 2], [10, 20], NULL) AS t, transform(1, [1, 2], [10, 20], NULL) AS t2",
    "explain_format_tail" ->
      "EXPLAIN SYNTAX SELECT count() FROM orders FORMAT TSV",
    "intexp10_negative" ->
      "SELECT intExp10(-2) AS a, intExp10(0) AS b",
    "truthy_where_alias" ->
      "SELECT o_orderkey % 2 AS odd FROM orders WHERE odd LIMIT 5",
    "truthy_join_on" ->
      "SELECT count() AS n FROM orders JOIN customer ON (o_custkey = c_custkey) AND (c_custkey % 2)",
    "truthy_values" ->
      "SELECT count() AS n FROM values('v Int64', (0), (1), (2)) WHERE v",
    "truthy_qualify" ->
      "SELECT o_custkey, o_orderkey FROM orders QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) % 2 LIMIT 10",
    "gen_random_more_types" ->
      "SELECT count() AS n FROM (SELECT * FROM generateRandom('d Date, t DateTime, s String, f Float64, dec Decimal(10,2), u UInt32, b Bool') LIMIT 100)",
    "truthy_cond_aggs" ->
      "SELECT countIf(o_orderkey % 2) AS a, sumIf(o_totalprice, o_custkey % 2) AS b, avgIf(o_totalprice, o_orderkey % 3) AS c, countIfOrNull(o_orderkey % 7) AS d FROM orders",
    // ---- round-14 wave 15 (gap finder: common CH idioms) ----
    "w15_age" ->
      "SELECT age('day', toDate('2024-01-01'), toDate('2024-03-05')) AS d, age('month', toDate('2023-01-15'), toDate('2024-03-05')) AS m",
    "w15_last_day" ->
      "SELECT toLastDayOfMonth(toDate('2024-02-05')) AS ld, toStartOfFifteenMinutes(toDateTime('2024-01-01 10:22:33')) AS f",
    "w15_now64" ->
      "SELECT now64() >= toDateTime('2020-01-01 00:00:00') AS a, toUnixTimestamp64Milli(toDateTime64('2024-01-01 00:00:00', 3)) AS ms",
    "w15_split_regexp" ->
      "SELECT splitByRegexp('[0-9]+', 'a1bb22ccc') AS parts, countSubstrings('hello hello', 'llo') AS cs",
    "w15_case_position" ->
      "SELECT positionCaseInsensitive('Hello World', 'WORLD') AS p, positionUTF8('héllo', 'llo') AS pu",
    "w15_array_zip" ->
      "SELECT arrayZip([1, 2], ['a', 'b']) AS z, arrayRotateLeft([1, 2, 3, 4], 1) AS rl",
    "w15_readable_delta" ->
      "SELECT formatReadableTimeDelta(3905) AS t, formatReadableQuantity(1234567) AS q",
    "w15_rand_more" ->
      "SELECT randPoisson(3) >= 0 AS p, randBinomial(10, 0.5) BETWEEN 0 AND 10 AS b, randExponential(2) >= 0 AS e",
    "w15_to_decimal" ->
      "SELECT toDecimal32('1.55', 2) AS d32, toDecimal64(3.14159, 4) AS d64, toDecimal32OrNull('xx', 2) AS bad",
    "w15_left_right" ->
      "SELECT left('hello', 2) AS l, right('hello', 2) AS r, leftUTF8('héllo', 2) AS lu",
    "w15_soundex" ->
      "SELECT soundex('Robert') AS s1, soundex('Rupert') AS s2",
    "w15_tobool" ->
      "SELECT toBool('true') AS a, toBool(1) AS b",
    "w15_shingles" ->
      "SELECT arrayShingles([1, 2, 3, 4], 2) AS sh",
    "w15_map_fns" ->
      "SELECT mapKeys(map('a', 1, 'b', 2)) AS k, mapValues(map('a', 1)) AS v, mapContains(map('a', 1), 'a') AS c",
    "w15_consistent_hash" ->
      "SELECT kostikConsistentHash(16045690984833335023, 2) AS h, jumpConsistentHash(42, 128) AS j",
    "w15_url_more" ->
      "SELECT cutQueryString('http://x.com/p?a=1') AS c, queryString('http://x.com/p?a=1&b=2') AS q, netloc('http://user:pw@x.com:8080/p') AS n",
    "w15_bit_ops" ->
      "SELECT bitRotateLeft(1, 3) AS rl, bitTest(5, 0) AS t0, bitTestAll(7, 0, 1) AS ta",
    "w15_ifnotfinite" ->
      "SELECT ifNotFinite(1/0, 99) AS a, isFinite(3.0) AS b, isInfinite(1/0) AS c, isNaN(0/0) AS d",
    // ---- wave 16 (discovery) ----
    "w16_array_enum" ->
      "SELECT arrayEnumerate([9, 8, 7]) AS e, arrayEnumerateDense([10, 20, 10]) AS d, arrayEnumerateUniq([10, 20, 10]) AS u",
    "w16_array_mut" ->
      "SELECT arrayPushBack([1, 2], 3) AS pb, arrayPushFront([1, 2], 0) AS pf, arrayPopBack([1, 2, 3]) AS ob, arrayPopFront([1, 2, 3]) AS of, arrayResize([1, 2], 4) AS rz, arrayWithConstant(3, 7) AS wc",
    "w16_group_uniq" ->
      "SELECT groupUniqArray(o_orderstatus) AS g, groupUniqArray(3)(o_orderpriority) AS d FROM orders",
    "w16_simple_json" ->
      "SELECT simpleJSONExtractString('{\"a\":\"x\"}', 'a') AS s, simpleJSONExtractInt('{\"n\": 42}', 'n') AS n, visitParamExtractString('{\"a\":\"x\"}', 'a') AS v",
    "w16_yyyymm" ->
      "SELECT toYYYYMM(toDate('2024-03-05')) AS ym, toYYYYMMDD(toDate('2024-03-05')) AS ymd, toYYYYMMDDhhmmss(toDateTime('2024-03-05 07:08:09')) AS full",
    "w16_month_name" ->
      "SELECT monthName(toDate('2024-03-05')) AS m, toModifiedJulianDay('2024-03-05') AS mjd",
    "w16_round_special" ->
      "SELECT roundToExp2(100) AS r2, roundDuration(95) AS rd, roundAge(35) AS ra",
    "w16_multi_search" ->
      "SELECT multiSearchAny(text, ['spark', 'data']) AS a, multiSearchAnyCaseInsensitive(text, ['SPARK']) AS ci FROM documents LIMIT 3",
    "w16_unix64" ->
      "SELECT fromUnixTimestamp64Milli(1704067200000) AS t, toUnixTimestamp64Micro(toDateTime64('2024-01-01 00:00:00', 6)) AS us",
    "w16_jaccard" ->
      "SELECT arrayJaccardIndex([1, 2, 3], [2, 3, 4]) AS j",
    "w16_map_hof" ->
      "SELECT mapApply((k, v) -> (k, v * 2), map('a', 1)) AS ma, mapFilter((k, v) -> v > 1, map('a', 1, 'b', 2)) AS mf, mapUpdate(map('a', 1), map('a', 9)) AS mu",
    "w16_normalize_query" ->
      "SELECT normalizeQuery('SELECT 1 + 2') AS nq, normalizedQueryHash('SELECT 1 + 2') >= 0 AS h",
    "w16_joda" ->
      "SELECT formatDateTimeInJodaSyntax(toDateTime('2024-03-05 07:08:09'), 'yyyy-MM-dd HH:mm:ss') AS j",
    "w16_bar" ->
      "SELECT bar(5, 0, 10, 10) AS b",
    // ---- wave 17 (discovery) ----
    "w17_add_days" ->
      "SELECT addDays(toDate('2024-01-01'), 3) AS a, subtractDays(toDate('2024-01-10'), 2) AS s, addMonths(toDate('2024-01-31'), 1) AS m, subtractYears(toDate('2024-02-29'), 1) AS y, addHours(toDateTime('2024-01-01 00:00:00'), 25) AS h",
    "w17_date_name" ->
      "SELECT dateName('month', toDate('2024-03-05')) AS m, dateName('weekday', toDate('2024-03-05')) AS w, dateName('year', toDate('2024-03-05')) AS yy",
    "w17_relative_num" ->
      "SELECT toRelativeDayNum(toDate('2024-01-01')) AS d, toRelativeHourNum(toDateTime('2024-01-01 05:00:00')) AS h, toRelativeMonthNum(toDate('2024-01-01')) AS m",
    "w17_array_cum" ->
      "SELECT arrayCumSum([1, 2, 3]) AS c, arrayCumSumNonNegative([1, -3, 4]) AS n, arrayDifference([5, 8, 4]) AS d, arrayProduct([2, 3, 4]) AS p",
    "w17_map_arith" ->
      "SELECT mapAdd(map('a', 1), map('a', 2, 'b', 1)) AS ma, mapConcat(map('a', 1), map('b', 2)) AS mc, mapPopulateSeries(map(1, 10, 4, 40)) AS mp",
    "w17_shingle_hash" ->
      "SELECT wordShingleSimHash('the quick brown fox jumps over', 3) AS w, ngramSimHash('abcdefgh', 3) AS n FROM system.one",
    "w17_bin_unbin" ->
      "SELECT bin(5) AS b, unbin('101') AS u, space(3) AS sp",
    "w17_ten_minutes" ->
      "SELECT toStartOfTenMinutes(toDateTime('2024-01-01 10:27:33')) AS t, toStartOfFiveMinutes(toDateTime('2024-01-01 10:27:33')) AS f",
    "w17_server_meta" ->
      "SELECT version() AS v, hostName() AS h, currentUser() AS u, currentDatabase() AS d, queryID() != '' AS q",
    "w17_uuid" ->
      "SELECT generateUUIDv4() != '' AS u, toUUID('61f0c404-5cb3-11e7-907b-a6006ad3dba0') AS t, UUIDStringToNum('61f0c404-5cb3-11e7-907b-a6006ad3dba0') != '' AS n",
    "w17_morton" ->
      "SELECT mortonEncode(3, 5) AS me",
    // ---- wave 18 (discovery) ----
    "w18_array_combinators" ->
      "SELECT sumArray(a) AS s, avgArray(a) AS av, minArray(a) AS mn, maxArray(a) AS mx, uniqArray(a) AS u, countArray(a) AS c, groupArrayArray(a) AS g FROM (SELECT array(o_orderkey % 5, o_orderkey % 3) AS a FROM orders LIMIT 100)",
    "w18_group_bits" ->
      "SELECT groupBitAnd(o_orderkey % 16) AS ba, groupBitOr(o_orderkey % 16) AS bo, groupBitXor(o_orderkey % 16) AS bx FROM orders",
    "w18_delta_kahan" ->
      "SELECT deltaSum(v) AS d, sumKahan(v * 0.1) AS k FROM (SELECT CAST(o_orderkey % 10 AS DOUBLE) AS v FROM orders ORDER BY o_orderkey LIMIT 100)",
    "w18_width_bucket" ->
      "SELECT widthBucket(7.5, 0, 10, 5) AS w",
    "w18_tokens" ->
      "SELECT tokens('the quick, brown fox!') AS t, splitByNonAlpha('ab1cd2ef') AS s",
    "w18_utf8_affix" ->
      "SELECT startsWithUTF8('héllo', 'hé') AS s, endsWithUTF8('héllo', 'llo') AS e",
    "w18_strdist2" ->
      "SELECT jaroWinklerSimilarity('martha', 'marhta') AS jw, jaroSimilarity('abc', 'abd') AS j, damerauLevenshteinDistance('ca', 'abc') AS dl",
    "w18_days_since_zero" ->
      "SELECT toDaysSinceYearZero(toDate('2024-01-01')) AS d, fromDaysSinceYearZero(toDaysSinceYearZero(toDate('2024-01-01'))) AS rt",
    "w18_snowflake_id" ->
      "SELECT snowflakeIDToDateTime(dateTimeToSnowflakeID(toDateTime('2024-01-01 00:00:00'))) AS rt",
    "w18_arg_if" ->
      "SELECT argMaxIf(o_orderkey, o_totalprice, o_orderkey % 2) AS am, argMinIf(o_orderkey, o_totalprice, o_orderkey % 2) AS an FROM orders",
    "w18_topk_if" ->
      "SELECT topKIf(3)(o_orderpriority, o_orderkey % 2) AS t FROM orders",
    "w18_interval_sum" ->
      "SELECT intervalLengthSum(s, e) AS l FROM (SELECT CAST(o_orderkey % 10 AS DOUBLE) AS s, CAST(o_orderkey % 10 + 2 AS DOUBLE) AS e FROM orders LIMIT 50)",
    // ---- wave 19 (discovery) ----
    "w19_frame_lag" ->
      "SELECT o_orderkey, lagInFrame(o_totalprice) OVER (ORDER BY o_orderkey) AS lg, leadInFrame(o_totalprice, 2) OVER (ORDER BY o_orderkey) AS ld, nth_value(o_totalprice, 2) OVER (ORDER BY o_orderkey) AS nv FROM orders LIMIT 5",
    "w19_neighbor_window" ->
      "SELECT neighbor(o_orderkey, 1) OVER (ORDER BY o_orderkey) AS n, neighbor(o_orderkey, -1) OVER (ORDER BY o_orderkey) AS p FROM orders LIMIT 5",
    "w19_row_blocks" ->
      "SELECT rowNumberInAllBlocks() AS r, blockNumber() >= 0 AS b FROM orders LIMIT 5",
    "w19_array_fold" ->
      "SELECT arrayFold((acc, x) -> acc + x, [1, 2, 3], CAST(10 AS BIGINT)) AS f",
    "w19_partial_sort" ->
      "SELECT arrayPartialSort(2, [5, 3, 1, 4]) AS ps, arrayShuffle([1, 2, 3]) AS sh, arrayRandomSample([1, 2, 3, 4], 2) AS rs",
    "w19_empty_arrays" ->
      "SELECT emptyArrayInt32() AS i, emptyArrayString() AS s, emptyArrayDate() AS d, emptyArrayToSingle(emptyArrayInt32()) AS single",
    "w19_scalar_range" ->
      "SELECT range(5) AS r, range(2, 7) AS r2, range(0, 10, 3) AS r3, arrayJoin(range(3)) AS j",
    "w19_empty_on_array" ->
      "SELECT empty([1, 2]) AS e, notEmpty([]) AS ne, empty('') AS es",
    // ---- wave 20 (discovery) ----
    "w20_count_matches" ->
      "SELECT countMatches('a1b22c333', '[0-9]+') AS cm, countSubstringsCaseInsensitive('Hello hello', 'HELLO') AS ci",
    "w20_has_subsequence" ->
      "SELECT hasSubsequence('garbage', 'arg') AS y, hasSubsequence('garbage', 'zzz') AS n",
    "w20_start_second" ->
      "SELECT toStartOfSecond(toDateTime64('2024-01-01 10:20:30.789', 3)) AS s, toMillisecond(toDateTime64('2024-01-01 10:20:30.789', 3)) AS ms",
    "w20_nullable_fns" ->
      "SELECT assumeNotNull(nullif(1, 2)) AS a, toNullable(5) AS n, ifNull(NULL, 7) AS i",
    "w20_type_name" ->
      "SELECT toTypeName(1) AS t, toTypeName('x') AS s, defaultValueOfTypeName('Int32') AS d",
    "w20_format_query" ->
      "SELECT formatQuery('SELECT 1, 2') AS f",
    "w20_array_setops" ->
      "SELECT arrayIntersect([1, 2, 3], [2, 3, 4]) AS i, arrayUnion([1, 2], [2, 3]) AS u, arraySymmetricDifference([1, 2], [2, 3]) AS sd",
    "w20_translate" ->
      "SELECT translate('abca', 'ab', 'xy') AS t, translateUTF8('héllo', 'é', 'e') AS u",
    "w20_concat_inj" ->
      "SELECT concatAssumeInjective('a', 'b', 'c') AS c, byteSize(42) >= 0 AS b",
    "w20_now_in_block" ->
      "SELECT nowInBlock() >= toDateTime('2020-01-01 00:00:00') AS n",
    "w20_has_all_any" ->
      "SELECT hasAll([1, 2, 3], [1, 2]) AS a, hasAny([1, 2], [9, 2]) AS y, hasSubstr([1, 2, 3, 4], [2, 3]) AS hs",
    // ---- format() table function ----
    "fmt_jsoneachrow" ->
      "SELECT a, b FROM format(JSONEachRow, '{\"a\": 1, \"b\": \"x\"}\\n{\"a\": 2, \"b\": \"y\"}') ORDER BY a",
    "fmt_csv_names" ->
      "SELECT name, score FROM format(CSVWithNames, 'name,score\\nalice,90\\nbob,85') ORDER BY name",
    "fmt_csv_bare" ->
      "SELECT c1, c2 FROM format(CSV, '1,\"a,b\"\\n2,plain') ORDER BY c1",
    "fmt_tsv" ->
      "SELECT c1, c2 FROM format(TSV, '1\\tx\\n2\\ty') ORDER BY c1",
    "fmt_values" ->
      "SELECT c1, c2 FROM format(Values, '(1, ''x''), (2, ''y'')') ORDER BY c1",
    "fmt_with_trailing_format" ->
      "SELECT a FROM format(JSONEachRow, '{\"a\": 5}') FORMAT CSV",
    // ---- wave 21 (discovery) ----
    "w21_url_hierarchy" ->
      "SELECT URLHierarchy('http://x.com/a/b?q=1') AS h, URLPathHierarchy('http://x.com/a/b') AS p, cutURLParameter('http://x.com/p?a=1&b=2', 'a') AS c",
    "w21_url_params" ->
      "SELECT extractURLParameters('http://x.com/p?a=1&b=2') AS ps, extractURLParameterNames('http://x.com/p?a=1&b=2') AS ns",
    "w21_url_encode" ->
      "SELECT encodeURLComponent('a b&c') AS e, decodeURLComponent('a%20b%26c') AS d, encodeURLFormComponent('a b') AS f",
    "w21_subdomain" ->
      "SELECT firstSignificantSubdomain('http://news.yandex.com.tr/') AS f, cutToFirstSignificantSubdomain('http://news.yandex.com.tr/x') AS c",
    "w21_gamma" ->
      "SELECT lgamma(5.0) AS lg, tgamma(5) AS tg, factorial(5) AS f",
    "w21_minmax2" ->
      "SELECT max2(3, 7) AS mx, min2(3, 7) AS mn, erf(1.0) BETWEEN 0.84 AND 0.85 AS e, erfc(1.0) BETWEEN 0.15 AND 0.16 AS ec",
    "w21_ip_range" ->
      "SELECT isIPAddressInRange('192.168.1.5', '192.168.0.0/16') AS a, isIPAddressInRange('10.0.0.1', '192.168.0.0/16') AS b",
    "w21_base_enc" ->
      "SELECT base64Encode('ab') AS b64, tryBase64Decode('YWI=') AS d, tryBase64Decode('!!!') AS bad, base32Encode('ab') AS b32",
    "w21_parse_timedelta" ->
      "SELECT parseTimeDelta('1 hour 30 minutes') AS td",
    "w21_initcap_utf8" ->
      "SELECT initcapUTF8('héllo wörld') AS i, initcap('hello world') AS p",
    "w21_ztest" ->
      "SELECT proportionsZTest(10, 11, 100, 101, 0.95, 'unpooled') AS z",
    // ---- wave 22 (aggregate discovery) ----
    "w22_moving" ->
      "SELECT groupArrayMovingAvg(3)(v) AS ma, groupArrayMovingSum(3)(v) AS ms FROM (SELECT CAST(o_orderkey % 7 AS DOUBLE) AS v FROM orders ORDER BY o_orderkey LIMIT 10)",
    "w22_insert_at" ->
      "SELECT groupArrayInsertAt(o_orderstatus, CAST(o_orderkey % 3 AS INT)) AS g FROM (SELECT * FROM orders LIMIT 10)",
    "w22_array_last" ->
      "SELECT groupArrayLast(3)(o_orderkey) AS g FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10)",
    "w22_mann_whitney" ->
      "SELECT mannWhitneyUTest(v, g) AS mw FROM (SELECT CAST(o_totalprice AS DOUBLE) AS v, CAST(o_orderkey % 2 AS TINYINT) AS g FROM orders LIMIT 200)",
    "w22_rank_corr" ->
      "SELECT rankCorr(CAST(o_totalprice AS DOUBLE), CAST(o_orderkey AS DOUBLE)) AS rc FROM orders",
    "w22_quantile_bounds" ->
      "SELECT quantileExactLow(0.5)(o_totalprice) AS lo, quantileExactHigh(0.5)(o_totalprice) AS hi, quantileExactExclusive(0.3)(o_totalprice) AS ex FROM orders",
    "w22_single_value" ->
      "SELECT singleValueOrNull(o_orderstatus) AS s FROM (SELECT o_orderstatus FROM orders WHERE o_orderstatus = 'F' LIMIT 5)",
    "w22_anova" ->
      "SELECT analysisOfVariance(CAST(o_totalprice AS DOUBLE), CAST(o_orderkey % 3 AS INT)) AS a FROM orders LIMIT 1",
    // ---- wave 23 (discovery) ----
    "w23_html" ->
      "SELECT extractTextFromHTML('<html><head><style>p{}</style></head><body><p>Hello <b>world</b>!</p><script>var x;</script></body></html>') AS t, decodeHTMLComponent('a &amp; b &lt;c&gt; &#65;') AS d",
    "w23_fixed_lc" ->
      "SELECT toFixedString('ab', 4) AS f, toLowCardinality('x') AS lc",
    "w23_uuid7" ->
      "SELECT generateUUIDv7() != '' AS u7, UUIDv7ToDateTime(generateUUIDv7()) >= toDateTime('2020-01-01 00:00:00') AS t",
    "w23_clamp" ->
      "SELECT clamp(15, 0, 10) AS c, clamp(-5, 0, 10) AS c2, positiveModulo(-7, 3) AS pm, moduloOrZero(7, 0) AS mz",
    "w23_locate" ->
      "SELECT locate('lo', 'hello') AS l, reverseUTF8('héllo') AS r, overlay('hello', 'XX', 2) AS o",
    "w23_regexp_extract" ->
      "SELECT regexpExtract('a1b22', '[0-9]+', 0) AS r0, regexpExtract('a1b22', '([a-z])([0-9]+)', 2) AS r2",
    "w23_timediff" ->
      "SELECT timeDiff(toDateTime('2024-01-01 00:00:00'), toDateTime('2024-01-01 01:30:00')) AS td",
    "w23_ip_more" ->
      "SELECT toIPv4OrNull('999.1.1.1') AS bad, toIPv4OrNull('10.0.0.1') AS ok, IPv4ToIPv6(IPv4StringToNum('10.0.0.1')) != '' AS v6",
    "w23_ulid" ->
      "SELECT generateULID() != '' AS u, isNullable(CAST(NULL AS Nullable(Int32))) AS n",
    // ---- wave 24 (discovery) ----
    "w24_xml" ->
      "SELECT encodeXMLComponent('a<b>&\"c\"') AS e, decodeXMLComponent('a&lt;b&gt;&amp;&quot;c&quot;') AS d",
    "w24_printf" ->
      "SELECT printf('%d says %s', 42, 'hi') AS p",
    "w24_timezone" ->
      "SELECT timeZone() AS tz, serverTimeZone() AS stz, timeZoneOf(now()) AS tzo",
    "w24_totime" ->
      "SELECT toTime(toDateTime('2024-03-05 07:08:09')) AS t",
    "w24_get_setting" ->
      "SELECT getSetting('max_threads') AS s",
    "w24_elem_or_null" ->
      "SELECT arrayElementOrNull([1, 2, 3], 5) AS a, arrayElementOrNull([1, 2, 3], 2) AS b",
    "w24_first_line" ->
      "SELECT firstLine('line1\\nline2') AS f",
    "w24_tuple_hamming" ->
      "SELECT tupleHammingDistance(tuple(1, 2, 3), tuple(1, 9, 3)) AS h",
    "w24_l2sq" ->
      "SELECT L2SquaredDistance([1.0, 2.0], [3.0, 4.0]) AS d, L1Distance([1.0], [4.0]) AS l1",
    "w24_generic_interval" ->
      "SELECT toDateTime('2024-01-01 00:00:00') + toIntervalDay(2) AS a",
    // ---- wave 25 (final discovery sweep) ----
    "w25_tojson" ->
      "SELECT toJSONString([1, 2, 3]) AS a, toJSONString(map('k', 1)) AS m, toJSONString('str') AS s, toJSONString(42) AS n",
    "w25_extract_groups" ->
      "SELECT extractAllGroupsHorizontal('a=1,b=2', '([a-z])=([0-9])') AS h, extractAllGroupsVertical('a=1,b=2', '([a-z])=([0-9])') AS v",
    "w25_map_hofs" ->
      "SELECT mapExists((k, v) -> v > 1, map('a', 1, 'b', 2)) AS e, mapAll((k, v) -> v > 0, map('a', 1)) AS a, mapSort(map('b', 2, 'a', 1)) AS s",
    "w25_array_shift" ->
      "SELECT arrayShiftLeft([1, 2, 3], 1) AS sl, arrayShiftRight([1, 2, 3], 1) AS sr, arrayRotateRight([1, 2, 3, 4], 1) AS rr",
    "w25_ngram" ->
      "SELECT ngramDistance('hello', 'hallo') AS d, ngramDistanceCaseInsensitive('HELLO', 'hello') AS ci",
    "w25_zero_null" ->
      "SELECT isZeroOrNull(0) AS z, isZeroOrNull(5) AS nz, isZeroOrNull(NULL) AS nl",
    "w25_col_type" ->
      "SELECT toColumnTypeName(1) AS t",
    "w25_bitmap_subset" ->
      "SELECT bitmapCardinality(bitmapSubsetInRange(bitmapBuild([1, 5, 10, 50]), 2, 20)) AS c, bitmapCardinality(subBitmap(bitmapBuild([1, 2, 3, 4, 5]), 1, 3)) AS s",
    "w25_has_column" ->
      "SELECT hasColumnInTable('default', 'orders', 'o_orderkey') AS h",
    "w25_join_get" ->
      "SELECT joinGet('t', 'v', 1) AS j",
    // ---- wave 26 (series/time-series family) ----
    "w26_tukey" ->
      "SELECT seriesOutliersDetectTukey([1.0, 2.0, 1.5, 100.0, 2.1, 1.8, 2.0, 1.9]) AS o",
    "w26_fft" ->
      "SELECT seriesPeriodDetectFFT([1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]) AS p",
    "w26_enum_ranked" ->
      "SELECT arrayEnumerateUniqRanked([10, 20, 10, 30, 10]) AS r",
    "w26_quantile_dd" ->
      "SELECT quantileDD(0.01, 0.5)(o_totalprice) AS q FROM orders",
    "w26_zip_unaligned" ->
      "SELECT arrayZipUnaligned([1, 2, 3], ['a']) AS z",
    // ---- wave 27 (round-15: chrono arithmetic + tz truncation) ----
    "w27_now_minus_int" ->
      "SELECT now() - 3600 AS t, now() + 60 AS u",
    "w27_dt_plus_int" ->
      "SELECT toDateTime('2024-01-01 00:00:00') + 86400 AS t",
    "w27_date_diff_int" ->
      "SELECT toDate('2024-01-02') - toDate('2024-01-01') AS days, toDateTime('2024-01-01 01:00:00') - toDateTime('2024-01-01 00:30:00') AS secs",
    "w27_agg_span" ->
      "SELECT max(o_orderdate) - min(o_orderdate) AS span FROM orders",
    "w27_tostartof_tz" ->
      "SELECT toStartOfHour(toDateTime('2024-03-05 07:38:09'), 'Asia/Tokyo') AS h, toStartOfDay(toDateTime('2024-03-05 07:38:09'), 'America/New_York') AS d, toStartOfMonth(toDateTime('2024-03-15 07:38:09'), 'UTC') AS m",
    "w27_timeslot_tz" ->
      "SELECT toStartOfFifteenMinutes(toDateTime('2024-03-05 07:38:09'), 'Asia/Kathmandu') AS s",
    "w27_uniq_tuple" ->
      "SELECT uniq(o_custkey, o_orderstatus) AS u, uniqCombined(o_custkey, o_orderstatus) AS uc, uniqExact(o_custkey, o_orderstatus) AS ue FROM orders",
    "w27_histogram" ->
      "SELECT histogram(5)(o_totalprice) AS h FROM orders",
    "w27_interval_cells" ->
      "SELECT INTERVAL 1 DAY AS d, INTERVAL 2 YEAR AS y",
    "w27_qualify_window" ->
      "SELECT o_custkey, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS a FROM orders QUALIFY avg(o_totalprice) OVER (PARTITION BY o_custkey) > 200000 LIMIT 5",
    "w27_totime_tz" ->
      "SELECT toTime(toDateTime('2024-03-05 07:08:09')) AS t",
    // ---- wave 28 (date spellings, typed JSON, geo, map aggs) ----
    "w28_yyyymmdd" ->
      "SELECT YYYYMMDDToDate(20240315) AS d, YYYYMMDDhhmmssToDateTime(20240315070809) AS t",
    "w28_json_typed" ->
      "SELECT JSONExtract('{\"a\": 7}', 'a', 'Int64') AS i, JSONExtract('{\"a\": [1,2]}', 'a', 'Array(Int64)') AS arr, JSONExtractKeysAndValues('{\"a\": 1, \"b\": 2}', 'Int64') AS kv",
    "w28_point_poly" ->
      "SELECT pointInPolygon((3.0, 3.0), [(6, 0), (8, 4), (5, 8), (0, 2)]) AS inside",
    "w28_map_forms" ->
      "SELECT maxMap(map('k', o_totalprice)) AS mm, sumMapWithOverflow([o_orderstatus], [1]) AS sm FROM orders",
    "w28_qiw" ->
      "SELECT quantileInterpolatedWeighted(0.5)(o_totalprice, 2) AS q FROM orders",
    "w28_group_intersect" ->
      "SELECT groupArrayIntersect(a) AS gi FROM (SELECT [1, 2, 3] AS a UNION ALL SELECT [2, 3, 4] UNION ALL SELECT [3, 2, 9])",
    "w28_lastday_week" ->
      "SELECT toLastDayOfWeek(toDate('2024-03-15')) AS lw, toLastDayOfWeek(toDate('2024-03-15'), 1) AS lwm",
    "w28_datetrunc_tz" ->
      "SELECT dateTrunc('week', toDateTime('2024-03-15 07:08:09')) AS w, dateTrunc('day', toDateTime('2024-03-05 07:38:09'), 'America/New_York') AS d",
    "w28_meanztest" ->
      "SELECT meanZTest(1.0, 1.0, 0.95)(o_totalprice, o_orderkey % 2) AS z FROM orders",
    "w28_age_names" ->
      "SELECT age('year', toDate('2020-01-15'), toDate('2024-06-20')) AS a, monthName(toDate('2024-03-15')) AS m, dateName('weekday', toDate('2024-03-15')) AS wd",
    // ---- wave 29 (dashboard/power-analysis stragglers) ----
    "w29_sparkbar" ->
      "SELECT sparkbar(5)(o_orderkey % 10, o_totalprice) AS sb, sparkbar(9)(o_orderkey % 9) AS counts FROM orders",
    "w29_sparkbar_bounded" ->
      "SELECT sparkbar(4, 0, 100)(o_orderkey % 100, o_totalprice) AS sb FROM orders",
    "w29_quantile_weighted" ->
      "SELECT quantileTDigestWeighted(0.5)(o_totalprice, 2) AS qtd, quantileTimingWeighted(0.9)(o_totalprice, 1) AS qtw FROM orders",
    "w29_min_sample" ->
      "SELECT minSampleSizeConversion(0.25, 0.03, 0.8, 0.05) AS mc, minSampleSizeContinous(200.0, 50.0, 0.05, 0.8, 0.05) AS ms",
    // ---- wave 30 (constructor/hash/geo/window stragglers) ----
    "w30_make_datetime" ->
      "SELECT makeDateTime(2024, 3, 15, 7, 8, 9) AS dt, makeDateTime64(2024, 3, 15, 7, 8, 9) AS dt64, makeDate(2024, 75) AS doy",
    "w30_hashes" ->
      "SELECT murmurHash3_64('graft') AS m64, murmurHash3_32('graft') AS m32, murmurHash2_64('graft') AS h2, hiveHash('graft') AS hh, byteSwap(toUInt32(3351772109)) AS bs",
    "w30_geo" ->
      "SELECT greatCircleAngle(-10.0, 45.0, 10.0, 45.0) AS a, pointInEllipses(10.0, 10.0, 10.0, 9.1, 1.0, 0.9999) AS pe",
    "w30_digits" ->
      "SELECT countDigits(toDecimal64(12.345, 3)) AS cd, countDigits(42) AS ci, toDecimalString(64.32, 5) AS ds",
    "w30_nn_derivative" ->
      "SELECT nonNegativeDerivative(v, t) OVER (ORDER BY t) AS d FROM (SELECT o_orderkey AS v, o_orderdate AS t FROM orders LIMIT 50)",
    "w30_untuple" ->
      "SELECT untuple(tuple(1, 'a')) FROM system.one",
    "w30_bit_slice" ->
      "SELECT bitSlice('Hello', 1, 8) AS b, bitTest(43, 1) AS t, bitHammingDistance(111, 109) AS hd",
    "w30_snowflake_gen" ->
      "SELECT generateSnowflakeID() AS s, generateUUIDv7() AS u",
    "w30_group_by_all" ->
      "SELECT o_orderstatus, o_orderpriority, count() AS c FROM orders GROUP BY ALL ORDER BY c DESC LIMIT 3",
    "w30_position_ch" ->
      "SELECT position('Hello, world!', '!') AS p, position('abc', 'b', 1) AS p2, locate('b', 'abc') AS l",
    "w30_extract_re" ->
      "SELECT extract('Hello123World', '[0-9]+') AS num, extract(o_orderpriority, '[A-Z]+') AS w FROM orders LIMIT 1",
    "w30_seq_next_node" ->
      "SELECT sequenceNextNode('forward', 'first_match')(ts, event_type, 1, event_type != '') AS nxt FROM (SELECT ts, event_type FROM events LIMIT 200)",
    "w30_interval_start" ->
      "SELECT toStartOfInterval(toDateTime('2024-03-15 07:38:09'), INTERVAL 15 MINUTE) AS t15",
    // ---- wave 31 (conversions/crypto/string stragglers) ----
    "w31_or_null_zero" ->
      "SELECT toUInt8OrNull('300') AS a, toUInt8OrNull('abc') AS b, toUInt16OrZero('x') AS c, toInt8OrNull('-130') AS d, toFloat32OrZero('bad') AS e, toUInt64OrNull(o_orderkey) AS f FROM orders LIMIT 1",
    "w31_char_tokens" ->
      "SELECT char(72, 105) AS hi, alphaTokens('abc1def2ghi') AS toks, hasTokenCaseInsensitive('Hello World', 'HELLO') AS ht",
    "w31_quote_meta" ->
      "SELECT regexpQuoteMeta('Hello.World(x)') AS q, leftPadUTF8('abc', 7, '*') AS lp",
    "w31_base64url" ->
      "SELECT base64URLEncode('https://example.com/a?b=c') AS e, base64URLDecode(base64URLEncode('https://example.com/a?b=c')) AS d",
    "w31_crypto" ->
      "SELECT decrypt('aes-256-cbc', encrypt('aes-256-cbc', 'secret', '32byteslongsecretkeyforaes256!!!', '16byteslongiv123'), '32byteslongsecretkeyforaes256!!!', '16byteslongiv123') AS rt",
    "w31_throw_schemas" ->
      "SELECT throwIf(0) AS ok, currentSchemas(true) AS cs, tupleToNameValuePairs(CAST((1, 2) AS STRUCT<a: INT, b: INT>)) AS nv",
    // ---- wave 32 (statement shapes + generator/merge TVFs) ----
    "w32_show_create" -> "SHOW CREATE TABLE orders",
    "w32_exists" -> "EXISTS TABLE orders",
    "w32_series" ->
      "SELECT sum(generate_series) AS s FROM generateSeries(2, 10, 3)",
    "w32_zeros" -> "SELECT count(*) AS n FROM zeros(7)",
    "w32_merge" ->
      "SELECT count() AS n FROM merge('default', '^orders$')",
    // ---- wave 33 (live ops system tables) ----
    "w33_processes" ->
      "SELECT count() AS inflight FROM system.processes",
    "w33_query_log" ->
      "SELECT count() AS logged FROM system.query_log",
    "w33_metrics" ->
      "SELECT metric, value FROM system.metrics WHERE metric = 'CPUCores'",
    "w33_disks_clusters" ->
      "SELECT (SELECT count() FROM system.disks) AS d, (SELECT cluster FROM system.clusters) AS c",
    // ---- wave 34 (array-end/token stragglers) ----
    "w34_array_end" ->
      "SELECT arrayLastIndex(x -> x = 2, [2, 1, 2, 3]) AS li, arrayFirstOrNull(x -> x > 9, [1]) AS fo, arrayLastOrNull(x -> x > 0, [1, 5]) AS lo",
    "w34_tokens_fuzzy" ->
      "SELECT hasAnyTokens(o_orderpriority, ['URGENT']) AS ha, editDistanceUTF8(o_orderstatus, 'O') AS ed FROM orders LIMIT 1",
    // ---- wave 37 (geo/PR-AUC/plural weighted/sub-second chrono) ----
    "w37_geo_wkt" ->
      "SELECT wkt((1.0, 2.0)) AS p, polygonAreaCartesian([[(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)]]) AS a, readWKTPoint('POINT(3 4)') AS rp, pointInPolygonCartesian((1.0, 1.0), [(0, 0), (4, 0), (4, 4), (0, 4)]) AS pip",
    "w37_pr_auc" ->
      "SELECT arrayPrAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1]) AS pr",
    "w37_quantiles_weighted" ->
      "SELECT quantilesExactWeighted(0.25, 0.5, 0.75)(o_totalprice, 2) AS q FROM orders",
    "w37_subsecond" ->
      "SELECT addMilliseconds(now(), 250) AS a, subtractNanoseconds(now(), 1500) AS b, timeZoneOffset(now()) AS o, fromUnixTimestamp64Second(1700000000) AS f",
    // ---- waves 38-39 (paste shims) ----
    "w38_prewhere_where" ->
      "SELECT count() AS n FROM orders PREWHERE o_orderkey % 2 = 0 WHERE o_totalprice > 100",
    "w38_arrayjoin_group" ->
      "SELECT arrayJoin(alphaTokens(o_orderpriority)) AS w, count() AS c FROM orders GROUP BY w ORDER BY c DESC, w LIMIT 3",
    "w39_window_alias" ->
      "SELECT o_orderstatus AS s, count() AS c, round(c / sum(c) OVER (), 4) AS share FROM orders GROUP BY s ORDER BY s",
    "w39_bare_using" ->
      "SELECT t1.a AS a FROM (SELECT 1 AS a) t1 ANY LEFT JOIN (SELECT 1 AS a, 2 AS b) t2 USING a",

    // ---- wave 40 (parametric FORMS: params-first class closure) ----
    "w40_group_array_n" ->
      "SELECT groupArray(3)(o_orderstatus) AS a, groupUniqArray(2)(o_orderstatus) AS b FROM orders",
    "w40_ttest_conf" ->
      "SELECT studentTTest(0.95)(o_totalprice, o_orderkey % 2).p_value AS p, welchTTest(0.9)(o_totalprice, o_orderkey % 2).ci_low AS cl FROM orders",
    "w40_mw_ks" ->
      "SELECT mannWhitneyUTest('two-sided')(o_totalprice, o_orderkey % 2).p_value AS mp, kolmogorovSmirnovTest('exact')(o_totalprice, o_orderkey % 2).p_value AS kp FROM orders",
    "w40_gk" ->
      "SELECT quantileGK(100)(o_totalprice) AS q, quantilesGK(100, 0.5, 0.9)(o_totalprice) AS qs, quantilesTiming(0.5, 0.9)(o_totalprice) AS qt FROM orders",
    "w40_bare_defaults" ->
      "SELECT quantile(o_totalprice) AS q, quantileExact(o_totalprice) AS qe, size(topK(o_orderpriority)) AS tk FROM orders",
    "w40_if_combinators" ->
      "SELECT quantileIf(0.9)(o_totalprice, o_orderstatus = 'F') AS qi, quantilesExactIf(0.5)(o_totalprice, o_orderstatus = 'F') AS qei, groupArrayIf(2)(o_orderkey, o_orderkey < 5) AS gai, groupUniqArrayIf(1)(o_orderstatus, true) AS gui FROM orders",
    "w40_intdiv_typename" ->
      "SELECT intDiv(-7, 2) AS a, intDivOrZero(-9, 4) AS b, toTypeName(1) AS t, toTypeName(array(1.5)) AS ta",

    // ---- waves 42-46 (retry lane + bounded state + arrayJoin) ----
    "w42_bool_aggs" ->
      "SELECT sum(o_totalprice > 100000) AS n, round(avg(o_orderstatus = 'F'), 4) AS share FROM orders",
    "w43_tuple_cmp" ->
      "SELECT count() AS n FROM orders WHERE (o_orderkey, o_custkey) > (100, 0) AND (o_orderstatus, o_orderkey % 2) IN (('F', 0), ('O', 1))",
    "w44_len_split" ->
      "SELECT length(map('a', 1)) AS lm, splitByNonAlpha('a1b c') AS sp",
    "w45_uniq_upto" ->
      "SELECT uniqUpTo(3)(o_custkey % 7) AS a, uniqUpTo(o_orderstatus) AS b FROM orders",
    "w46_arrayjoin_expr" ->
      "SELECT arrayJoin([1, 2]) * 10 + arrayJoin([1, 2]) AS v FROM orders WHERE o_orderkey = 0",

    // ---- waves 50-60 (r17: type defaults, declared types, stacks) ----
    "w50_shift_fill" ->
      "SELECT arrayShiftLeft([1,2,3], 1) AS a, arrayShiftRight(['a','b'], 1) AS b, arrayShiftLeft([1,2,3], -1) AS c, arrayResize([1,2], 4) AS d",
    "w50_hex_bin_pad" ->
      "SELECT hex(1) AS h1, hex(256) AS h2, bin(2) AS b1, hex('AB') AS hs",
    "w50_typename_declared" ->
      "SELECT toTypeName(toUInt8(1)) AS a, toTypeName(toUInt64OrNull('x')) AS b, toTypeName(toDecimal64(1.5, 2)) AS c, toTypeName(toDateTime64('2024-01-01 00:00:00', 3)) AS d",
    "w50_fromless_generators" ->
      "SELECT arrayJoin([1,2]) + 1",
    "w50_fromless_untuple" ->
      "SELECT untuple((1, 'a'))",
    "w51_subscript_defaults" ->
      "SELECT [100,200][5] AS oob, [100,200][0] AS zero, ['x','y'][9] AS oos, map('a',5)['z'] AS mz, arrayFirst(x -> x > 9, [1,2]) AS af",
    "w51_json_defaults" ->
      "SELECT JSONExtractInt(concat('{', char(34), 'a', char(34), ': 1}'), 'b') AS ji, JSONExtractString(concat('{}'), 'x') AS js",
    "w51_frame_fills" ->
      "SELECT lagInFrame(coalesce(toInt32(o_orderkey % 7), 0)) OVER (ORDER BY o_orderkey) AS lg FROM orders ORDER BY o_orderkey LIMIT 2",
    "w52_array_if_stacks" ->
      "SELECT sumArrayIf([1, 2], o_orderstatus = 'F') AS s, toInt64(countArrayIf([1], o_orderkey < 0)) AS c FROM orders",
    "w52_param_ornull" ->
      "SELECT quantileOrNull(0.5)(o_totalprice) AS a, quantileOrDefault(0.5)(o_totalprice) AS b FROM orders WHERE o_orderkey < 0",
    "w52_resample" ->
      "SELECT sumResample(0, 10, 5)(1, o_orderkey % 10) AS r FROM orders",
    "w53_subsecond_diff" ->
      "SELECT dateDiff('millisecond', toDateTime64('2024-01-01 00:00:00.100', 3), toDateTime64('2024-01-01 00:00:00.350', 3)) AS ms, toDateTime64('2024-01-01 00:00:00.350', 3) - toDateTime64('2024-01-01 00:00:00.100', 3) AS d",
    "w55_null_prop_scalars" ->
      "SELECT greatest(1, NULL, 3) AS g, least(2, NULL) AS l, arraySlice([1,2,3,4,5], -2) AS sl",
    "w56_left_right_neg" ->
      "SELECT left('hello', -2) AS l, right('hello', -2) AS r, fromUnixTimestamp(1700000000, '%Y-%m-%d') AS f",
    "w57_default_introspection" ->
      "SELECT defaultValueOfArgumentType(toUInt8(1)) AS a, defaultValueOfTypeName('Nullable(Int8)') AS b",
    "w58_with_macro_alias" ->
      ("WITH toStartOfMonth(o_orderdate) AS m SELECT m, count() AS n " +
        "FROM orders GROUP BY m ORDER BY m LIMIT 2"),
    "w60_null_args_propagate" ->
      "SELECT arrayElement(NULL, 1) AS a, [1,2,3][NULL] AS b, JSONExtractInt(NULL, 'a') AS c"
  )

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.CHFunctions.register(spark)
    graft.sql.TableEnv.register(spark, dir)
    // ad-hoc mode: Probe <dir> --sql "<stmt>" [...] shows each result
    if (args.length > 1 && args(1) == "--sql") {
      args.drop(2).foreach { sql =>
        println(s"[probe] SQL: $sql")
        try graft.sql.QueryGuard.plan(spark, sql).show(20, truncate = false)
        catch {
          case e: Throwable => println(s"[probe] ERROR: ${Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator.take(4).mkString(" | ")}")
        }
      }
      spark.stop()
      return
    }
    val wanted = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    var pass = 0
    val fails = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    snippets.filter(s => wanted.isEmpty || wanted(s._1)).foreach {
      case (label, sql) =>
        try {
          val n = graft.sql.QueryGuard.plan(spark, sql).collect().length
          pass += 1
          println(f"[probe] PASS $label%-22s rows=$n")
        } catch {
          case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(2).mkString(" | ").take(200)
            fails += ((label, msg))
            println(f"[probe] FAIL $label%-22s $msg")
        }
    }
    println(s"[probe] total pass=$pass fail=${fails.size}")
    fails.foreach { case (l, m) => println(s"[probe]   FAIL $l: $m") }
    spark.stop()
  }
}

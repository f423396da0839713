package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2 D6/D7).
  *
  * D6 `ann_bruteforce` is the exact baseline: the (small) query set is
  * broadcast, every candidate partition computes dot products map-side,
  * and the per-query top-k runs through the native
  * [[graft.functions.CosTopK]] partial aggregate — each map task reduces
  * its partition to ≤ k rows per query BEFORE the shuffle, so no
  * reducer ever sees a query's full candidate list (a `row_number`
  * window would funnel each query through one reducer). Verified
  * against DuckDB `list_cosine_similarity`.
  *
  * D7 `ann_ivf` is the 100 TB path: an IVF-style coarse quantizer.
  * Centroids are k-means-trained on a BOUNDED deterministic sample
  * (never the full corpus — at 100 TB the training job must not scale
  * with corpus size), every vector is assigned to its nearest cell via
  * a broadcast + `max_by` aggregation (partial-agg friendly; no window
  * exchange anywhere in the training or assignment path), queries probe
  * their `nprobe` nearest cells, and the top-k runs over probed cells
  * only — at 1000 executors the scan prunes to nprobe/n_cells of the
  * corpus. Rows-only for the driver; `AnnSpec` asserts recall vs the
  * brute-force truth.
  */
object Ann {

  private val K = 5
  private val NumQueries = 10
  private val NumCells = 16
  private val NProbe = 4

  /** Training-sample bound: Lloyd passes run over ≤ this many vectors,
    * hash-selected deterministically, regardless of corpus size. */
  private val TrainSample = 65536

  /** Embeddings as double vectors; similarity runs through the
    * codegen'd [[graft.functions.CosineSimilarity]] expression. */
  private def unitVectors(s: SparkSession, dir: String): DataFrame = {
    graft.functions.CHFunctions.register(s)
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private def dot(a: String, b: String): Column =
    expr(s"cosineSimilarity($a, $b)")

  /** Per-query exact top-k via the bounded [[graft.functions.CosTopK]]
    * partial aggregate; emits (q_id, neighbor, cos_sim, rn). */
  private def topK(scored: DataFrame): DataFrame =
    scored.groupBy("q_id")
      .agg(expr(s"cosTopK(struct(cos_sim, neighbor), $K)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.neighbor").as("neighbor"),
        col("t.cos_sim").as("cos_sim"), (col("pos") + 1).cast("int").as("rn"))
      .orderBy("q_id", "rn")

  /** D22b: the same top-k search over int8-QUANTIZED vectors — what a
    * memory-lean index actually scans (4× smaller than float32; the
    * difference between an in-memory index and one that spills).
    * Per-dim ranges come from one tiny aggregate and broadcast back;
    * every vector round-trips through the native codegen'd
    * [[graft.functions.QuantDequant]] (identical clamped-floor
    * arithmetic to `emb_quantize`, replayed exactly by the oracle), and
    * the search itself is the brute-force two-phase top-k. Quantized
    * rankings at this scale match the float rankings to 4dp. */
  val annQuantized: Q = (s, dir) => {
    val e = unitVectors(s, dir)
    val ranges = e
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("t"))
      .select(expr("transform(t, p -> p.mn)").as("mns"),
        expr("transform(t, p -> p.mx)").as("mxs"))
    val dq = e.join(broadcast(ranges))
      .select(col("vec_id"), expr("quantDequant(v, mns, mxs)").as("dqv"))
    val q = dq.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("dqv").as("qv"))
    val scored = dq.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "dqv"), 4).as("cos_sim"))
    topK(scored)
  }

  /** D6: exact cosine top-k, queries broadcast, two-phase top-k. */
  val annBruteforce: Q = (s, dir) => {
    val e = unitVectors(s, dir)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
    topK(scored)
  }

  /** Nearest-cell argmax per id as a PROJECTION (r20): the centroid
    * table is config-sized BY CONTRACT (NumCells rows, trained on the
    * driver), so it inlines as a literal into the codegen'd
    * [[graft.functions.NearestCell]] — identical assignments to the old
    * `max_by(cell, struct(ccos, -cell))` formulation (same cosine
    * arithmetic, ties to the lower cell id) with NO join, NO cells×
    * row expansion, and NO shuffle. The old shape's struct ordering and
    * carried vector disqualified hash aggregation, so it ran as a
    * SortAggregate over cells× the corpus. Requires `idCol` unique per
    * row (true for every caller — vec_id is the embeddings primary
    * key): the old groupBy would collapse duplicate ids to one row,
    * the projection keeps them per-row. AnnSpec pins the equivalence
    * including zero-norm and exact-tie vectors. */
  private[graft] def assignCells(df: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    graft.functions.CHFunctions.register(df.sparkSession)
    import df.sparkSession.implicits._
    val centArr = cents.selectExpr("cell", "cv").as[(Long, Seq[Double])]
      .collect().sortBy(_._1).toSeq
    df.select(col(idCol),
      call_function("nearestCell", col(vecCol), typedlit(centArr)).as("cell"),
      col(vecCol))
  }

  /** Deterministic bounded training sample WITHOUT a full-corpus
    * count, COLLECTED: escalate a hash modulus until the filtered set
    * fits the budget, where each probe's accept test and fetch are the
    * same `limit(budget+1)` scan — it stops as soon as budget+1
    * matching rows are found, so accepting-or-rejecting a dense sample
    * costs O(budget) rows, never O(corpus). A ratio-based filter would
    * need an exact n first — one full scan before any training — and
    * its integer threshold silently truncates to zero past ~65 B rows.
    * The result is ≤ [[TrainSample]] (id, vector) rows — MB-scale by
    * contract — plus whether the sample IS the whole corpus (the
    * common case at bench SFs), which lets callers reuse it for
    * seed/query/dim lookups instead of extra jobs. */
  private def collectBoundedSample(
      e: DataFrame, idCol: String): (Array[(Long, Array[Double])], Boolean) = {
    val spark = e.sparkSession
    import spark.implicits._
    def fetch(s: DataFrame): Array[(Long, Array[Double])] =
      s.select(col(idCol).cast("long"), col("v"))
        .limit(TrainSample + 1).as[(Long, Array[Double])].collect()
    var m = 1L
    while (m < (1L << 40)) {
      val rows = fetch(
        if (m == 1) e
        else e.filter(pmod(xxhash64(col(idCol)), lit(m)) === 0))
      if (rows.length <= TrainSample) return (rows, m == 1)
      m *= 64
    }
    (fetch(e.filter(pmod(xxhash64(col(idCol)), lit(1L << 40)) === 0)), false)
  }

  /** Seed vectors (`vec_id < k`): from the collected sample when it is
    * the whole corpus (free), else one pushed-filter job. */
  private def seedVectors(e: DataFrame,
      sample: Array[(Long, Array[Double])], whole: Boolean,
      k: Long): Array[(Long, Array[Double])] = {
    if (whole) sample.filter(_._1 < k).sortBy(_._1)
    else {
      val spark = e.sparkSession
      import spark.implicits._
      e.filter(col("vec_id") < k).select(col("vec_id"), col("v"))
        .as[(Long, Array[Double])].collect().sortBy(_._1)
    }
  }

  /** Cosine with EXACTLY [[graft.functions.VectorOps.cosine]]'s float
    * op order (fused dot/xx/yy accumulation, left-associated), so
    * driver-side Lloyd assignments agree bit-for-bit with the codegen'd
    * expression — and with the oracle's replay of it. */
  private def cosLocal(x: Array[Double], y: Array[Double]): Double = {
    var dot = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < x.length) {
      val xi = x(i); val yi = y(i)
      dot += xi * yi; xx += xi * xi; yy += yi * yi
      i += 1
    }
    if (xx == 0.0 || yy == 0.0) 0.0 else dot / math.sqrt(xx * yy)
  }

  /** Squared L2 with [[graft.functions.VectorOps.l2sq]]'s op order. */
  private def l2sqLocal(x: Array[Double], y: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); acc += d * d; i += 1 }
    acc
  }

  /** One driver-side Lloyd pass shared by IVF and PQ: assign each
    * sample vector to the best centroid under `better`, then recompute
    * per-cell FIXED-POINT means (micro-units summed as longs — exact,
    * order-independent, bit-identical to the former distributed
    * aggregation and to the DuckDB oracle replay). Cells that lose all
    * members drop out, like the groupBy they replace. Centroids are
    * scanned in ascending cell order with strict improvement, which IS
    * `max_by(cell, struct(score, -cell))` / `min_by(cell, struct(d2,
    * cell))` tie-breaking (ties keep the lowest cell). */
  private def lloydPass(
      vectors: Iterable[(Long, Array[Double])],
      cents: Array[(Long, Array[Double])],
      score: (Array[Double], Array[Double]) => Double,
      maximize: Boolean): Array[(Long, Array[Double])] = {
    val sums = scala.collection.mutable.HashMap
      .empty[Long, (Array[Long], Array[Long])] // fixed-point sums, count
    vectors.foreach { case (_, v) =>
      var bestCell = 0L
      var bestScore = 0.0
      var first = true
      var ci = 0
      while (ci < cents.length) {
        val (cell, cv) = cents(ci)
        val s = score(v, cv)
        if (first || (if (maximize) s > bestScore else s < bestScore)) {
          bestCell = cell; bestScore = s; first = false
        }
        ci += 1
      }
      val (sum, cnt) = sums.getOrElseUpdate(bestCell,
        (new Array[Long](v.length), new Array[Long](1)))
      var i = 0
      while (i < v.length) {
        sum(i) += math.floor(v(i) * 1e6 + 0.5).toLong
        i += 1
      }
      cnt(0) += 1
    }
    sums.toArray.sortBy(_._1).map { case (cell, (sum, cnt)) =>
      (cell, sum.map(s => s.toDouble / cnt(0) / 1e6))
    }
  }

  /** Lloyd iterations over a bounded deterministic sample, run ON THE
    * DRIVER: the sample is ≤ [[TrainSample]] vectors BY CONTRACT
    * (MB-scale, regardless of corpus size), so the whole training loop
    * is one collect job — where the distributed formulation paid a
    * count probe plus a broadcast-assign + (cell, dim) recompute job
    * PER PASS, all fixed overhead at any SF since the data volume never
    * grows. Assignment is nearest-by-cosine with ties to the lower cell
    * (exactly the former `max_by(cell, struct(ccos, -cell))`), and
    * centroid means are fixed-point micro-unit sums — exact,
    * order-independent, bit-identical to the distributed aggregation
    * this replaces and replayable by the DuckDB oracle. Seeded from the
    * first k vectors for reproducibility; empty cells drop out. */
  private[graft] def trainCentroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val (sample, whole) = collectBoundedSample(e, "vec_id")
    var cents = seedVectors(e, sample, whole, k)
    for (_ <- 0 until iters)
      cents = lloydPass(sample, cents, cosLocal, maximize = true)
    cents.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cv")
  }

  /** D7: IVF coarse quantizer — sample-trained centroids, `max_by`
    * nearest-cell assignment, nprobe-cell search, two-phase top-k. */
  val annIvf: Q = (s, dir) => {
    val e = unitVectors(s, dir)
    val cents = trainCentroids(e, NumCells, iters = 2)

    val assigned = assignCells(e, cents, "vec_id", "v")
      .select(col("cell"), col("vec_id"), col("v"))

    // the query set is tiny (NumQueries rows × NumCells candidates), so
    // a window rank for the nprobe cells is fine on the driver-scale side
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cell"), dot("qv", "cv").as("ccos"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))))
      .filter(col("crn") <= NProbe)
      .select(col("cell"), col("q_id"), col("qv"))

    // probe set is NumQueries × NProbe rows BY CONTRACT — broadcast it
    // (exactly like [[searchIndex]]) so the corpus-sized `assigned` side
    // is never shuffled by `cell`: 16 distinct cell keys would funnel
    // the whole corpus through ≤ 16 reducers (r20; the static plan
    // showed SortMergeJoin with both sides exchanged on cell)
    val scored = assigned.join(broadcast(queries), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
      .distinct() // a neighbor may appear via several probed cells
    topK(scored)
  }

  /** D7b: persist the IVF index — centroids plus assignments written
    * PARTITIONED BY cell, so a later [[searchIndex]] reads only the
    * probed cells' directories. Partition pruning is the disk-side
    * analog of the in-memory nprobe cut: at 100 TB the index build runs
    * once and every search scans nprobe/n_cells of the files, instead
    * of re-training and re-scanning per query batch. */
  def saveIndex(s: SparkSession, dir: String, indexDir: String): Unit = {
    val e = unitVectors(s, dir)
    val cents = trainCentroids(e, NumCells, iters = 2)
    cents.write.mode("overwrite").parquet(s"$indexDir/centroids")
    assignCells(e, cents, "vec_id", "v")
      .select(col("cell"), col("vec_id"), col("v"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$indexDir/cells")
  }

  /** Search a saved index: queries probe their nprobe nearest cells
    * (tiny, broadcast), and the join against the cell-partitioned store
    * dynamically prunes to the probed partitions. `queries` must carry
    * (q_id, qv). */
  def searchIndex(s: SparkSession, indexDir: String, queries: DataFrame): DataFrame = {
    graft.functions.CHFunctions.register(s)
    val cents = s.read.parquet(s"$indexDir/centroids")
    val assigned = s.read.parquet(s"$indexDir/cells")
    val probed = queries
      .join(broadcast(cents))
      .select(col("q_id"), col("qv"), col("cell"), dot("qv", "cv").as("ccos"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("ccos").desc, col("cell"))))
      .filter(col("crn") <= NProbe)
      .select(col("cell"), col("q_id"), col("qv"))
    val scored = assigned.join(broadcast(probed), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
      .distinct()
    topK(scored)
  }

  private val PqM = 8 // subspaces
  private val PqK = 32 // codes per subspace
  private val PqShortlist = 50 // ADC candidates kept for exact rerank

  /** Product-quantization codebooks: per-subspace k-means over the
    * bounded deterministic sample, run ON THE DRIVER like
    * [[trainCentroids]] — the sample collect is the only Spark job in
    * training (the distributed formulation paid a count probe, a seed
    * collect, a dim lookup, and one assign+recompute job per Lloyd
    * pass, all fixed overhead since the sample never scales with the
    * corpus). The codebook (m × k × dim/m doubles — KB-scale by
    * contract) is what the ADC tables are computed from. Cells that
    * lose all members drop out (standard empty-cell k-means behavior;
    * seeded from the first k vectors for reproducibility). */
  private[graft] def trainPqCodebooks(
      e: DataFrame, iters: Int): Seq[(Int, Long, Seq[Double])] = {
    val (sample, whole) = collectBoundedSample(e, "vec_id")
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    // a non-divisible dim would silently drop the trailing dims from
    // training AND scoring (quietly degraded recall); fail loudly
    val dim = sample.head._2.length
    require(dim % PqM == 0,
      s"PQ requires embedding dim divisible by $PqM subspaces, got $dim")
    val subLen = dim / PqM
    def sub(v: Array[Double], j: Int): Array[Double] =
      java.util.Arrays.copyOfRange(v, j * subLen, (j + 1) * subLen)
    val seeds = seedVectors(e, sample, whole, PqK)
    // all PqM subspace books advance together per pass, like the former
    // joint single-job loop; assignment is nearest-by-L2² with ties to
    // the lower cell (the former `min_by(cell, struct(d2, cell))`), and
    // the fixed-point micro-unit means keep the codebook bit-identical
    // to the distributed aggregation this replaces — which is what lets
    // the DuckDB oracle replay the whole training loop (a double avg()
    // differs in final ulps by summation order)
    val subSamples = Array.tabulate(PqM) { j =>
      sample.map { case (id, v) => (id, sub(v, j)) }.toSeq
    }
    val books = Array.tabulate(PqM) { j =>
      seeds.map { case (id, v) => (id, sub(v, j)) }
    }
    for (_ <- 0 until iters; j <- 0 until PqM)
      books(j) = lloydPass(subSamples(j), books(j), l2sqLocal, maximize = false)
    (for (j <- 0 until PqM; (cell, cv) <- books(j))
      yield (j, cell, cv.toSeq)).toSeq
  }

  /** D27: product-quantization ANN — the memory-lean scale path beyond
    * int8: each vector stores as [[PqM]] byte codes (m × log2(k) bits ≈
    * 8 bytes here vs 256 for float32), search scans CODES with
    * asymmetric-distance lookup tables and only the ADC shortlist
    * touches float vectors again for the exact rerank.
    *
    * Scale shape: encode is a pure per-row PROJECTION over the literal
    * codebook ([[graft.functions.PqEncode]], r21) — no corpus explode,
    * no join, no shuffle anywhere in the encode; the ADC
    * tables (queries × m × k dot products) are computed ON THE DRIVER
    * from the collected codebook + query set (both KB-scale by
    * contract) and broadcast; scoring is a narrow m-term lookup sum per
    * (vector, query); the per-query shortlist reduces through the
    * bounded [[graft.functions.CosTopK]] partial aggregate, so at no
    * point does a reducer see a query's full candidate list. The rerank
    * joins the (queries × shortlist)-sized id set — broadcast — back to
    * the float vectors and re-scores exactly, which is what makes the
    * emitted cos_sim values exact cosines ranked exactly. */
  val annPq: Q = (s, dir) => {
    import s.implicits._
    val e = unitVectors(s, dir)
    val book = trainPqCodebooks(e, iters = 2)

    // encode as a PROJECTION over the literal codebook (r21, guide
    // §2.3/§1.2 — same move as [[assignCells]]): the codebook is
    // KB-scale by contract, so [[graft.functions.PqEncode]] computes
    // all PqM codes per row with NO ×(subspaces × codewords) explode,
    // NO broadcast join, and NO aggregates. The old shape's min_by
    // carried a struct buffer, so its corpus×8-group aggregate ran
    // ObjectHashAggregate in sort-based fallback over corpus×256 rows,
    // then a second collect_list aggregate regrouped per vector.
    // Identical codes: ascending-cell strict improvement on the same
    // L2² arithmetic IS min_by(cell, struct(d2, cell)), and the array
    // is sub-ascending like the array_sort(collect_list) it replaces.
    val codes = {
      import s.implicits._
      val bookLit = typedlit(book.map { case (j, c, cv) => (j, c, cv) })
      e.select(col("vec_id"),
        call_function("pqEncode", col("v"), bookLit).as("codes"))
    }

    // query set + ADC lookup tables, driver-computed from the collected
    // codebook (queries are bounded by contract, the codebook is KB-scale)
    val qs = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq
    require(qs.nonEmpty,
      s"PQ search needs a non-empty query set (no vec_id < $NumQueries)")
    val subLen = qs.head._2.length / PqM
    val centMap = book.map { case (sub, cell, cv) => (sub, cell) -> cv }.toMap
    val adcRows = qs.map { case (qid, qv) =>
      val adc = Array.fill(PqM * PqK)(Double.MinValue)
      for (j <- 0 until PqM; c <- 0 until PqK) {
        centMap.get((j, c.toLong)).foreach { cv =>
          var dp = 0.0
          var t = 0
          while (t < subLen) { dp += qv(j * subLen + t) * cv(t); t += 1 }
          adc(j * PqK + c) = dp
        }
      }
      (qid, adc.toSeq)
    }

    // the ADC scan runs per query×vector pair — the native adcScore
    // loop keeps it inside codegen; the HOF aggregate(sequence(...))
    // formulation paid interpreted lambda dispatch per subspace per
    // pair, which is what dominates once the candidate set is
    // corpus-sized (at sf0.1 fixed job overhead hides it; at 100×
    // the scan is the cost)
    val scored = codes.join(broadcast(adcRows.toDF("q_id", "adc")),
        col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        expr(s"adcScore(codes, adc, $PqK)").as("approx_sim"))

    val shortlist = scored.groupBy("q_id")
      .agg(expr(s"cosTopK(struct(approx_sim, neighbor), $PqShortlist)").as("top"))
      .select(col("q_id"), explode(expr("transform(top, t -> t.neighbor)")).as("vec_id"))

    val exact = e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(qs.toDF("q_id", "qv")), "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor"),
        round(dot("qv", "v"), 4).as("cos_sim"))
    topK(exact)
  }

  val queries: Map[String, Q] = Map(
    "ann_bruteforce" -> annBruteforce,
    "ann_quantized" -> annQuantized,
    "ann_ivf" -> annIvf,
    "ann_pq" -> annPq)

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor,
         |    round(list_cosine_similarity(q.v, c.v), 4) AS cos_sim
         |  FROM e q JOIN e c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < $NumQueries),
         |r AS (
         |  SELECT q_id, neighbor, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_sim DESC, neighbor) AS rn
         |  FROM s)
         |SELECT q_id, neighbor, cos_sim, CAST(rn AS INT) AS rn FROM r
         |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin,
    // ann_ivf replays the ENTIRE pipeline — coarse-quantizer training
    // (2 Lloyd passes), cell assignment, nprobe probe selection, and
    // the probed-cells search — using the same exactness recipe as
    // ann_pq below: fixed-point centroid means (order-independent) and
    // cosine expressions unrolled left-associated to match the fused
    // CosineSimilarity loop term-for-term, so assignment argmaxes and
    // probe rankings agree bit-for-bit. Valid at driver SFs where the
    // training sample is the whole corpus (n ≤ 65536) and dim = 64.
    "ann_ivf" -> {
      // dot / sqrt(xx·yy) via list_dot_product, which accumulates in
      // element order — verified bit-identical to the fused
      // CosineSimilarity loop on this data (an unrolled left-assoc
      // sum agrees on every pair). The compact form matters: a 64-dim
      // unroll built a ~600-node expression tree whose per-thread
      // intermediate vectors ran the oracle engine out of memory at
      // sf0.1.
      def cos(a: String, b: String): String =
        s"CASE WHEN list_dot_product($a, $a) = 0 " +
          s"OR list_dot_product($b, $b) = 0 THEN 0 " +
          s"ELSE list_dot_product($a, $b) / " +
          s"sqrt(list_dot_product($a, $a) * list_dot_product($b, $b)) END"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |ps AS (SELECT unnest(generate_series(1, len(v))) AS pos FROM (SELECT v FROM e LIMIT 1)),
         |c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < $NumCells),
         |a1 AS (
         |  SELECT e.vec_id, e.v, c0.cell FROM e CROSS JOIN c0
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cos("e.v", "c0.cv")} DESC, c0.cell) = 1),
         |u1 AS (
         |  SELECT cell, pos,
         |    CAST(sum(CAST(floor(v[pos] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000 AS cx
         |  FROM a1 CROSS JOIN ps GROUP BY cell, pos),
         |c1 AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM u1 GROUP BY cell),
         |a2 AS (
         |  SELECT e.vec_id, e.v, c1.cell FROM e CROSS JOIN c1
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cos("e.v", "c1.cv")} DESC, c1.cell) = 1),
         |u2 AS (
         |  SELECT cell, pos,
         |    CAST(sum(CAST(floor(v[pos] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000 AS cx
         |  FROM a2 CROSS JOIN ps GROUP BY cell, pos),
         |c2 AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM u2 GROUP BY cell),
         |assigned AS (
         |  SELECT c2.cell, e.vec_id, e.v FROM e CROSS JOIN c2
         |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${cos("e.v", "c2.cv")} DESC, c2.cell) = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |probe AS (
         |  SELECT q.q_id, q.qv, c2.cell FROM q CROSS JOIN c2
         |  QUALIFY row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY ${cos("q.qv", "c2.cv")} DESC, c2.cell) <= $NProbe),
         |scored AS (
         |  SELECT DISTINCT p.q_id, a.vec_id AS neighbor,
         |    round(list_cosine_similarity(p.qv, a.v), 4) AS cos_sim
         |  FROM probe p JOIN assigned a ON a.cell = p.cell
         |  WHERE a.vec_id != p.q_id),
         |r AS (
         |  SELECT q_id, neighbor, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_sim DESC, neighbor) AS rn
         |  FROM scored)
         |SELECT q_id, neighbor, cos_sim, CAST(rn AS INT) AS rn FROM r
         |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin
    },
    // ann_pq replays the ENTIRE pipeline — PQ training (2 Lloyd
    // passes), encode, ADC scoring, shortlist, exact rerank — because
    // every float step is order-pinned: centroid means sum exact
    // fixed-point longs (order-independent), distances/dot products
    // are unrolled left-associated sums matching the Scala loops
    // term-for-term, and ties break identically ((d2, cell) asc /
    // (sim, neighbor) desc-asc). Valid at driver SFs where the
    // bounded training sample is the whole corpus (n ≤ 65536) and
    // dim = 64 (subLen 8). The subqueries mirror annPq stage names.
    "ann_pq" -> {
      val subLen = 8
      // (a-b)^2 summed left-assoc over the sub-vector, exactly the
      // L2SquaredDistance loop
      def d2(a: String, b: String) = (1 to subLen)
        .map(i => s"($a[$i] - $b[$i]) * ($a[$i] - $b[$i])").mkString(" + ")
      // dot(qv sub j, cv) left-assoc, exactly the driver ADC loop
      val qdot = (1 to subLen)
        .map(i => s"q.qv[n.j * $subLen + $i] * c2.cv[$i]").mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |js AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS j),
         |ps AS (SELECT unnest(generate_series(1, $subLen)) AS pos),
         |sv AS (
         |  SELECT vec_id, j, v[j * $subLen + 1 : j * $subLen + $subLen] AS sv
         |  FROM e CROSS JOIN js),
         |c0 AS (SELECT j, vec_id AS cell, sv AS cv FROM sv WHERE vec_id < $PqK),
         |a1 AS (
         |  SELECT sv.vec_id, sv.j, sv.sv, c0.cell
         |  FROM sv JOIN c0 ON c0.j = sv.j
         |  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.j
         |    ORDER BY ${d2("sv.sv", "c0.cv")}, c0.cell) = 1),
         |u1 AS (
         |  SELECT j, cell, pos,
         |    CAST(sum(CAST(floor(sv[pos] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000 AS cx
         |  FROM a1 CROSS JOIN ps GROUP BY j, cell, pos),
         |c1 AS (SELECT j, cell, list(cx ORDER BY pos) AS cv FROM u1 GROUP BY j, cell),
         |a2 AS (
         |  SELECT sv.vec_id, sv.j, sv.sv, c1.cell
         |  FROM sv JOIN c1 ON c1.j = sv.j
         |  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.j
         |    ORDER BY ${d2("sv.sv", "c1.cv")}, c1.cell) = 1),
         |u2 AS (
         |  SELECT j, cell, pos,
         |    CAST(sum(CAST(floor(sv[pos] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 1000000 AS cx
         |  FROM a2 CROSS JOIN ps GROUP BY j, cell, pos),
         |c2 AS (SELECT j, cell, list(cx ORDER BY pos) AS cv FROM u2 GROUP BY j, cell),
         |codes AS (
         |  SELECT sv.vec_id, sv.j, c2.cell AS code
         |  FROM sv JOIN c2 ON c2.j = sv.j
         |  QUALIFY row_number() OVER (PARTITION BY sv.vec_id, sv.j
         |    ORDER BY ${d2("sv.sv", "c2.cv")}, c2.cell) = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |terms AS (
         |  SELECT q.q_id, n.vec_id AS neighbor, n.j, $qdot AS term
         |  FROM codes n
         |  JOIN c2 ON c2.j = n.j AND c2.cell = n.code
         |  CROSS JOIN q
         |  WHERE n.vec_id != q.q_id),
         |approx AS (
         |  SELECT q_id, neighbor, ts[1]+ts[2]+ts[3]+ts[4]+ts[5]+ts[6]+ts[7]+ts[8]
         |    AS approx_sim
         |  FROM (SELECT q_id, neighbor, list(term ORDER BY j) AS ts
         |        FROM terms GROUP BY q_id, neighbor)),
         |shortlist AS (
         |  SELECT q_id, neighbor FROM approx
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY approx_sim DESC, neighbor) <= $PqShortlist),
         |exact AS (
         |  SELECT s.q_id, s.neighbor,
         |    round(list_cosine_similarity(q.qv, e.v), 4) AS cos_sim
         |  FROM shortlist s
         |  JOIN e ON e.vec_id = s.neighbor
         |  JOIN q ON q.q_id = s.q_id),
         |r AS (
         |  SELECT q_id, neighbor, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_sim DESC, neighbor) AS rn
         |  FROM exact)
         |SELECT q_id, neighbor, cos_sim, CAST(rn AS INT) AS rn FROM r
         |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin
    },
    "ann_quantized" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |comp AS (
         |  SELECT t.i AS pos, min(v[t.i]) AS mn, max(v[t.i]) AS mx
         |  FROM e, unnest(generate_series(1, len(v))) AS t(i)
         |  GROUP BY t.i),
         |mm AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
         |       FROM comp),
         |d AS (
         |  SELECT vec_id,
         |    list_transform(generate_series(1, len(v)), i ->
         |      CASE WHEN mxs[i] = mns[i] THEN mns[i]
         |           ELSE mns[i] + least(255.0, greatest(0.0,
         |             floor((v[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]) + 0.5)))
         |             * (mxs[i] - mns[i]) / 255.0
         |      END) AS dq
         |  FROM e CROSS JOIN mm),
         |s AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor,
         |    round(list_cosine_similarity(q.dq, c.dq), 4) AS cos_sim
         |  FROM d q JOIN d c ON c.vec_id != q.vec_id
         |  WHERE q.vec_id < $NumQueries),
         |r AS (
         |  SELECT q_id, neighbor, cos_sim,
         |    row_number() OVER (PARTITION BY q_id
         |                       ORDER BY cos_sim DESC, neighbor) AS rn
         |  FROM s)
         |SELECT q_id, neighbor, cos_sim, CAST(rn AS INT) AS rn FROM r
         |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin)
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scale-proof bench: replicates a
  * driver-generated SF directory `factor`× with key offsets, so the
  * result keeps join integrity (every lineitem still finds its order,
  * every order its customer) while row counts grow linearly — the
  * standard replicate-with-offset scale-up.
  *
  * Two tables are PERTURBED rather than copied verbatim, because exact
  * replication would change the WORKLOAD, not just the size:
  *
  *   - `documents.text` gains a per-copy suffix token — otherwise
  *     every document would have `factor` exact/near duplicates and
  *     the dedup operators would measure a degenerate
  *     everything-is-a-dup corpus instead of a bigger one
  *   - `embeddings.embedding` is cyclically rotated per copy —
  *     otherwise every vector would have `factor` cosine-1.0 twins
  *     and ANN/near-dup candidate sets would explode quadratically
  *
  * Dimension tables (`region`, `nation`) copy as-is: they are fixed
  * vocabularies, as in TPC-H, where nation count does not grow with
  * SF.
  *
  * Usage: ScaleData <srcDir> <outDir> <factor> */
object ScaleData {

  private val Off = 1000000000L // key offset per copy — far above any SF's key range

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-scale-data")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, factorS.toInt)
    spark.stop()
  }

  /** The replicate-with-offset body, callable from a live session
    * (Bench regenerates the sf1 subset data through this). */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {

    def src(t: String): DataFrame =
      spark.read.parquet(s"$srcDir/$t.parquet")

    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scale] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    // replicate df `factor` times, shifting the named BIGINT key
    // columns by copy * Off (a cross join against the copy-index
    // range keeps the whole thing one distributed plan)
    def replicate(df: DataFrame, keyCols: Seq[String])(
        perturb: (DataFrame, org.apache.spark.sql.Column) => DataFrame =
          (d, _) => d): DataFrame = {
      val copies = spark.range(factor).toDF("__copy")
      var out = df.crossJoin(broadcast(copies))
      keyCols.foreach { k =>
        out = out.withColumn(k, col(k) + col("__copy") * Off)
      }
      perturb(out, col("__copy")).drop("__copy")
    }

    write("region", src("region"))
    write("nation", src("nation"))
    write("customer", replicate(src("customer"), Seq("c_custkey"))())
    write("supplier", replicate(src("supplier"), Seq("s_suppkey"))())
    write("part", replicate(src("part"), Seq("p_partkey"))())
    write("orders",
      replicate(src("orders"), Seq("o_orderkey", "o_custkey"))())
    write("lineitem",
      replicate(src("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events",
      replicate(src("events"), Seq("event_id", "user_id"))())
    write("documents",
      replicate(src("documents"), Seq("doc_id")) { (d, copy) =>
        // copy 0 keeps the original text (the base corpus is a strict
        // subset); later copies SALT EVERY 5TH WORD with the copy id —
        // a trailing suffix is not enough (word-shingle sets would
        // stay ~identical, MinHash signatures would collide, and the
        // scaled corpus would degenerate into 10× duplicate clusters:
        // a different workload, with superlinear pair counts, rather
        // than a bigger one at the same duplicate density)
        d.withColumn("text",
          when(copy === 0, col("text"))
            .otherwise(concat_ws(" ", expr(
              """transform(split(text, ' '), (w, i) ->
                |  CASE WHEN i % 5 = 0 THEN concat(w, '_c', __copy)
                |       ELSE w END)""".stripMargin))))
          .withColumn("n_chars", length(col("text")))
      })
    write("embeddings",
      replicate(src("embeddings"), Seq("vec_id")) { (d, copy) =>
        // cyclic rotation BY THE COPY INDEX: same value distribution
        // and norm, and since factor < dim, every pair of copies has a
        // distinct non-zero relative rotation — no cosine-1.0 twins.
        // (A stride like copy*7 would alias back to rotation 0
        // whenever 7*Δcopy ≡ 0 mod dim, quietly recreating the
        // duplicate-cluster degeneracy this perturbation exists to
        // prevent.)
        val n = size(col("embedding"))
        val k = copy % n
        d.withColumn("embedding",
          when(copy === 0, col("embedding")).otherwise(
            concat(slice(col("embedding"), k + 1, n - k),
              slice(col("embedding"), lit(1), k))))
      })
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §4).
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but a hand-salted join is still the right tool when one
  * side has a handful of pathological keys (a boilerplate document
  * hash, a null-ish default id) and the other side is small enough to
  * replicate: the big side spreads each hot key over `factor` salted
  * partitions deterministically, the small side is replicated
  * `factor`× — so no single reducer owns a hot key.
  *
  * Semantics are identical to a plain equi-join (spec-checked); only
  * the partitioning changes.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each big-side key
    * over `factor` partitions. `small` is replicated `factor`×. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(factor)))
    val replicated = small.crossJoin(
      big.sparkSession.range(0, factor).toDF("__salt"))
    val out = salted.join(replicated,
      salted(key) <=> replicated(key) && salted("__salt") === replicated("__salt"),
      joinType)
    // project away the salt and the duplicated key column
    val smallCols = small.columns.filterNot(_ == key)
    out.select(
      big.columns.map(salted(_)) ++ smallCols.map(replicated(_)): _*)
  }
}

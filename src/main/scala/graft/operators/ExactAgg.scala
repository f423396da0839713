package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-exact floating aggregation for fixed-decimal ("money") columns.
  *
  * `sum(<double>)` in Spark merges per-partition partials in a
  * schedule-dependent order, so the low bits of the result vary run to
  * run. Rounding to 2 decimals does NOT remove the hazard: a true sum
  * that sits within ~1e-9 of a .xx5 boundary (observed: the sf0.01
  * customer BUILDING group, 1380975.7499999993) flips the rounded cell
  * between runs — exactly the q_ch_convert CORRECTNESS red of round 6.
  *
  * The TPC-H-ish money columns are exact 2-decimal values, and products
  * like `l_extendedprice * (1 - l_discount)` sit on a 4/6-decimal grid,
  * so the fix is to sum *integers*: scale each per-row value onto its
  * decimal grid, round to a long (the per-row double arithmetic is
  * IEEE-identical on Spark and DuckDB, so both engines get the same
  * integer), sum exactly in Long, and divide back once at the end.
  * Integer sums are associative — the result is independent of
  * partition count, scheduling, and merge order on BOTH engines.
  *
  * Long headroom: a 6-decimal-scaled charge is ~1e11 per row; 9.2e18 /
  * 1e11 ≈ 9e7 rows *per group* before overflow — and at larger scale
  * the same formulation holds with a wider grid or a DECIMAL sum.
  * The oracle SQL twin of each expression lives next to the query
  * (e.g. `round(sum(CAST(round(x * 100) AS BIGINT)) / 100.0, 2)`).
  */
object ExactAgg {

  /** Per-row value scaled onto its decimal grid as an exact Long. */
  def units(c: Column, scale: Long): Column =
    round(c * lit(scale.toDouble)).cast("long")

  /** Order-exact `round(sum(c), dp)` for a column on the 1/scale grid.
    * `dp` must match the grid's own decimals (2 for scale 100, 4 for
    * 1e4, ...): the final round is then a no-op on an on-grid value and
    * never lands near a .xx5 decision boundary, so the two engines'
    * rounding conventions can never disagree. Rounding a 4-decimal grid
    * sum to 2 decimals would hit an exact half-tie for ~1% of groups. */
  def sumExact(c: Column, scale: Long, dp: Int): Column =
    round(sum(units(c, scale)) / lit(scale.toDouble), dp)

  /** Order-exact `round(avg(c), dp)`: exact integer sum over the count
    * of non-null rows, divided back to the original unit. */
  def avgExact(c: Column, scale: Long, dp: Int): Column =
    round(sum(units(c, scale)) / count(c) / lit(scale.toDouble), dp)
}

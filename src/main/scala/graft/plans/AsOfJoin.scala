package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col

/** ASOF JOIN — the ClickHouse operator Spark lacks (reference dialect:
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`): for every left
  * row, the single right row with the same key and the greatest
  * `r.ts <= l.ts` — or, in the forward direction (`l.ts <= r.ts`), the
  * smallest `r.ts >= l.ts`. All four ClickHouse inequality forms are
  * covered by the `forward` × `strict` flags.
  *
  * Implemented the Spark-native way for an operator the built-ins can't
  * express without a range-join blowup:
  *
  *  - a [[AsOfJoinPlan logical node]],
  *  - a [[AsOfStrategy planner strategy]] (registered via
  *    `spark.experimental.extraStrategies` or `GraftExtensions`),
  *  - a [[AsOfJoinExec sort-merge physical operator]] that declares
  *    `ClusteredDistribution` on the keys and per-partition ordering on
  *    (keys, time) — Catalyst inserts exactly one hash shuffle + sort
  *    per side, then each partition merges its two sorted streams in
  *    one pass holding ONE buffered right row. No per-key candidate
  *    set, no O(left × right-per-key) intermediate — this is why the
  *    composed formulation (conditional join + max_by) loses at scale.
  */
object AsOf {

  /** Right columns are renamed `r_*` (fresh expr-ids, so self-joins
    * need no dedup) and become nullable in the output.
    *
    * `forward = false, strict = false` ≡ `l.ts >= r.ts` (the CH
    * default: latest right at or before); `strict` drops the equality;
    * `forward = true` flips to earliest right at/after. */
  def join(left: DataFrame, right: DataFrame,
      key: (String, String), time: (String, String),
      forward: Boolean = false, strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    val renamed = right.select(
      right.columns.toSeq.map(c => col(c).as(s"r_$c")): _*)
    val lPlan = planOf(left)
    val rPlan = planOf(renamed)
    val lKey = resolve(lPlan, key._1)
    val rKey = resolve(rPlan, s"r_${key._2}")
    val lTime = resolve(lPlan, time._1)
    val rTime = resolve(rPlan, s"r_${time._2}")
    graft.plans.Bridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lKey, rKey, lTime, rTime, forward, strict))
  }

  private def planOf(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  private def resolve(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not found in ${plan.output.map(_.name)}"))
}

final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    forward: Boolean = false,
    strict: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, strict) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean = false,
    strict: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // contract: emit UnsafeRows; bind against the NULLABLE output
      // schema (binding against raw rOut would read null fields as 0)
      val resultProj = UnsafeProjection.create(output, output)
      // NB: deliberately NOT named `buffered` inside an Iterator
      // subclass — an inherited member (Iterator.buffered) would
      // silently shadow an outer local of that name. The merge is a
      // plain Iterator.map so no such scope exists.
      val rBuf = rIter.buffered

      // Streaming merge via Iterator.map: left streams row-by-row.
      // Backward keeps the best (latest-so-far) consumed right row;
      // forward only ever PEEKS — the earliest admissible right row may
      // still match later left rows, so it is never consumed here.
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { l =>
        val lk = lKeyProj(l).copy().get(0, keyType)
        val lt = lTimeProj(l).copy().get(0, timeType)
        if (lk == null || lt == null) {
          // null keys/times match nothing (ClickHouse ASOF semantics)
          resultProj(joined(l, nullRight))
        } else {
          if (matchRow != null && keyOrd.compare(matchKey, lk) != 0) {
            matchRow = null; matchKey = null
          }
          var done = false
          while (!done && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r).copy().get(0, keyType)
            val rt = if (rk == null) null else rTimeProj(r).copy().get(0, timeType)
            if (rk == null) { rBuf.next() } // nulls sort first: discard
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next() } // behind the left key: discard
              else if (c == 0 && rt == null) { rBuf.next() } // unmatchable
              else if (c == 0 && !forward &&
                  (if (strict) timeOrd.compare(rt, lt) < 0
                   else timeOrd.compare(rt, lt) <= 0)) {
                matchRow = r.copy(); matchKey = rk // best so far; keep scanning
                rBuf.next()
              } else if (c == 0 && forward &&
                  (if (strict) timeOrd.compare(rt, lt) <= 0
                   else timeOrd.compare(rt, lt) < 0)) {
                rBuf.next() // too early to ever match this or later lefts
              } else done = true // right stream is ahead; stop
            }
          }
          // forward: the head (if same-keyed) is the earliest admissible row
          val fwdMatch: InternalRow =
            if (forward && rBuf.hasNext) {
              val r = rBuf.head
              val rk = rKeyProj(r).copy().get(0, keyType)
              if (rk != null && keyOrd.compare(rk, lk) == 0) r else null
            } else null
          val bwdOk = !forward && matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, lk) == 0
          val m = if (forward) fwdMatch else if (bwdOk) matchRow else null
          resultProj(joined(l, if (m != null) m else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

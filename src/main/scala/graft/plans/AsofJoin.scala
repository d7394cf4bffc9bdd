package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.GraftBridge

/** Native as-of join (SURVEY.md §4 names this as the one operator
  * justifying a custom SparkStrategy): for every left row, the single
  * latest right row with the same key and `rightTime <= leftTime`
  * (direction "backward", the default) or the earliest with
  * `rightTime >= leftTime` ("forward"), optionally bounded by a
  * tolerance on |rightTime − leftTime|; left-outer (right columns null
  * when no qualifying row exists).
  *
  * Why a custom operator instead of the composable forms (§2 #11):
  *
  *  - `join + filter + max_by` / `row_number` materializes every
  *    (left, right) pair inside the time range before reducing — on dense
  *    series that intermediate is quadratic per key.
  *  - This exec asks Catalyst for `ClusteredDistribution` on each side's
  *    keys and `(keys, time)` sort order, then streams BOTH sides once
  *    per partition: one shuffle per side, O(|L| + |R|) merge, O(1)
  *    buffered rows (the last matching right row). That plan shape is
  *    independent of key density — it is the form that survives 100 TB.
  *
  * Null semantics match SQL equality: null keys never match; a null right
  * time never satisfies `rt <= lt`; a null left time matches nothing.
  * Ties on (key, time): backward takes the duplicate that sorts last,
  * forward the one that sorts first (the cursor stops at the earliest
  * qualifying row) — pass a strictly-ordered time (or a composite, e.g.
  * `struct(ts, id)` on both sides) when exact tie determinism matters.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String,
    tolerance: Option[Long]) extends BinaryNode {
  require(AsofJoin.directions(direction),
    s"as-of direction must be one of ${AsofJoin.directions}, got $direction")
  require(tolerance.forall(_ >= 0), "as-of tolerance must be >= 0")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  val directions: Set[String] = Set("backward", "forward")

  /** Dataset-level API. The right side is re-projected through aliases so
    * a self-join (both sides deriving from the same scan, hence sharing
    * expression ids) stays unambiguous.
    *
    * @param direction "backward" (latest right with rt <= lt, the default)
    *                  or "forward" (earliest right with rt >= lt)
    * @param tolerance max |rt - lt| for a match, in the time column's
    *                  native unit (microseconds for timestamps); requires a
    *                  timestamp or integral time column
    */
  def apply(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join requires at least one equality key")
    val spark = left.sparkSession
    install(spark)
    // Coerce key/time pairs to a common type up front (analysis-time
    // behavior, like equi-join coercion) — the exec requires identical
    // types on both sides.
    val (l, r0) = coerce(left, right, on :+ leftTime, on :+ rightTime)
    if (tolerance.isDefined) {
      val tt = l.schema(leftTime).dataType
      require(AsofJoinExec.integralTime(tt),
        s"as-of tolerance requires a timestamp or integral time column, got $tt")
    }
    // Re-alias the right side so self-joins (shared expression ids) stay
    // unambiguous; resolve through df(name), which handles dotted and
    // duplicate names positionally, unlike functions.col.
    val r = r0.select(r0.columns.map(c => r0(c).as(c)).toIndexedSeq: _*)
    def resolve(df: DataFrame, name: String): Expression =
      GraftBridge.expression(df(name))
    val plan = AsofJoin(
      GraftBridge.analyzed(l), GraftBridge.analyzed(r),
      on.map(resolve(l, _)), on.map(resolve(r, _)),
      resolve(l, leftTime), resolve(r, rightTime), direction, tolerance)
    GraftBridge.ofRows(spark, plan)
  }

  /** Widen mismatched column pairs to their tightest common type; fail
    * fast at construction when no lossless widening exists. */
  private def coerce(left: DataFrame, right: DataFrame,
      lCols: Seq[String], rCols: Seq[String]): (DataFrame, DataFrame) = {
    var l = left
    var r = right
    lCols.zip(rCols).foreach { case (lc, rc) =>
      val lt = l.schema(lc).dataType
      val rt = r.schema(rc).dataType
      if (lt != rt) {
        val common = TypeCoercion.findTightestCommonType(lt, rt).getOrElse(
          throw new IllegalArgumentException(
            s"as-of join: no common type for $lc ($lt) vs $rc ($rt) — cast explicitly"))
        if (lt != common) l = l.withColumn(lc, l(lc).cast(common))
        if (rt != common) r = r.withColumn(rc, r(rc).cast(common))
      }
    }
    (l, r)
  }

  /** Register the planning strategy on a running session (idempotent;
    * synchronized so concurrent installs can't drop each other's write). */
  def install(spark: SparkSession): Unit = spark.experimental.synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }
}

/** Plans the logical AsofJoin to its physical merge exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, dir, tol) =>
      AsofJoinExec(lk, rk, lt, rt, dir, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge backward as-of join.
  *
  * Children are hash-clustered on their keys (EnsureRequirements makes the
  * two sides co-partitioned, inserting at most one exchange per side) and
  * sorted by (keys ASC, time ASC). Each output partition is then a single
  * forward pass over both sorted iterators, buffering only the latest
  * key-matching right row.
  */
object AsofJoinExec {
  import org.apache.spark.sql.types._
  /** Time types whose physical value is a long/int in native units, which
    * the tolerance check can subtract. */
  def integralTime(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    direction: String,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    require(rightKeys.map(_.dataType) == keyTypes,
      s"as-of key types differ: $keyTypes vs ${rightKeys.map(_.dataType)}")
    require(rightTime.dataType == timeType,
      s"as-of time types differ: $timeType vs ${rightTime.dataType}")
    require(tolerance.isEmpty || AsofJoinExec.integralTime(timeType),
      s"as-of tolerance requires a timestamp or integral time column, got $timeType")
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val forward = direction == "forward"
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      // native-unit time value, only consulted when tolerance is set (the
      // require above guarantees an integral representation then)
      def timeVal(row: UnsafeRow): Long = timeType match {
        case org.apache.spark.sql.types.IntegerType => row.getInt(0).toLong
        case org.apache.spark.sql.types.ShortType => row.getShort(0).toLong
        case org.apache.spark.sql.types.ByteType => row.getByte(0).toLong
        case _ => row.getLong(0)
      }

      new Iterator[InternalRow] {
        // The right row under the cursor, not yet consumed (key/time
        // copied out of the projection buffers so they survive advance).
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // Backward only: latest right row whose key matched a left key
        // already seen, with its time value for the tolerance check.
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _
        private var lastMatchT: Long = _

        private def loadRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rRow = r.copy()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).copy()
          } else { rRow = null; rKey = null; rTime = null }

        loadRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          if (lKey.anyNull) return resultProj(joined(l, nullRight))
          val lTime = lTimeProj(l)
          if (lTime.isNullAt(0)) return resultProj(joined(l, nullRight))
          // Consume right rows strictly before the left cursor position —
          // inclusive of equal times for backward, exclusive for forward;
          // unmatched-able rows (null key/time) sort first and are skipped.
          var continue = rRow != null
          while (continue) {
            if (rKey.anyNull || rTime.isNullAt(0)) loadRight()
            else {
              val kc = keyOrd.compare(rKey, lKey)
              val tc = if (kc == 0) timeOrd.compare(rTime, lTime) else 0
              val consume = kc < 0 || (kc == 0 && (if (forward) tc < 0 else tc <= 0))
              if (consume) {
                if (kc == 0 && !forward) {
                  lastMatch = rRow; lastMatchKey = rKey
                  if (tol.isDefined) lastMatchT = timeVal(rTime)
                }
                loadRight()
              } else continue = false
            }
            if (rRow == null) continue = false
          }
          val rMatch: InternalRow =
            if (forward) {
              // cursor row is the earliest key-equal right at/after lTime
              if (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
                  tol.forall(t => timeVal(rTime) - timeVal(lTime) <= t)) rRow
              else null
            } else {
              if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0 &&
                  tol.forall(t => timeVal(lTime) - lastMatchT <= t)) lastMatch
              else null
            }
          resultProj(joined(l, if (rMatch != null) rMatch else nullRight))
        }
      }
    }
  }
}

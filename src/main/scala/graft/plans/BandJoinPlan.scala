package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A NATIVE band (interval) join — the second whole-operator member of
  * the custom tier after [[AsOfJoin]]: for every left row, ALL right
  * rows of the same key whose time lies within ±`delta` of the left
  * time (inner semantics). The "events near events" shape: readings
  * around an alarm, clicks around a purchase, trades around a quote —
  * what Databricks' range-join optimization and KDB's window join
  * exist for.
  *
  * Why native: the declarative forms are a theta join (key equality +
  * band predicate), which Spark plans as a key-equi join whose band
  * filter runs AFTER a full per-key pair fan-out (quadratic in hot
  * keys), or the q205 bucket trick (explode to ⌈delta⌉-sized buckets +
  * equi-join, fan-out × 3 and a dedup). This exec CO-PARTITIONS on the
  * key and asks for per-partition (key, t) sorts — SortMergeJoin's
  * exact contract, free when the layout is already bucketed/sorted —
  * then streams ONE forward pass with a sliding window buffer whose
  * occupancy is the rows inside a 2·delta span per key: state scales
  * with the MATCH WINDOW, never the key's row count.
  *
  * Column contract (positional, enforced by [[graft.Graft.bandJoinNative]]):
  * left = (key: long, t: long, ...payload), right = (key: long, t: long,
  * v: string). Output = left columns ++ (t_match: long, v_match: string).
  */
case class BandJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    delta: Long,
    // constructor parameters with defaults (the AsOfJoin convention):
    // copy()/withNewChildren must preserve exprIds or parent references
    // to the produced attributes dangle after any tree transformation
    tMatch: AttributeReference =
      AttributeReference("t_match", LongType, nullable = false)(),
    vMatch: AttributeReference =
      AttributeReference("v_match", StringType, nullable = true)())
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ tMatch :+ vMatch
  // consume the positional (key, t) pair on the left and the whole right
  // row, so ColumnPruning cannot destroy the positional contract
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.take(2) ++ right.output)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(tMatch :: vMatch :: Nil)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BandJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[BandJoin]] as [[BandJoinExec]] (GraftExtensions /
  * experimental.extraStrategies, the AsOfJoinStrategy convention). */
object BandJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: BandJoin =>
      BandJoinExec(j.output, planLater(j.left), planLater(j.right), j.delta) :: Nil
    case _ => Nil
  }
}

/** Per-partition forward sweep of two (key, t)-sorted streams with a
  * sliding right-side window. Both streams advance monotonically:
  * right rows with key below the current fact key — or inside the key
  * but older than t − delta — can never match a LATER fact (facts are
  * (key, t)-sorted too), so they are consumed once and dropped; the
  * buffer holds exactly the right rows inside the current fact's
  * admissible band. */
case class BandJoinExec(
    override val output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan,
    delta: Long) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending), SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending), SortOrder(right.output(1), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.takeRight(2))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BandJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    // SQLMetrics merge per-task values by SUMMATION on the driver, so the
    // displayed number is the SUM of per-partition maxima, not a global
    // max — name it that way. Still useful as an upper bound on any one
    // window's occupancy (diagnostic: a blow-up shows up here first).
    "maxWindow" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "summed per-partition max band-window occupancy"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val maxWindow = longMetric("maxWindow")
    val nLeft = left.output.length
    val d = delta
    left.execute().zipPartitions(right.execute()) { (facts, rights) =>
      val rs = rights.buffered
      // the sliding window: (key, t, v) copies of admissible right rows
      val buf = scala.collection.mutable.ArrayDeque.empty[(Long, Long, UTF8String)]
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val joined = new Array[Any](nLeft + 2)
      val wrapper = new GenericInternalRow(joined)
      val leftTypes = left.output.map(_.dataType).toArray
      facts.flatMap { f =>
        val fKey = f.getLong(0)
        val fT = f.getLong(1)
        // SATURATING band bounds: the facade only requires delta >= 0,
        // and an epoch-µs timestamp plus a huge delta (Long.MaxValue as
        // "unbounded") would wrap fT + d negative — silently admitting
        // nothing — while fT - d on negative timestamps wraps positive
        // and evicts genuine matches (r15 review). Clamp to the Long
        // endpoints: exact for every sane input, correct ("the whole
        // axis") for the unbounded idiom.
        val hiBound = if (fT > Long.MaxValue - d) Long.MaxValue else fT + d
        val loBound = if (fT < Long.MinValue + d) Long.MinValue else fT - d
        // evict window rows that can no longer match this or any later fact
        while (buf.nonEmpty && {
          val h = buf.head; h._1 < fKey || (h._1 == fKey && h._2 < loBound)
        }) buf.removeHead()
        // discard right rows permanently below the band...
        while (rs.hasNext && {
          val h = rs.head
          val hk = h.getLong(0)
          hk < fKey || (hk == fKey && h.getLong(1) < loBound)
        }) rs.next()
        // ...and admit those inside it (copied: Spark reuses row objects)
        while (rs.hasNext && {
          val h = rs.head
          h.getLong(0) == fKey && h.getLong(1) <= hiBound
        }) {
          val r = rs.next()
          buf.append((r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) null else r.getUTF8String(2).clone()))
        }
        if (buf.length > maxWindow.value) maxWindow.set(buf.length)
        var i = 0
        while (i < nLeft) { joined(i) = f.get(i, leftTypes(i)); i += 1 }
        // one output row per window entry; every buffered row is inside
        // [fT − d, fT + d] by the evict/admit invariants above. copy():
        // the projection reuses one buffer, and flatMap consumers may
        // hold several of this fact's rows at once.
        buf.iterator.map { case (_, tr, v) =>
          joined(nLeft) = tr
          joined(nLeft + 1) = v
          numOutputRows += 1
          proj(wrapper).copy(): InternalRow
        }.toList
      }
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** A NATIVE backward as-of join — the whole-operator Catalyst tier of
  * the brief's custom-operator ladder (compose < Expression < LogicalPlan
  * + Strategy + SparkPlan < mapPartitions): for every fact row the
  * latest version row of the same key with version time ≤ fact time.
  *
  * The engine already expresses this semantics declaratively (q10's
  * union+window; `Graft.pointInTimeJoin`'s TTL variant) — that stays the
  * default. This operator exists for the case the declarative form can't
  * optimize: the union+window plan must interleave BOTH tables through
  * one sort, so a small version table re-sorts with every fact row. The
  * native exec instead CO-PARTITIONS the two inputs on the key
  * (`ClusteredDistribution`, the same contract SortMergeJoin declares),
  * asks Catalyst for a per-partition (key, t) sort on each side — both
  * requirements satisfied for free if the data is already bucketed or
  * sorted — and then streams a single forward merge pass: O(1) state
  * (the current version row), zero buffering, no row ever re-sorted.
  *
  * Column contract (positional, enforced by [[graft.Graft.asofJoinNative]]):
  * left = (key: long, t: long, ...payload), right = (key: long, t: long,
  * v: string). Output = left columns ++ `v_asof` (nullable string).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    // a constructor PARAMETER (with a default), not a body val: copy()/
    // withNewChildren must preserve the exprId or every parent reference
    // to v_asof dangles after any tree transformation
    vAsOf: AttributeReference =
      AttributeReference("v_asof", StringType, nullable = true)())
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ vAsOf
  // declare what the operator itself consumes: the positional (key, t)
  // pair on the left and the WHOLE right row. Without this,
  // ColumnPruning sees an expression-free node with no references and
  // prunes the right child to zero columns (and the left to whatever
  // the parent projects), destroying the positional contract.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.take(2) ++ right.output)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(vAsOf :: Nil)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (injectPlannerStrategy) or appended to
  * `spark.experimental.extraStrategies` by the facade. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.output, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Per-partition forward merge of two (key, t)-sorted streams.
  * Distribution/ordering requirements do the heavy lifting: Catalyst
  * inserts the hash exchanges and sorts only where the children don't
  * already satisfy them (AQE coalesces the shuffles like any join's). */
case class AsOfJoinExec(
    override val output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
      ClusteredDistribution(Seq(right.output.head)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output(0), Ascending), SortOrder(left.output(1), Ascending)),
    Seq(SortOrder(right.output(0), Ascending), SortOrder(right.output(1), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.last :: Nil)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // standard operator telemetry — shows up in the SQL UI / explain like
  // any builtin join's
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "facts matched to a version"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val nLeft = left.output.length
    left.execute().zipPartitions(right.execute()) { (facts, versions) =>
      val vs = versions.buffered
      // current carried version: key, t, value (copied — Spark reuses rows)
      var haveV = false
      var vKey = 0L
      var vVal: UTF8String = null
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val joined = new Array[Any](nLeft + 1)
      val wrapper = new GenericInternalRow(joined)
      val leftTypes = left.output.map(_.dataType).toArray
      facts.map { f =>
        val fKey = f.getLong(0)
        val fT = f.getLong(1)
        // advance versions to the last one with (key, t) ≤ (fKey, fT);
        // both streams are (key, t)-sorted, so this never rewinds
        while (vs.hasNext && {
          val h = vs.head
          val hk = h.getLong(0)
          hk < fKey || (hk == fKey && h.getLong(1) <= fT)
        }) {
          val r = vs.next()
          haveV = true
          vKey = r.getLong(0)
          vVal = if (r.isNullAt(2)) null else r.getUTF8String(2).clone()
        }
        var i = 0
        while (i < nLeft) {
          joined(i) = f.get(i, leftTypes(i)); i += 1
        }
        val matched = haveV && vKey == fKey
        joined(nLeft) = if (matched) vVal else null
        numOutputRows += 1
        if (matched) numMatched += 1
        // the projection copies field bytes into its UnsafeRow buffer
        // immediately, so reusing `joined`/`wrapper` across rows is safe
        proj(wrapper)
      }
    }
  }
}

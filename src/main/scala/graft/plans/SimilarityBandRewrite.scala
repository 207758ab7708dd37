package graft.plans

import graft.functions.{FloatDot, Hyperplanes}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: brute-force all-pairs vector similarity → banded
  * sign-LSH candidate join above the measured size crossover (VERDICT
  * r11/r12 item 1 — the engine's one systematic scale trap).
  *
  * The trap: a user writes the natural brute-force shape
  *
  * {{{ a.join(b, $"id_a" < $"id_b")           // or =!= ; NO equi key
  *      .select(graft_dot($"ea", $"eb"), ...) // per-pair vector math }}}
  *
  * which plans a BroadcastNestedLoop/Cartesian whose cost is the full
  * |a|×|b| pair space. Fine for a bounded probe set (the house helpers
  * gate on [[graft.operators.Joins.MaxCrossProbe]]); a cluster-killer at
  * corpus scale. ScalePathSuite measured the crossover where the banded
  * LSH path wins: 24k×3k pairs (≈72M), brute 72.2 s vs indexed 10.0 s
  * (7.2×) — and the gap only widens with n².
  *
  * Above that pair estimate this rule substitutes the q124/q314 banded
  * plan: both sides gain the canonical 32-bit hyperplane signature
  * ([[Hyperplanes]] — bit-identical to the q124/q314 index builders),
  * explode to 8×4-bit band keys, and the nested loop becomes an
  * EQUI-join on the band key. A first-matching-band conjunct keeps
  * exactly one copy of each colliding pair (no Distinct needed), and the
  * original theta condition rides along unchanged. The rewritten output
  * is a SUBSET of the brute-force pairs with identical values — the
  * standard LSH candidate semantics (recall measured ≥ 0.9 by q291's
  * audit at the index configuration this rule shares).
  *
  * Because the rewrite is candidate-pruning (approximate), it fires only
  * when ALL of the following hold, and each is a deliberate contract:
  *  - `spark.graft.similarity.autoIndex` is true (default; the opt-out
  *    for exact-at-any-cost runs such as recall-audit ground truths);
  *  - the join is Inner/Cross with NO equi-key conjunct (an equi key
  *    means the pair space is already bucketed — including by this rule
  *    itself, which makes the rewrite idempotent under the fixed-point
  *    batch);
  *  - NEITHER side carries an explicit broadcast hint: `broadcast(df)`
  *    is the user's bounded-probe declaration — the same contract
  *    MaxCrossProbe enforces at runtime — and a hinted probe×corpus scan
  *    is linear in the corpus, not quadratic, so it is honored;
  *  - the join condition or the adjacent Project/Filter contains the
  *    house similarity kernel ([[FloatDot]], which cosine builds on)
  *    applied to one bare array<float> attribute from EACH side — mere
  *    co-occurrence of float-array columns (zip_with / struct / concat
  *    over an intentional cross join) never fires;
  *  - the estimated pair count `rows(l)·rows(r)` exceeds
  *    `spark.graft.similarity.autoIndexPairs` (default 72e6, the
  *    measured crossover). Estimates come from `LogicalPlan.stats`
  *    (row count under CBO, sizeInBytes/row-width otherwise) — the same
  *    statistics the join-strategy planner trusts. A side whose
  *    sizeInBytes is the spark.sql.defaultSizeInBytes "I know nothing"
  *    sentinel (LogicalRDD, streaming relations) counts as UNKNOWN and
  *    the rule fails closed: exactness only ever degrades to candidate
  *    pruning on evidence, never on a missing statistic.
  *
  * 100 TB rationale: this is the enforcement layer the q124/q314 index
  * paths were missing — the engine no longer relies on the query AUTHOR
  * choosing the scale path; the optimizer swaps it in exactly where the
  * measured crossover says brute force loses. PlanRuleSuite asserts
  * fire-on-large, no-fire-at-fixture-scale, subset-with-identical-values
  * semantics, pair dedup, idempotence, and (narrow path) that no payload
  * column rides the band exchange.
  *
  * Two rewrite shapes (VERDICT r14 item 1 — the narrow refinement):
  *
  *  - NARROW (preferred), when EACH side's output is exactly one scalar
  *    attribute + the vector — the "usable row identity" case, which is
  *    precisely the (id, embedding) projection every similarity query in
  *    the suite feeds the join. This is the hand-written q124/q314 plan:
  *    each side contributes only (id, signature) to the ×NBands explode,
  *    the band equi-join emits candidate ID PAIRS, an id-level Aggregate
  *    dedups them (two row pairs sharing an id pair must yield one
  *    candidate), and the payloads re-attach by ONE equi-join per side.
  *    Payload bytes move ×1 instead of ×NBands; the band exchange
  *    carries ~24-byte rows regardless of vector width. Multiplicity is
  *    exact even under duplicate ids: the candidate set is deduped at
  *    the id level, so re-attachment emits each qualifying row pair
  *    exactly once — the same semantics as the hand-written index
  *    operators, which also join back by id. (Like them, a NULL id
  *    cannot survive the inner re-attach equi-join, so NULL-id rows
  *    contribute no candidates — still a subset of the brute pairs.)
  *
  *  - WIDE (fallback), when a side carries extra payload columns: the
  *    band equi-join moves each side ×NBands INCLUDING payloads (a
  *    logical rule cannot conjure a row identity that isn't there, and a
  *    nondeterministic synthetic id breaks under recomputation). Still
  *    O(n·NBands) rows moved versus the nested loop's O(n²) pair
  *    evaluations; an author who wants the narrow join on a wide frame
  *    projects to (id, vector) first — or writes q124/q314 directly.
  */
object SimilarityBandRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.similarity.autoIndex"
  val PairsKey = "spark.graft.similarity.autoIndexPairs"

  /** Default pair-count crossover: ScalePathSuite's measured 24k×3k. */
  val DefaultPairs: Long = 72L * 1000 * 1000

  /** Bytes-per-row guess when only sizeInBytes is known — an embedding
    * row (64 float4 + id + parquet overhead) is ≈300 bytes; erring LOW
    * on bytes errs HIGH on rows, i.e. toward firing, which at pair
    * counts this size is the safe direction. */
  private val EstRowBytes = 256L

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private def pairsThreshold: BigInt =
    BigInt(conf.getConfString(PairsKey, DefaultPairs.toString).toLong)

  /** Below this estimated row count a side is "provably small": the
    * join is linear, not quadratic, and must not be rewritten (the
    * eligible() scaladoc narrates the q302 incident). 4096 ≫ any house
    * probe set (≤10) yet far below the smallest corpus the ×8-band
    * exchange pays for. */
  val SmallSideFloorKey = "spark.graft.similarity.smallSideFloor"
  private def smallSideFloor: BigInt =
    BigInt(conf.getConfString(SmallSideFloorKey, "4096").toLong)

  /** Row estimate, or None when the plan carries no REAL statistics.
    * LogicalRDD / ExternalRDD / streaming relations report
    * sizeInBytes = spark.sql.defaultSizeInBytes (Long.MaxValue by
    * default) when nothing is known — naively dividing that by a row
    * width estimates ~3.6e16 rows and would fire the result-changing
    * rewrite on ANY small RDD-backed all-pairs query (ADVICE r13,
    * high). Unknown stats → None → the rule never fires; a
    * candidate-pruning rewrite must fail CLOSED. */
  private def estRows(p: LogicalPlan): Option[BigInt] = {
    // the plan-level sentinel compare alone is BYPASSABLE: a narrowing
    // Project multiplies sizeInBytes by outputWidth/childWidth, which
    // scales the Long.MaxValue "I know nothing" sentinel BELOW
    // defaultSizeInBytes and turns it into a colossal bogus row estimate
    // (r15 review). So additionally require every LEAF to carry real
    // statistics — one sentinel-statted leaf (LogicalRDD, ExternalRDD,
    // streaming relation) poisons anything derived from it, and the
    // rule must fail closed.
    val unknownLeaf = p.collectLeaves().exists { l =>
      val ls = l.stats
      ls.rowCount.isEmpty && ls.sizeInBytes >= conf.defaultSizeInBytes
    }
    if (unknownLeaf) None
    else {
      val s = p.stats
      s.rowCount.orElse {
        if (s.sizeInBytes <= 0 || s.sizeInBytes >= conf.defaultSizeInBytes) None
        else Some((s.sizeInBytes / EstRowBytes).max(1))
      }
    }
  }

  private def estLabel(p: LogicalPlan): String =
    estRows(p).map(_.toString).getOrElse("?")

  /** The per-pair similarity kernel: a [[FloatDot]] whose two operands
    * are bare array<float> attributes, one from each join side (cosine
    * builds on the same node — dot / (norm·norm) still contains it).
    * Mere co-occurrence of float-array columns (zip_with, struct, array
    * concat over an intentional cross join) is NOT a similarity query
    * and must not trigger the result-changing rewrite (ADVICE r13). */
  private def vecPair(e: Expression, j: Join): Option[(Attribute, Attribute)] =
    e.collect {
      case FloatDot(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) => (a, b)
      case FloatDot(a: AttributeReference, b: AttributeReference)
          if j.left.outputSet.contains(b) && j.right.outputSet.contains(a) => (b, a)
    }.headOption

  private def firstVecPair(es: Seq[Expression], j: Join): Option[(Attribute, Attribute)] =
    es.iterator.map(vecPair(_, j)).collectFirst { case Some(p) => p }

  private def spansBothSides(l: Expression, r: Expression, j: Join): Boolean =
    (l.references.nonEmpty && r.references.nonEmpty) &&
      ((l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (l.references.subsetOf(j.right.outputSet) && r.references.subsetOf(j.left.outputSet)))

  private def hasEquiKey(j: Join): Boolean =
    j.condition.exists(c => splitConjunctivePredicates(c).exists {
      case EqualTo(l, r) => spansBothSides(l, r, j)
      case EqualNullSafe(l, r) => spansBothSides(l, r, j)
      case _ => false
    })

  private def broadcastHinted(j: Join): Boolean = {
    def hinted(h: Option[HintInfo]) = h.exists(_.strategy.contains(BROADCAST))
    hinted(j.hint.leftHint) || hinted(j.hint.rightHint)
  }

  private def eligible(j: Join): Boolean =
    (j.joinType == Inner || j.joinType == Cross) &&
      !hasEquiKey(j) && !broadcastHinted(j) &&
      ((estRows(j.left), estRows(j.right)) match {
        // SMALL-SIDE FLOOR (r16, found by the cross-SF oracle gate): a
        // join with a provably small side is LINEAR in the big side —
        // a probe-bounded brute-force scan (q291's ground truth, q302's
        // 10x10 JL audit, bruteTopK) — not the n² blow-up this rule
        // exists to prevent, and substituting banded candidates there
        // CORRUPTS the exact result the caller asked for (q302 at sf0.1
        // returned the 9 band-colliding pairs instead of all 45; the
        // probe frames' Filter carries no selectivity in size-only
        // stats, so the 10-row side estimated as the whole corpus and
        // only the SF decided whether the threshold tripped). Probe
        // frames declare their bound in-plan via limit() → rowCount.
        case (Some(l), Some(r)) =>
          l.min(r) > smallSideFloor && l * r > pairsThreshold
        case _ => false // either side's stats unknown → fail closed
      })

  /** The canonical 32-bit hyperplane signature of one side's embedding
    * attribute — bit-identical to the q124/q314 index builders. */
  private def signatureExpr(emb: Attribute): Expression =
    (0 until Hyperplanes.NPlanes).map { p =>
      val plane = Literal.create(Hyperplanes.planeArray(p), ArrayType(FloatType, containsNull = false))
      If(GreaterThanOrEqual(FloatDot(emb, plane), Literal(0.0)),
        Literal(1L << p), Literal(0L))
    }.reduce[Expression](Add(_, _))

  /** Append the canonical signature + exploded band key to one side:
    * Project(keep ++ sig) → Generate(explode(bk array)).
    * bk packs (band, key) into one long (b·256 + k; k < 16 ≪ 256, so
    * bands can never collide across b) — a single equi-join key.
    * `keep` is the side's full output on the wide path, or just the
    * fresh-aliased row id on the narrow path. */
  private def sideWithBands(side: LogicalPlan, emb: Attribute,
      keep: Seq[NamedExpression]): (LogicalPlan, Attribute, Attribute) = {
    val sigAlias = Alias(signatureExpr(emb), "graft_sig")()
    val proj = Project(keep :+ sigAlias, side)
    val sig = sigAlias.toAttribute
    val bkElems: Seq[Expression] = (0 until Hyperplanes.NBands).map { b =>
      Add(Literal(b.toLong * 256L), bandKey(sig, b))
    }
    val bk = AttributeReference("graft_bk", LongType, nullable = false)()
    val gen = Generate(Explode(CreateArray(bkElems)), Nil, outer = false, None, Seq(bk), proj)
    (gen, sig, bk)
  }

  private def bandKey(sig: Expression, b: Int): Expression =
    BitwiseAnd(ShiftRight(sig, Literal(4 * b)), Literal(15L))

  /** Keep each colliding pair exactly once: only the FIRST band where
    * the two signatures agree survives — for every earlier band b' the
    * keys must differ ((b ≤ b') OR k_l(b') ≠ k_r(b')), with b = bk>>8. */
  private def firstMatchConjunct(bkL: Attribute, sigL: Attribute,
      sigR: Attribute): Expression = {
    val bandOf = ShiftRight(bkL, Literal(8))
    (0 until Hyperplanes.NBands - 1).map { bp =>
      Or(LessThanOrEqual(bandOf, Literal(bp.toLong)),
        Not(EqualTo(bandKey(sigL, bp), bandKey(sigR, bp))))
    }.reduce[Expression](And(_, _))
  }

  private def scalarType(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  /** The narrow row identity of one side, when it has one: the single
    * scalar attribute next to the embedding in an exactly-two-column
    * output — the (id, vector) projection the house similarity queries
    * feed the join. Anything wider → None → the wide rewrite. */
  private def idOf(side: LogicalPlan, emb: Attribute): Option[Attribute] =
    side.output match {
      case Seq(a, b) =>
        Seq(a, b).filterNot(_.semanticEquals(emb)) match {
          case Seq(id) if scalarType(id.dataType) &&
            Seq(a, b).exists(_.semanticEquals(emb)) => Some(id)
          case _ => None
        }
      case _ => None
    }

  private def fireLog(j: Join, shape: String): Unit =
    logWarning(s"SimilarityBandRewrite: all-pairs similarity join over an " +
      s"estimated ${estLabel(j.left)}x${estLabel(j.right)} pair space exceeds " +
      s"$PairsKey=$pairsThreshold — substituting the $shape banded sign-LSH " +
      s"candidate join (set $EnabledKey=false for exact brute force)")

  /** WIDE rewrite: payloads ride the ×NBands band exchange (no usable
    * row identity to split on). */
  private def rewriteWide(j: Join, lEmb: Attribute, rEmb: Attribute): LogicalPlan = {
    val (gl, sigL, bkL) = sideWithBands(j.left, lEmb, j.left.output)
    val (gr, sigR, bkR) = sideWithBands(j.right, rEmb, j.right.output)
    val cond = (Seq[Expression](EqualTo(bkL, bkR),
      firstMatchConjunct(bkL, sigL, sigR)) ++ j.condition)
      .reduce[Expression](And(_, _))
    fireLog(j, "wide")
    Project(j.output, Join(gl, gr, Inner, Some(cond), JoinHint.NONE))
  }

  /** NARROW rewrite (the hand-written q124/q314 plan): band-join only
    * (id, sig, bk), dedup candidate id pairs, re-attach each side's row
    * by ONE id equi-join, then apply the original theta condition. The
    * narrow branches project fresh-aliased ids so their outputs are
    * disjoint from the re-attach branches that share the same subtree.
    *
    * Shape cost vs wide (ADVICE r15): each side's subtree is embedded
    * TWICE — once under the band branch, once as the re-attach side —
    * so an unpersisted input is scanned twice; the trade is that
    * payloads cross the ×NBands exchange exactly once as (id, sig, bk)
    * instead of full rows, which wins whenever the payload is wider
    * than the signature (measured 1.6× even single-node, SCALING.md).
    * Because the two embeddings must produce THE SAME ROWS, the caller
    * guards this path on both sides being deterministic. */
  private def rewriteNarrow(j: Join, lEmb: Attribute, rEmb: Attribute,
      lId: Attribute, rId: Attribute): LogicalPlan = {
    val cidLAlias = Alias(lId, "graft_cidl")()
    val cidRAlias = Alias(rId, "graft_cidr")()
    val (gl, sigL, bkL) = sideWithBands(j.left, lEmb, Seq(cidLAlias))
    val (gr, sigR, bkR) = sideWithBands(j.right, rEmb, Seq(cidRAlias))
    val (cidL, cidR) = (cidLAlias.toAttribute, cidRAlias.toAttribute)
    val bandCond = And(EqualTo(bkL, bkR), firstMatchConjunct(bkL, sigL, sigR))
    val bandJoin = Join(gl, gr, Inner, Some(bandCond), JoinHint.NONE)
    // id-level dedup: an Aggregate, not Distinct — ReplaceDistinctWith-
    // Aggregate has already run by the time either install path fires
    val cand = Aggregate(Seq(cidL, cidR), Seq(cidL, cidR),
      Project(Seq(cidL, cidR), bandJoin))
    val reL = Join(cand, j.left, Inner, Some(EqualTo(cidL, lId)), JoinHint.NONE)
    val reR = Join(reL, j.right, Inner, Some(EqualTo(cidR, rId)), JoinHint.NONE)
    val themed = j.condition.map(Filter(_, reR)).getOrElse(reR)
    fireLog(j, "narrow")
    Project(j.output, themed)
  }

  /** Safe for the narrow rewrite's DOUBLE EMBEDDING? Requires more than
    * `QueryPlan.deterministic` (ADVICE r16): that flag only inspects
    * EXPRESSIONS, so plan nodes whose row SET depends on partition
    * layout / arrival order pass it — `Sample` keeps rows by seeded
    * per-partition position (two copies evaluated after different
    * upstream shuffles can keep different rows), and a round-robin
    * repartition (`Repartition`, or `RepartitionByExpression` with no
    * keys) assigns rows to partitions by arrival order, making any
    * seeded/positional consumer downstream order-dependent. Those sides
    * must take the wide rewrite, which embeds each subtree exactly
    * once. Key-based `RepartitionByExpression` is fine: deterministic
    * expressions give every row a deterministic partition, and nothing
    * here consumes within-partition order. */
  private def stableForDualEmbed(p: LogicalPlan): Boolean =
    p.deterministic && p.collectFirst {
      case s: Sample => s
      case r: Repartition => r
      case r: RepartitionByExpression if r.partitionExpressions.isEmpty => r
    }.isEmpty

  private def rewrite(j: Join, lEmb: Attribute, rEmb: Attribute): LogicalPlan =
    (idOf(j.left, lEmb), idOf(j.right, rEmb)) match {
      // determinism guard (ADVICE r15, hardened r17): the narrow plan
      // embeds each side's subtree twice (band branch + re-attach) and
      // joins the two copies by id — a side whose row set is not stable
      // across re-evaluation (rand-derived column, Sample, round-robin
      // repartition) can produce candidate ids in one copy that don't
      // exist in the other, silently dropping or fabricating pairs. The
      // wide rewrite embeds each side once, so it stays safe for those.
      case (Some(lId), Some(rId))
          if stableForDualEmbed(j.left) && stableForDualEmbed(j.right) =>
        rewriteNarrow(j, lEmb, rEmb, lId, rId)
      case _ => rewriteWide(j, lEmb, rEmb)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // dot computed inside the join condition (pushed-down filter shape)
      case j: Join if eligible(j) && j.condition.flatMap(vecPair(_, j)).isDefined =>
        val Some((l, r)) = j.condition.flatMap(vecPair(_, j))
        rewrite(j, l, r)
      // dot computed in the adjacent Project (the q11/q51 select shape)
      case p @ Project(list, j: Join) if eligible(j) && firstVecPair(list, j).isDefined =>
        val Some((l, r)) = firstVecPair(list, j)
        p.copy(child = rewrite(j, l, r))
      // dot computed in an adjacent Filter (threshold shape)
      case f @ Filter(cond, j: Join) if eligible(j) && vecPair(cond, j).isDefined =>
        val Some((l, r)) = vecPair(cond, j)
        f.copy(child = rewrite(j, l, r))
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro–Winkler similarity of two string
  * columns (Winkler, 1990 — THE record-linkage / fuzzy-name metric;
  * Spark ships `levenshtein` but nothing rank-normalized to [0,1], so
  * every fuzzy-match pipeline ends up with a Python/Scala UDF here).
  * Semantics match DuckDB's `jaro_winkler_similarity` exactly — the
  * empirical contract (probed, not assumed): any empty input → 0.0
  * (including BOTH empty), match window = max(len)/2 − 1, transposition
  * count = ⌊mismatched matched positions / 2⌋, Winkler prefix boost
  * (ℓ ≤ 4, p = 0.1) applied only when the Jaro score exceeds 0.7 —
  * which makes the q235 oracle a direct cross-engine agreement test of
  * two independent native implementations (the q221/DuckDB-ASOF
  * precedent, at expression granularity).
  *
  * §4.3 preference order: the O(probe×corpus) fuzzy join evaluates this
  * millions of times per task, so it's a codegen'd static call inside
  * WholeStageCodegen (one virtual dispatch per row, primitive loops, no
  * boxing) rather than a UDF (per-row encoder round-trip, codegen
  * fence). Work happens on UTF8String bytes — no String allocation —
  * which is exact for ASCII data and consistent byte-level semantics
  * for multi-byte UTF-8 on both engines' byte-oriented comparisons.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    // match on the TYPE, not object equality with the default-collation
    // singleton: under Spark 4 collation support a `string collate ...`
    // column is a StringType with a nonzero collationId, and `==
    // StringType` would reject it even though the byte-level kernel
    // works on any collation's UTF8String (r15 review).
    val ok = Seq(left, right).forall(_.dataType match {
      case _: StringType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler expects two string args, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  private val WinklerPrefixCap = 4
  private val WinklerScale = 0.1
  private val WinklerThreshold = 0.7

  /** The kernel the generated code calls once per row. Byte-oriented
    * (UTF8String backing bytes, no decode); O(n·window) time, two
    * boolean scratch arrays. */
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val s = l.getBytes
    val t = r.getBytes
    val n = s.length
    val m = t.length
    if (n == 0 || m == 0) return 0.0 // DuckDB contract: "" vs "" is 0, not 1
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var k = 0
    var mismatched = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val trans = (mismatched / 2).toDouble
    val jaro = (mm / n + mm / m + (mm - trans) / mm) / 3.0
    if (jaro <= WinklerThreshold) return jaro
    var prefix = 0
    val cap = math.min(math.min(n, m), WinklerPrefixCap)
    while (prefix < cap && s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * WinklerScale * (1.0 - jaro)
  }

  /** Arity-checked builder (the shared [[VectorExpressions.arityChecked]]). */
  val builder: Seq[Expression] => Expression =
    VectorExpressions.arityChecked(
      "graft_jaro_winkler", "graft_jaro_winkler(string, string)", 2)(
      c => JaroWinkler(c.head, c(1)))

  /** Session-scoped registration (idempotent) for code that can't assume
    * GraftExtensions is installed. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      builder)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §0.2.
  *
  * `queries` is an insertion-ordered ListMap (§7.2 bench hygiene: a cheap
  * query runs first and absorbs codegen warmup predictably). Every operator
  * module contributes `Seq[Q]`; oracle SQL lives next to each query fn.
  */
object SparkEntry {

  private val all: Seq[Q] =
    operators.Scans.entries ++
    operators.Joins.entries ++
    operators.Aggregates.entries ++
    operators.Windows.entries ++
    operators.SortSet.entries ++
    operators.Scalars.entries ++
    operators.Anonymize.entries ++
    operators.LLMPipeline.entries ++
    operators.NearDup.entries ++
    operators.TextAnalysis.entries ++
    operators.PipelineOps.entries ++
    operators.TimeSeries.entries ++
    operators.CorpusOps.entries ++
    operators.ClusterOps.entries ++
    operators.SketchOps.entries ++
    operators.GraphOps.entries ++
    operators.PrivacyOps.entries ++
    operators.TrainingOps.entries ++
    operators.StatsOps.entries ++
    operators.EvalOps.entries ++
    operators.IntervalOps.entries ++
    operators.MiningOps.entries

  /** Flagship query (q05 revenue-by-nation join-agg) on sf0.001; the
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Joins.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicate name across operator modules would be SILENTLY
    // collapsed by the map (last wins) — the earlier query vanishes
    // from Bench, Verify AND the oracle with zero signal, shrinking
    // the suite invisibly (r15 review). Loud-failure it instead.
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty,
      s"SparkEntry: duplicate query names across modules: ${dups.mkString(", ")}")
    ListMap(all.map(q => q.name -> q.fn): _*)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(all.collect { case Q(n, _, Some(sql)) => n -> sql }: _*)

  /** The shared SPARK_GRAFT_ONLY dev-iteration filter (substring match,
    * comma-separated), used identically by Bench and Verify — one
    * implementation so the two tools can't diverge. `None` (driver runs)
    * selects everything. */
  def selected(only: Option[String]): Map[String, (SparkSession, String) => DataFrame] =
    only.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(names) => queries.filter { case (n, _) => names.exists(n.contains) }
      case None => queries
    }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for representative queries
  * and grep the markers that matter at scale — PushedFilters reaching the
  * parquet scan, pruned ReadSchema, broadcast joins on dim tables,
  * WholeStageCodegen coverage. Run:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.01 [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_scan_project_filter", "q04_join_broadcast", "q05_join_shuffle",
        "q12_agg_hash", "q20_win_topk_per_group", "q25_sort_limit_topk",
        "q42_anon_suppress_k", "q50_dedup_minhash", "q62_dedup_embedding")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val markers = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> plan.contains("WholeStageCodegen"),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"))
      println("markers: " + markers.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}

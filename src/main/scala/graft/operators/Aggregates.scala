package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Aggregation operators (SURVEY.md §2.3, q12–q19).
  *
  * All summed/averaged doubles go through DECIMAL(18,4) (§2.9 R1) and every
  * output aggregate is pinned to an explicit final type so Spark and DuckDB
  * emit identical physical parquet types. Two-phase (partial + final)
  * HashAggregate comes free from Catalyst — at 100 TB the map-side partial
  * aggregation bounds shuffle volume by group cardinality, not input rows.
  */
object Aggregates {
  import Tables.dec

  /** q12: TPC-H Q1 analog — multi-measure hash aggregate. */
  private def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables(spark, sfDir, "lineitem")
    li.filter(col("l_shipdate") <= lit(Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast(DecimalType(18, 4)).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast(DecimalType(18, 4)).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DecimalType(18, 4)).as("sum_disc_price"),
        avg(dec(col("l_quantity"))).cast(DecimalType(18, 4)).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val entries: Seq[Q] = Seq(
    Q("q12_agg_hash", q12 _, Some(
      "SELECT l_returnflag, l_linestatus, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_qty, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(18,4)) AS sum_disc_price, " +
        "CAST(AVG(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS avg_qty, " +
        "COUNT(*) AS cnt " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),
  )
}

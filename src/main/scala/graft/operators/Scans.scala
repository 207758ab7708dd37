package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Scan / source / sink operators (SURVEY.md §2.1, q01–q03).
  *
  * q01 exists to prove the scan path is *efficient*, not just correct: the
  * filter and the 4-column projection must reach the parquet reader
  * (PushedFilters / ReadSchema in `.explain`), so at 100 TB the scan reads
  * only the touched row groups and columns. q02/q03 prove the CSV and JSON
  * source/sink surface round-trips losslessly (the oracle reads the
  * ORIGINAL parquet, so any loss of type or value fails the hash).
  */
object Scans {

  /** q01: parquet scan + projection + predicate, pushdown-friendly. */
  private def q01(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(Timestamp.valueOf("1997-01-01 00:00:00")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Distinct tmp dir per (table, sfDir) so concurrent runs at different
    * scale factors never collide. */
  private def tmp(kind: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${kind}_${math.abs(sfDir.hashCode)}"

  /** q02: CSV sink + source round-trip of `region` (explicit schema on
    * read-back — CSV is typeless, inference would widen int32→int). */
  private def q02(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables(spark, sfDir, "region")
    val path = tmp("csv_region", sfDir)
    region.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    spark.read.schema(region.schema).option("header", "true").csv(path)
      .orderBy("r_regionkey")
  }

  /** q03: JSON-lines sink + source round-trip of `nation` (explicit schema
    * — JSON inference would read int32 as bigint and break type parity). */
  private def q03(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables(spark, sfDir, "nation")
    val path = tmp("json_nation", sfDir)
    nation.coalesce(1).write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(nation.schema).json(path)
      .orderBy("n_nationkey")
  }

  /** q69: ORC sink + source round-trip of `supplier` (the third columnar
    * format Spark ships besides parquet; oracle reads the original
    * parquet — the round-trip must be lossless). */
  private def q69(spark: SparkSession, sfDir: String): DataFrame = {
    val supplier = Tables(spark, sfDir, "supplier")
    val path = tmp("orc_supplier", sfDir)
    supplier.coalesce(1).write.mode(SaveMode.Overwrite).orc(path)
    spark.read.schema(supplier.schema).orc(path)
      .orderBy("s_suppkey")
  }

  /** q70: partitioned parquet layout + partition pruning — write orders
    * hive-partitioned by year, read back with a partition filter. The
    * year filter prunes at the DIRECTORY level (PartitionFilters, no
    * row-group IO for other years) — the layout strategy that carries a
    * 100 TB fact table. */
  private def q70(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables(spark, sfDir, "orders")
    val path = tmp("part_orders", sfDir)
    orders
      .withColumn("o_year", year(col("o_orderdate")))
      // project to the columns the downstream read needs — the layout
      // (partitionBy + directory pruning) is what this operator proves;
      // writing unread columns only inflates the sink IO
      .select("o_year", "o_orderstatus")
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(path)
    spark.read.parquet(path)
      .filter(col("o_year").isin(1996, 1997))
      .groupBy("o_year", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("o_year", col("o_year").cast("bigint"))
      .orderBy("o_year", "o_orderstatus")
  }

  val entries: Seq[Q] = Seq(
    Q("q01_scan_project_filter", q01 _, Some(
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "ORDER BY l_orderkey, l_linenumber")),
    Q("q02_scan_csv_roundtrip", q02 _, Some(
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),
    Q("q03_scan_json_lines", q03 _, Some(
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),
    Q("q69_scan_orc_roundtrip", q69 _, Some(
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey")),
    Q("q70_scan_partitioned_prune", q70 _, Some(
      "SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, o_orderstatus, COUNT(*) AS cnt " +
        "FROM orders WHERE YEAR(o_orderdate) IN (1996, 1997) " +
        "GROUP BY 1, 2 ORDER BY o_year, o_orderstatus")),
  )
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Central table loader (SURVEY.md §7.1 M0).
  *
  * All queries read input exclusively through this object so that:
  *  - `spark.sql.legacy.parquet.nanosAsLong` is always set before touching
  *    `events.parquet` (its TIMESTAMP(NANOS) column kills the default
  *    Spark 4 reader — SURVEY.md §1.2); the driver's Verify session does
  *    not set it for us, and the conf is runtime-settable.
  *  - every table name maps to exactly one path convention
  *    (`<sfDir>/<name>.parquet`), matching TESTDATA.md.
  *
  * Scale notes (100 TB): the loader deliberately returns plain
  * `spark.read.parquet` DataFrames — no caching, no repartitioning — so
  * Catalyst keeps full freedom for predicate pushdown, column pruning and
  * partition-aware planning. At cluster scale the same code reads a
  * directory of many files; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from `sfDir`. Sets the nanos conf on every call —
    * cheap, idempotent, and guarantees any session we are handed can read
    * `events`. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Cast to the mandated DECIMAL(18,4) intermediate for any double that
    * flows into a summed/averaged output (SURVEY.md §2.9 R1 — double
    * addition is not associative across partition merge order). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Portable 6-dp rounding for DOUBLE outputs: floor(x·1e6 + 0.5)/1e6 in
    * pure IEEE double ops, which both Spark and DuckDB evaluate
    * bit-identically. Spark's `round` (HALF_UP on the shortest decimal
    * string) and DuckDB's `round` (scaled-double) disagree whenever the
    * value sits near a .5 boundary at the target scale — verified on
    * 68210.43/32 (q32) and a scale-4 group mean (q45). Pair every use
    * with `r6sql` on the oracle side. */
  def r6(c: Column): Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** The SQL half of [[r6]] — same IEEE ops, same bits. Runs on BOTH
    * engines (oracle SQL, and the spark.sql-expressed queries q15/q17):
    * the outer CAST is a no-op in DuckDB (already DOUBLE) but essential in
    * Spark SQL, where FLOOR returns BIGINT and `1000000.0` parses as
    * DECIMAL(8,1), so the bare division would yield DECIMAL(30,9) — a
    * decimal output the driver's hash can't match (see r6). */
  def r6sql(e: String): String =
    s"CAST(FLOOR(($e) * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)"

  /** Portable mean at 6 dp: exact DECIMAL sum → double ÷ count → [[r6]].
    * Avoids both engines' avg/cast paths (DuckDB AVG(DECIMAL) returns
    * DOUBLE; DuckDB decimal downcasts truncate while Spark's round
    * half-up). */
  def meanD(sum: Column, cnt: Column): Column = r6(sum.cast("double") / cnt)
  def meanDSql(sum: String, cnt: String): String =
    r6sql(s"CAST($sum AS DOUBLE) / $cnt")

  /** Register `name` as a temp view over `sfDir` and return it — for the
    * operators exercised through `spark.sql` (GROUPING SETS etc.). */
  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = apply(spark, sfDir, name)
    df.createOrReplaceTempView(name)
    df
  }
}

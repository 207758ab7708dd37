package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a named query function plus (usually) a
  * DuckDB-1.0.0 oracle SQL string over the bare table names. `oracle =
  * None` marks the legitimately non-SQL-expressible ops (§2's ➖ rows);
  * the driver then records a weaker rows-only check. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

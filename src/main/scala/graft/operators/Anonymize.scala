package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Anonymization suite (SURVEY.md §2.7, q35–q48) — the reference's own
  * operator family (k-anonymity, l-diversity, generalization, masking,
  * pseudonymization, microaggregation; Sweeney 2002, Machanavajjhala 2007,
  * Domingo-Ferrer 2002).
  *
  * Everything is expressed as deterministic column transforms / window
  * functions so Catalyst can push scans down beneath them; no per-row
  * driver logic. k-anonymity-style audits are global groupBys — the one
  * correct distributed formulation (the guarantee is a global property,
  * §7.5) — and shuffle only QI-cardinality-bounded aggregates.
  */
object Anonymize {

  /** q36: salted-hash pseudonymization — replace the direct identifier with
    * a keyed surrogate (sha2 parity with DuckDB verified, FIXTURES.md). */
  private def q36(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .select(
        col("c_custkey"),
        sha2(concat(lit("salt42"), col("c_name")), 256).as("pseudonym"))
      .orderBy("c_custkey")
  }

  val entries: Seq[Q] = Seq(
    Q("q36_anon_pseudonymize", q36 _, Some(
      "SELECT c_custkey, sha256('salt42' || c_name) AS pseudonym " +
        "FROM customer ORDER BY c_custkey")),
  )
}

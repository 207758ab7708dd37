package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function operators (SURVEY.md §2.6, q29–q34).
  *
  * All pure per-row column expressions — fully codegen'd inside
  * WholeStageCodegen, no shuffle except the final presentation sort.
  * Cross-engine notes baked in:
  *  - Spark `dayofweek` is 1-based (Sun=1), DuckDB 0-based → emit
  *    `dayofweek−1`;
  *  - `datediff(end,start)` (Spark) = `date_diff('day',start,end)` (DuckDB);
  *  - regex kept to the shared Java/RE2 subset (char classes, anchors);
  *  - ANSI mode: division guarded by NULLIF on both engines (§7.3).
  */
object Scalars {

  /** q29: string suite over customer names. */
  private def q29(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(lit(" pad ")).as("trimmed"),
        substring(col("c_name"), 1, 8).as("sub8"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        levenshtein(col("c_name"), reverse(col("c_name"))).cast("bigint").as("lev_rev"),
        length(col("c_name")).cast("bigint").as("name_len"))
      .orderBy("c_custkey")
  }

  /** q30: regex masking + extraction (shared Java/RE2 subset). */
  private def q30(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "*").as("masked"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_str"))
      .orderBy("c_custkey")
  }

  /** q31: date part extraction + arithmetic on o_orderdate. */
  private def q31(spark: SparkSession, sfDir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        year(d).cast("bigint").as("y"), month(d).cast("bigint").as("m"),
        (dayofweek(d) - 1).cast("bigint").as("dow"),
        date_add(d, 30).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), d).cast("bigint").as("age_days"),
        trunc(d, "MM").as("order_month"))
      .orderBy("o_orderkey")
  }

  /** q32: math suite with ANSI-safe guarded division. */
  private def q32(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25.0).as("absd"),
        floor(col("l_extendedprice")).as("flr"),
        ceil(col("l_discount") * 100).as("disc_pct"),
        graft.Tables.r6(sqrt(col("l_extendedprice"))).as("sq"),
        graft.Tables.r6(log(col("l_extendedprice"))).as("lg"),
        graft.Tables.r6(pow(col("l_quantity"), lit(2))).as("qty2"),
        pmod(col("l_orderkey"), lit(7)).as("pm7"),
        graft.Tables.r6(col("l_extendedprice") / nullif(col("l_quantity"), lit(0.0))).as("unit_price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q33: JSON extraction from the events props column, aggregated by
    * k-bucket. */
  private def q33(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("k_bucket", col("k") - pmod(col("k"), lit(10)))
      .groupBy("k_bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("k_bucket")
  }

  /** q34: array ops over document tokens — scalar outputs only (§2.9 R2). */
  private def q34(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        array_contains(split(col("text"), " "), "data").as("has_data"),
        element_at(split(col("text"), " "), 1).as("first_token"))
      .orderBy("doc_id")
  }

  /** q74: schema-ful JSON parsing — from_json into a typed struct (vs
    * q33's path extraction), then struct field access. */
  private def q74(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "events")
      .select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).as("parsed"))
      .select(col("event_id"), col("parsed.k").as("k"))
      .orderBy("event_id")
  }

  /** q75: correlated scalar subquery — orders priced above their
    * customer's mean order price; Catalyst decorrelates to an aggregate +
    * join (RewriteCorrelatedScalarSubquery), the scalable plan. */
  private def q75(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.view(spark, sfDir, "orders")
    spark.sql(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i " +
        "WHERE i.o_custkey = o.o_custkey) ORDER BY o_orderkey")
  }

  /** q130: VariantType ingestion (Spark 4's semi-structured binary
    * encoding) — `parse_json` the props column into a variant, extract
    * the typed field with `variant_get`, and assert per row that the
    * variant path agrees with the classic JSON-string path
    * (`get_json_object`). At scale the variant column is what lands in
    * the lake (Parquet shredding makes `variant_get` a column read, not
    * a JSON re-parse per row); this query is the ingestion-parity gate a
    * migration from string-JSON to variant runs. All narrow, codegen
    * scalar work — the one shuffle is the final sort. */
  private def q130(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        (expr("variant_get(parse_json(props), '$.k', 'bigint')") ===
          get_json_object(col("props"), "$.k").cast("bigint")).as("paths_agree"))
      .orderBy("event_id")
  }

  /** q131: NULL-semantics suite — the corner of the SQL surface every
    * engine must get identically right: NULLIF-style injection (negative
    * balances → NULL), COALESCE defaults, COUNT(col) skipping NULLs vs
    * COUNT(*), and null-safe equality (`<=>` / IS NOT DISTINCT FROM)
    * counting the NULLs themselves. Test data has no native NULLs, so
    * the query manufactures them deterministically — which also makes
    * every downstream null-path verifiable. Bounded one-shuffle agg. */
  private def q131(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "customer")
      .select(col("c_mktsegment"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal_n"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_total"),
        count(col("bal_n")).as("n_nonnull"),
        (count(lit(1)) - count(col("bal_n"))).as("n_null"),
        expr("count_if(bal_n <=> null)").as("n_nullsafe_null"),
        Tables.r6(sum(Tables.dec(coalesce(col("bal_n"), lit(0.0)))).cast("double")).as("sum_defaulted"))
      .orderBy("c_mktsegment")
  }

  /** q235: Jaro–Winkler fuzzy matching via the NATIVE
    * [[graft.functions.JaroWinkler]] codegen Expression — top-3 most
    * similar part names per probe part (10 probes, jw ≥ 0.8). The
    * rank-normalized [0,1] companion to q90's levenshtein: edit
    * distance penalizes long strings, JW is THE record-linkage metric
    * (name/address matching) and Spark has no builtin — the gap that
    * normally forces a UDF into the hot loop. The oracle is DuckDB's
    * OWN `jaro_winkler_similarity` — two independent native
    * implementations agreeing on every probe×corpus pair (the q221
    * ASOF precedent at expression granularity; the 0.7-boost-threshold
    * and empty-string contracts were probed empirically, not assumed).
    *
    * Scale: probe side bounded (10 rows, broadcast nested-loop — the
    * q90 shape); the expression runs inside WholeStageCodegen over the
    * corpus scan. Unbounded fuzzy SELF-join would need a blocking key
    * first (q83's banded simhash or a phonetic key) — same rule as
    * q11 vs q63. Ordering sorts the r6-rounded score (R5/R6: both
    * engines rank the same 6dp value; ids break ties). */
  private def q235(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.JaroWinkler.register(spark)
    val parts = Tables(spark, sfDir, "part").select("p_partkey", "p_name")
    val probe = parts.filter(col("p_partkey") <= 10)
      .select(col("p_partkey").as("id_p"), col("p_name").as("name_p"))
    val scored = broadcast(probe).crossJoin(
        parts.select(col("p_partkey").as("id_c"), col("p_name").as("name_c")))
      .filter(col("id_p") =!= col("id_c"))
      .withColumn("jw", Tables.r6(expr("graft_jaro_winkler(name_p, name_c)")))
      .filter(col("jw") >= 0.8)
    val byJw = org.apache.spark.sql.expressions.Window
      .partitionBy("id_p").orderBy(col("jw").desc, col("id_c"))
    scored.withColumn("rn", row_number().over(byJw).cast("bigint"))
      .filter(col("rn") <= 3)
      .select("id_p", "id_c", "jw", "rn")
      .orderBy("id_p", "rn")
  }

  val entries: Seq[Q] = Seq(
    Q("q235_scalar_jaro_winkler", q235 _, Some(
      "SELECT id_p, id_c, jw, rn FROM (" +
        "SELECT id_p, id_c, jw, CAST(ROW_NUMBER() OVER (PARTITION BY id_p " +
        "ORDER BY jw DESC, id_c) AS BIGINT) AS rn FROM (" +
        "SELECT a.p_partkey AS id_p, b.p_partkey AS id_c, " +
        Tables.r6sql("jaro_winkler_similarity(a.p_name, b.p_name)") + " AS jw " +
        "FROM part a JOIN part b ON a.p_partkey <= 10 AND a.p_partkey <> b.p_partkey) " +
        "WHERE jw >= 0.8) WHERE rn <= 3 ORDER BY id_p, rn")),
    Q("q29_scalar_string", q29 _, Some(
      "SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo, " +
        "TRIM(' pad ') AS trimmed, SUBSTRING(c_name, 1, 8) AS sub8, " +
        "CONCAT_WS('|', c_mktsegment, c_name) AS joined, " +
        "LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded, " +
        "LEVENSHTEIN(c_name, REVERSE(c_name)) AS lev_rev, " +
        "LENGTH(c_name) AS name_len FROM customer ORDER BY c_custkey")),
    Q("q30_scalar_regexp", q30 _, Some(
      "SELECT c_custkey, REGEXP_REPLACE(c_name, '[0-9]', '*', 'g') AS masked, " +
        "COALESCE(REGEXP_EXTRACT(c_name, '([0-9]+)', 1), '') AS id_str " +
        "FROM customer ORDER BY c_custkey")),
    Q("q31_scalar_date", q31 _, Some(
      "SELECT o_orderkey, YEAR(CAST(o_orderdate AS DATE)) AS y, " +
        "MONTH(CAST(o_orderdate AS DATE)) AS m, " +
        "DAYOFWEEK(CAST(o_orderdate AS DATE)) AS dow, " +
        "CAST(o_orderdate AS DATE) + 30 AS due_date, " +
        "DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days, " +
        "CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month " +
        "FROM orders ORDER BY o_orderkey")),
    Q("q32_scalar_math", q32 _, Some(
      "SELECT l_orderkey, l_linenumber, ABS(l_quantity - 25.0) AS absd, " +
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS flr, CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct, " +
        graft.Tables.r6sql("SQRT(l_extendedprice)") + " AS sq, " + graft.Tables.r6sql("LN(l_extendedprice)") + " AS lg, " +
        graft.Tables.r6sql("POW(l_quantity, 2)") + " AS qty2, " +
        "CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS pm7, " +
        graft.Tables.r6sql("l_extendedprice / NULLIF(l_quantity, 0.0)") + " AS unit_price " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber")),
    Q("q33_scalar_json", q33 _, Some(
      "SELECT k_bucket, COUNT(*) AS cnt FROM (" +
        "SELECT k - (((k % 10) + 10) % 10) AS k_bucket FROM (" +
        "SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)) " +
        "GROUP BY k_bucket ORDER BY k_bucket")),
    Q("q34_scalar_array_map", q34 _, Some(
      "SELECT doc_id, LEN(STR_SPLIT(text, ' ')) AS n_tokens, " +
        "LIST_CONTAINS(STR_SPLIT(text, ' '), 'data') AS has_data, " +
        "STR_SPLIT(text, ' ')[1] AS first_token FROM documents ORDER BY doc_id")),
    Q("q74_scalar_from_json", q74 _, Some(
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k " +
        "FROM events ORDER BY event_id")),
    Q("q75_scalar_corr_subquery", q75 _, Some(
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders o " +
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders i " +
        "WHERE i.o_custkey = o.o_custkey) ORDER BY o_orderkey")),
    Q("q130_scalar_variant", q130 _, Some(
      "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k, " +
        "CAST(json_extract(props, '$.k') AS BIGINT) = " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS paths_agree " +
        "FROM events ORDER BY event_id")),
    Q("q131_scalar_nulls", q131 _, Some(
      "SELECT c_mktsegment, COUNT(*) AS n_total, COUNT(bal_n) AS n_nonnull, " +
        "COUNT(*) - COUNT(bal_n) AS n_null, " +
        "COUNT(*) FILTER (WHERE bal_n IS NOT DISTINCT FROM NULL) AS n_nullsafe_null, " +
        Tables.r6sql("CAST(SUM(CAST(COALESCE(bal_n, 0.0) AS DECIMAL(18,4))) AS DOUBLE)") +
        " AS sum_defaulted FROM (" +
        "SELECT c_mktsegment, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_n " +
        "FROM customer) GROUP BY c_mktsegment ORDER BY c_mktsegment")),
    Q("q226_recursive_cte", q226 _, Some(
      "WITH RECURSIVE anc AS (" +
        "SELECT CAST(n_nationkey AS BIGINT) AS node, " +
        "CAST(n_nationkey // 2 AS BIGINT) AS ancestor, " +
        "CAST(1 AS BIGINT) AS depth FROM nation WHERE n_nationkey > 0 " +
        "UNION ALL SELECT node, ancestor // 2, depth + 1 " +
        "FROM anc WHERE ancestor > 0) " +
        "SELECT node, ancestor, depth FROM anc ORDER BY node, depth")),
    Q("q224_scalar_try_safe", q224 _, Some(
      // the oracle states each try_* contract explicitly as CASE /
      // TRY_CAST — the absorbed-error semantics Spark's ANSI mode makes
      // mandatory for production pipelines
      "SELECT n_nationkey AS nationkey, n_nationkey - 20 AS d, " +
        "CASE WHEN n_nationkey - 20 <> 0 THEN " +
        "CAST(100 AS DOUBLE) / (n_nationkey - 20) END AS safe_div, " +
        "TRY_CAST(CASE WHEN n_nationkey % 3 = 0 THEN 'x' " +
        "ELSE CAST(n_nationkey AS VARCHAR) END AS INTEGER) AS safe_cast, " +
        "CASE WHEN n_nationkey = 0 THEN 9223372036854775807 END AS safe_add, " +
        "CASE WHEN 1 + n_nationkey % 5 BETWEEN 1 AND 3 THEN " +
        "([10, 20, 30])[1 + n_nationkey % 5] END AS safe_elem " +
        "FROM nation ORDER BY nationkey")),
  )

  /** q226: recursive CTE — Spark 4.1's `WITH RECURSIVE` (UNION ALL
    * recursion; the engine-limitation note in SURVEY §2.8b records that
    * UNION-distinct recursion is unsupported, which is why the cyclic
    * connected-components operators q76/q93 use the iterative frontier
    * loop instead). Here the ACYCLIC case recursive SQL is actually good
    * at: walking the ancestor chain of a binary-tree hierarchy (parent
    * of n = n div 2) to produce every (node, ancestor, depth) — the
    * org-chart / category-tree / bill-of-materials query, expressed in
    * ONE SQL statement on both engines.
    *
    * Scale: recursion depth = tree height (log n); each step is one
    * self-union of the frontier — the same shape as the q187 BFS but
    * driven by the engine's own recursion operator. */
  private def q226(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.view(spark, sfDir, "nation")
    spark.sql(
      "WITH RECURSIVE anc AS (" +
        "SELECT CAST(n_nationkey AS BIGINT) AS node, " +
        "CAST(n_nationkey DIV 2 AS BIGINT) AS ancestor, " +
        "CAST(1 AS BIGINT) AS depth FROM nation WHERE n_nationkey > 0 " +
        "UNION ALL SELECT node, ancestor DIV 2, depth + 1 " +
        "FROM anc WHERE ancestor > 0) " +
        "SELECT node, ancestor, depth FROM anc ORDER BY node, depth")
  }

  /** q224: ANSI-safe scalar handling — the `try_*` family. Spark 4 runs
    * ANSI mode ON (÷0, bad casts, overflow, and out-of-bounds access
    * THROW at runtime, killing the job for one bad row); production
    * pipelines therefore route risky arithmetic through
    * `try_divide/try_cast/try_add/try_element_at`, which absorb exactly
    * those errors into NULL. Each column here forces one failure class
    * across the nation domain: ÷0 at key 20, an unparseable string at
    * every key%3=0, int64 overflow everywhere but key 0, and
    * out-of-bounds element access at key%5 ∉ [1,3].
    *
    * Scale: pure per-row codegen expressions, no shuffle (the orderBy
    * exists only for the deterministic compare). */
  private def q224(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "nation")
      .select(col("n_nationkey").as("nationkey"),
        (col("n_nationkey") - 20).as("d"),
        expr("try_divide(100, n_nationkey - 20)").as("safe_div"),
        expr("try_cast(CASE WHEN n_nationkey % 3 = 0 THEN 'x' " +
          "ELSE CAST(n_nationkey AS STRING) END AS INT)").as("safe_cast"),
        expr("try_add(9223372036854775807L, CAST(n_nationkey AS BIGINT))")
          .as("safe_add"),
        // index domain 1..5 (4, 5 out of bounds → NULL): try_element_at
        // absorbs OUT-OF-BOUNDS, but index 0 is an invalid-ARGUMENT
        // error, which the try family deliberately does not absorb
        expr("try_element_at(array(10, 20, 30), CAST(1 + n_nationkey % 5 AS INT))")
          .as("safe_elem"))
      .orderBy("nationkey")
  }
}

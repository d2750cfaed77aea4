package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.contracts.{ColumnSpec, EdgeContract, Validation}
import graft.operators.Hierarchy
import graft.sources.{Loader, Sinks, Tables}

/** Loader / contract / validation / hierarchy-kernel battery — the
  * components that were previously spec-verified only, surfaced as
  * oracle-checked driver queries (SURVEY §2.1-§2.2 rows "Schema
  * enforcement on load", "Column alias translation", "CSV scan",
  * "Value-constraint validation"; §2.9 "Eager driver-side kernels").
  */
object SourceOps {

  /** q46: contract-enforcing parquet load — legacy alias translation,
    * declared-dtype casts with invalid→null (`try_cast`), absent optional
    * columns materialised as typed nulls, Boolean-only defaults, and
    * undeclared-column drop, all in one `select` (reference
    * `engine/loader.py:108-221`, `contracts/edges.py:148-257`,
    * `data/column_spec.py:79-115`). */
  val q46ContractConform = QueryDef(
    "q46_contract_conform",
    (s, dir) => {
      val contract = EdgeContract("part_edge", Seq(
        "part_key" -> ColumnSpec(LongType, required = true),
        "part_name" -> ColumnSpec(StringType, required = true),
        // p_type is free text: try_cast to int nulls every row (the
        // invalid→null discipline, never an exception)
        "type_code" -> ColumnSpec(IntegerType),
        "part_size" -> ColumnSpec(IntegerType),
        "retail_price" -> ColumnSpec(DoubleType),
        // absent in the source: Boolean default applies …
        "is_active" -> ColumnSpec(BooleanType, default = Some(true)),
        // … but non-Boolean defaults deliberately do NOT (a silent 0.0
        // EAD understates RWA): typed nulls propagate
        "review_flag" -> ColumnSpec(BooleanType),
        "missing_notes" -> ColumnSpec(StringType)))
      val aliases = Map(
        "p_partkey" -> "part_key", "p_name" -> "part_name",
        "p_type" -> "type_code", "p_size" -> "part_size",
        "p_retailprice" -> "retail_price")
      Loader.loadParquet(s, s"$dir/part.parquet", contract, aliases)
        .df.orderBy(col("part_key")).limit(20)
    },
    Some("""
      SELECT p_partkey AS part_key, p_name AS part_name,
             TRY_CAST(p_type AS INTEGER) AS type_code,
             CAST(p_size AS INTEGER) AS part_size,
             CAST(p_retailprice AS DOUBLE) AS retail_price,
             TRUE AS is_active,
             CAST(NULL AS BOOLEAN) AS review_flag,
             CAST(NULL AS VARCHAR) AS missing_notes
      FROM part ORDER BY part_key LIMIT 20
    """.stripMargin.trim))

  /** q47: value-constraint (enum) validation — every column's
    * out-of-set count in ONE aggregation pass, long-format and lazy
    * (reference `contracts/validation.py` VALID_* membership checks). */
  val q47EnumValidation = QueryDef(
    "q47_enum_validation",
    (s, dir) =>
      Validation.enumViolationsDf(Tables.orders(s, dir), Seq(
        "o_orderstatus" -> Seq("O", "F"),
        "o_orderpriority" -> Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")))
        .orderBy(col("column_name")),
    Some("""
      SELECT * FROM (
        SELECT 'o_orderstatus' AS column_name,
               count(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O','F') THEN 1 END) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority',
               count(CASE WHEN o_orderpriority IS NOT NULL
                          AND o_orderpriority NOT IN ('1-URGENT','2-HIGH','3-MEDIUM','5-LOW') THEN 1 END)
        FROM orders)
      ORDER BY column_name
    """.stripMargin.trim))

  /** q48: CSV round-trip — export a table to headered CSV, re-load it
    * through the all-string CSV front-end, and let the edge contract's
    * try_cast recover the typed schema (reference CSVLoader +
    * enforce_schema share one conform path with parquet,
    * `engine/loader.py:878-941`). */
  val q48CsvRoundtrip = QueryDef(
    "q48_csv_roundtrip",
    (s, dir) => {
      // unique per JVM so a concurrent bench + correctness driver on the
      // same host never race on write-overwrite-then-read
      val tmp = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q48_nation_csv_${java.lang.ProcessHandle.current.pid}"
      Sinks.writeCsv(Tables.nation(s, dir), tmp)
      val contract = EdgeContract("nation_csv", Seq(
        "n_nationkey" -> ColumnSpec(LongType, required = true),
        "n_name" -> ColumnSpec(StringType, required = true),
        "n_regionkey" -> ColumnSpec(LongType, required = true),
        // not in the source table: conform adds it as a typed null
        "n_comment" -> ColumnSpec(StringType)))
      Loader.loadCsv(s, tmp, contract).df.orderBy(col("n_nationkey"))
    },
    Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CAST(n_regionkey AS BIGINT) AS n_regionkey,
             CAST(NULL AS VARCHAR) AS n_comment
      FROM nation ORDER BY n_nationkey
    """.stripMargin.trim))

  /** q49: driver-side hierarchy kernel — customer→nation→region edges
    * collected and resolved by traversal (org charts are bounded by
    * legal-entity counts even at 100 TB of exposures; reference
    * `stages/hierarchy/graph.py:120-163`), emitting per-node ultimate
    * parent / depth / path plus a per-root rollup. Oracle: DuckDB
    * recursive CTE walking the same edges. */
  val q49HierarchyResolve = QueryDef(
    "q49_hierarchy_resolve",
    (s, dir) => {
      val cust = Tables.customer(s, dir).select(
        concat(lit("C"), col("c_custkey")).as("child"),
        concat(lit("N"), col("c_nationkey")).as("parent"))
      val nat = Tables.nation(s, dir).select(
        concat(lit("N"), col("n_nationkey")).as("child"),
        concat(lit("R"), col("n_regionkey")).as("parent"))
      val resolved = Hierarchy.resolveUltimateParents(
        cust.unionByName(nat), "child", "parent")
      val nodes = resolved.filter(!col("child").startsWith("C")).select(
        lit("node").as("section"), col("child").as("node"),
        col("ultimate_parent"), col("depth").cast("long").as("depth"),
        concat_ws(",", col("hierarchy_path")).as("path"),
        lit(null).cast("long").as("n_nodes"))
      val rollup = resolved.groupBy(col("ultimate_parent")).agg(
          count(lit(1)).as("n_nodes"), max(col("depth")).cast("long").as("depth"))
        .select(lit("rollup").as("section"),
          lit(null).cast("string").as("node"), col("ultimate_parent"),
          col("depth"), lit(null).cast("string").as("path"), col("n_nodes"))
      nodes.unionByName(rollup)
        .orderBy(col("section"), col("ultimate_parent"),
          coalesce(col("node"), lit("")))
    },
    Some("""
      WITH RECURSIVE edges AS (
        SELECT 'C' || c_custkey AS child, 'N' || c_nationkey AS parent FROM customer
        UNION ALL
        SELECT 'N' || n_nationkey, 'R' || n_regionkey FROM nation),
      nodes AS (
        SELECT DISTINCT child AS node FROM edges
        UNION SELECT DISTINCT parent FROM edges),
      walk(node, cur, depth, path) AS (
        SELECT node, node, 0, node FROM nodes
        UNION ALL
        SELECT w.node, e.parent, w.depth + 1, w.path || ',' || e.parent
        FROM walk w JOIN edges e ON w.cur = e.child),
      resolved AS (
        SELECT node, cur AS ultimate_parent, depth, path,
               row_number() OVER (PARTITION BY node ORDER BY depth DESC) AS rn
        FROM walk),
      final AS (SELECT * FROM resolved WHERE rn = 1)
      SELECT * FROM (
        SELECT 'node' AS section, node, ultimate_parent,
               CAST(depth AS BIGINT) AS depth, path,
               CAST(NULL AS BIGINT) AS n_nodes
        FROM final WHERE node NOT LIKE 'C%'
        UNION ALL
        SELECT 'rollup', CAST(NULL AS VARCHAR), ultimate_parent,
               CAST(max(depth) AS BIGINT), CAST(NULL AS VARCHAR),
               count(*)
        FROM final GROUP BY ultimate_parent)
      ORDER BY section, ultimate_parent, coalesce(node, '')
    """.stripMargin.trim))

  /** q180: NDJSON round-trip over the document corpus — export the
    * documents table to one-record-per-line JSON (the web-corpus
    * interchange format) under a LEGACY column name, re-load it through
    * the inference-free all-string NDJSON front-end, and let alias
    * translation + the edge contract's try_cast recover the canonical
    * typed schema (one conform path with parquet/CSV; a declared-but-
    * absent optional column lands as a typed null). The oracle reads the
    * PARQUET ground truth, so any transport loss in the JSON round-trip
    * (escaping, unicode, integer stringification) fails the hash. */
  val q180NdjsonRoundtrip = QueryDef(
    "q180_ndjson_roundtrip",
    (s, dir) => {
      // fixed path PER INPUT DIR (not per pid): writeNdjson's overwrite
      // mode then reclaims the previous run's corpus-sized export
      // instead of accumulating one copy per driver process in tmpdir
      val tmp = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q180_documents_ndjson_${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"
      Sinks.writeNdjson(
        Tables.documents(s, dir).withColumnRenamed("text", "body"), tmp)
      val contract = EdgeContract("documents_ndjson", Seq(
        "doc_id" -> ColumnSpec(LongType, required = true),
        "text" -> ColumnSpec(StringType, required = true),
        "lang" -> ColumnSpec(StringType),
        "source" -> ColumnSpec(StringType),
        "n_chars" -> ColumnSpec(LongType),
        // not in the corpus: conform adds it as a typed null
        "quality_score" -> ColumnSpec(DoubleType)))
      Loader.loadNdjson(s, tmp, contract, aliases = Map("body" -> "text"))
        .df.orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id, text, lang, source, n_chars,
             CAST(NULL AS DOUBLE) AS quality_score
      FROM documents ORDER BY doc_id
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q46ContractConform, q47EnumValidation, q48CsvRoundtrip,
    q49HierarchyResolve, q180NdjsonRoundtrip)
}

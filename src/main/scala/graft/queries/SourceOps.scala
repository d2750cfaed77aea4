package graft.queries

import org.apache.spark.sql.DataFrame
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
      // instead of accumulating one copy per driver process in tmpdir.
      // Single-writer assumption: the harness runs one driver process
      // per sfDir at a time (Verify and Bench are sequential); two
      // CONCURRENT processes on the same sfDir would race on this dir
      // (q181/q182 share the convention) — per-pid suffixes are the
      // escape hatch if that ever changes
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

  /** q181: ADVERSARIAL NDJSON transport — the degenerate shard shapes a
    * real web-corpus drop contains, driven through `loadNdjson` and
    * q180's contract: a malformed (truncated) line, raw non-ASCII
    * multibyte text, a `\\uXXXX` escape that must decode to the same
    * codepoints, a record carrying BOTH the legacy alias and the
    * canonical name (canonical wins the per-record coalesce), an
    * invalid-typed id (try_cast → null, row kept), a record missing the
    * id key entirely, and a number token landing in a string field. The
    * shard content is a fixed literal, so the oracle is the expected
    * parse as literal VALUES — any PERMISSIVE null-fill, alias, unicode
    * or try_cast divergence changes a cell and fails the hash. This is
    * the transport-robustness row the r16 verdict asked for (JSON
    * interchange is exactly where corpora silently lose data).
    */
  val q181NdjsonAdversarial = QueryDef(
    "q181_ndjson_adversarial",
    (s, dir) => {
      // per-sfDir path like q180/q182 (concurrent drivers at different
      // SFs must not share a transport dir), and the dir is cleared
      // before the rewrite so stale shards from an older fixture
      // version can never join the load
      val tmp = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q181_adversarial_${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"
      val shard = new java.io.File(tmp)
      Option(shard.listFiles()).foreach(_.foreach(_.delete()))
      shard.mkdirs()
      // a literal backslash-u JSON escape (built by concat: the Scala
      // lexer would otherwise decode \-u sequences even in raw strings)
      val esc = "\\" + "u00e9"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$tmp/shard-000.json"),
        """{"doc_id": 1, "body": "plain ascii text", "lang": "en", "source": "s1", "n_chars": 16}""" + "\n" +
        // raw UTF-8 multibyte AND a \uXXXX escape that must decode to é
        s"""{"doc_id": 2, "body": "caf$esc naïve résumé — ünïcødé", "lang": "fr"}""" + "\n" +
        // duplicate alias: legacy `body` AND canonical `text` — canonical wins
        """{"doc_id": 3, "body": "legacy value loses", "text": "canonical wins"}""" + "\n" +
        // malformed (truncated) line: PERMISSIVE null-fills, row survives
        """{"doc_id": 4, "body": "truncated record""" + "\n" +
        // invalid typed id: try_cast -> null id, payload kept
        """{"doc_id": "5x", "body": "bad id"}""" + "\n" +
        // id key absent on this record (present on others - no DQ001)
        """{"body": "no id"}""" + "\n" +
        // number token into the all-string schema, invalid n_chars
        """{"doc_id": 7, "body": 12345, "n_chars": "nope"}""" + "\n")
      val contract = EdgeContract("documents_ndjson", Seq(
        "doc_id" -> ColumnSpec(LongType, required = true),
        "text" -> ColumnSpec(StringType, required = true),
        "lang" -> ColumnSpec(StringType),
        "source" -> ColumnSpec(StringType),
        "n_chars" -> ColumnSpec(LongType),
        "quality_score" -> ColumnSpec(DoubleType)))
      Loader.loadNdjson(s, tmp, contract, aliases = Map("body" -> "text"))
        .df.orderBy(col("doc_id").asc_nulls_last, col("text").asc_nulls_last)
    },
    Some("""
      SELECT * FROM (VALUES
        (1::BIGINT, 'plain ascii text', 'en', 's1', 16::BIGINT, CAST(NULL AS DOUBLE)),
        (2::BIGINT, 'café naïve résumé — ünïcødé', 'fr', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        (3::BIGINT, 'canonical wins', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        (CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        (CAST(NULL AS BIGINT), 'bad id', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        (CAST(NULL AS BIGINT), 'no id', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)),
        (7::BIGINT, '12345', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE))
      ) AS t(doc_id, text, lang, source, n_chars, quality_score)
      ORDER BY doc_id NULLS LAST, text NULLS LAST
    """.stripMargin.trim))

  /** q156 sizing pass shared by both shard-export arms: per source,
    * `ceil(estimated_bytes / target)` shards capped at one shard per
    * record (a record cannot split across shards; the oracle applies
    * the same `least()`). One groupBy — a single shuffle on `source`. */
  def shardPlanOf(d: DataFrame, target: Long, overhead: Long): DataFrame =
    d.select(col("source"),
      (octet_length(coalesce(col("text"), lit(""))).cast("long") + overhead)
        .as("rec_bytes"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_src"), sum(col("rec_bytes")).as("est_bytes"))
      .withColumn("n_shards",
        least(expr(s"(est_bytes + ${target - 1}) DIV $target"),
          col("n_docs_src")))
      .select(col("source"), col("n_docs_src"), col("n_shards"))

  /** PRODUCTION shard-export arm: the q156 plan sizes ONLY the partition
    * count (Σ n_shards); `repartitionByRange(nBins, source, doc_id)`
    * places size-balanced boundaries from its internal reservoir sample,
    * needing NO global per-source sort and NO per-source window — a
    * dominant source spreads across as many range partitions as its
    * row share earns, so nothing funnels through one task at 100 TB.
    * The writer emits codec-compressed NDJSON into `source=...` dirs
    * (one file per source per range partition: boundary partitions may
    * hold two sources, so files ≤ nBins + nSources). */
  def shardExportRange(d: DataFrame, nBins: Int, out: String,
      codec: String = "gzip"): Unit =
    d.repartitionByRange(math.max(nBins, 1), col("source"), col("doc_id"))
      .write.mode("overwrite")
      .option("compression", codec)
      .partitionBy("source")
      .json(out)

  /** Deterministic explicit-bin arm (ORACLE/spec tier): dense bin ids by
    * even row-split within each source via a per-source row_number
    * window, so the executed placement is externally recomputable
    * bit-for-bit (ShardExportSpec pins bins == the plan formula and
    * per-bin balance within one row). FIXTURE-scale by design: at
    * 100 TB the per-source window funnels a dominant source through one
    * task — production writes go through [[shardExportRange]]. */
  def shardBinsExplicit(d: DataFrame, plan: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planJ = broadcast(plan.withColumnRenamed("source", "_psrc"))
    d.join(planJ, d("source") <=> planJ("_psrc")).drop("_psrc")
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("doc_id").asc_nulls_last, col("text").asc_nulls_last)))
      .withColumn("bin", expr("CAST(((_rn - 1) * n_shards) DIV n_docs_src AS BIGINT)"))
      .drop("_rn", "n_docs_src", "est_bytes", "n_shards")
  }

  /** q182: COMPRESSED shard export through the PRODUCTION write path —
    * the write side of the corpus pipeline at a real interchange format
    * and a realistic shard target (1 MiB). The q156 sizing pass plans
    * per-source shard counts; [[shardExportRange]] executes it with
    * `repartitionByRange` only (no explicit bin column, no per-source
    * window — the r17 scale-funnel is out of this path). The gzip
    * `source=...` tree is then re-loaded through `loadNdjson` (Spark
    * decodes `.json.gz` natively; the partition-dir column comes back
    * through the same contract seal) and the query emits per-source
    * conservation: doc count, char volume, a portable md5-prefix text
    * checksum, and the planned shard count. The oracle recomputes every
    * column from the parquet ground truth, so codec loss, a missing
    * shard, or a planning drift each fail the hash. Exact bin placement
    * (the r17 oracle's bins-observed column) is carried by the
    * explicit-bin arm's spec pin (ShardExportSpec over
    * [[shardBinsExplicit]]) — the driver row verifies conservation and
    * plan sizing, the spec verifies deterministic placement.
    *
    * Null-safe (<=>) plan joins throughout: a NULL-source document
    * forms its own plan group in BOTH engines, and an equi-join would
    * silently DROP it here (null != null) while the oracle's GROUP BY
    * keeps it — data loss in the export and a guaranteed hash mismatch.
    */
  val q182NdjsonShardedGz = QueryDef(
    "q182_ndjson_sharded_gz",
    (s, dir) => {
      val target = 1048576L
      val d = Tables.documents(s, dir)
      val plan = shardPlanOf(d, target, overhead = 16L)
      val nBins = plan.agg(sum(col("n_shards"))).head().getLong(0).toInt
      val out = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_q182_shards_${dir.replaceAll("[^A-Za-z0-9.]+", "_")}"
      shardExportRange(
        d.select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
          col("source")),
        nBins, out)
      // placement guard (r18 ADVICE): conservation alone cannot see a
      // placement regression (nBins ignored -> one file per source), so
      // the query itself asserts the file estate scales with the plan.
      // nBins range partitions over >= nBins rows leave at most a few
      // empty; /2 is far below any healthy run and far above the
      // one-file-per-source failure shape. A breach fails the driver row.
      val nDataFiles = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).toSeq.flatten
              .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
              .flatMap(walk)
          else Seq(f)
        walk(new java.io.File(out)).size
      }
      require(nDataFiles >= math.max(nBins / 2, 1),
        s"shard export placement regressed: $nDataFiles data files for " +
          s"$nBins planned bins")
      val contract = EdgeContract("documents_shards", Seq(
        "doc_id" -> ColumnSpec(LongType, required = true),
        "text" -> ColumnSpec(StringType, required = true),
        "lang" -> ColumnSpec(StringType),
        "n_chars" -> ColumnSpec(LongType),
        "source" -> ColumnSpec(StringType)))
      val reread = Loader.loadNdjson(s, out, contract).df
      // asc_nulls_last to match the oracle's DuckDB default NULLS LAST
      val shardsJ = broadcast(
        plan.select(col("source").as("_psrc"), col("n_shards")))
      val agged = reread.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(coalesce(col("text"), lit(""))).cast("long")).as("sum_chars"),
          sum(conv(substring(md5(coalesce(col("text"), lit(""))
            .cast("binary")), 1, 12), 16, 10).cast("long")).as("text_checksum"))
      agged.join(shardsJ, agged("source") <=> shardsJ("_psrc")).drop("_psrc")
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("n_shards"), col("text_checksum"))
        .orderBy(col("source").asc_nulls_last)
    },
    Some("""
      WITH q182rec AS (
        SELECT source, coalesce(text, '') AS t,
               CAST(octet_length(encode(coalesce(text, ''))) + 16 AS BIGINT) AS rb
        FROM documents),
      q182plan AS (
        SELECT source, count(*) AS n_docs,
               least((CAST(sum(rb) AS BIGINT) + 1048575) // 1048576,
                     count(*)) AS n_shards,
               CAST(sum(length(t)) AS BIGINT) AS sum_chars,
               CAST(sum(CAST('0x' || substring(md5(t), 1, 12) AS BIGINT))
                 AS BIGINT) AS text_checksum
        FROM q182rec GROUP BY source)
      SELECT source, n_docs, sum_chars, n_shards, text_checksum
      FROM q182plan
      ORDER BY source
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q46ContractConform, q47EnumValidation, q48CsvRoundtrip,
    q49HierarchyResolve, q180NdjsonRoundtrip, q181NdjsonAdversarial,
    q182NdjsonShardedGz)
}

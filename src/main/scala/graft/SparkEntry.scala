package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Battery structure in declaration order. Exposed (rather than only the
    * flat map) so harnesses can scope session hygiene to FAMILY boundaries:
    * graft.Verify clears the Spark cache between families, not between
    * queries, so the memoised domain ledger and template estate survive
    * across the many reporting queries that share them — per-query sweeps
    * made the driver's correctness gate re-pay the full ledger build ~every
    * query (~10 min wall per SF; the r14 gate timed out under load). */
  def queryFamilies: Seq[(String, Seq[QueryDef])] = Seq(
    "relational" -> Relational.all,
    "joins" -> Joins.all,
    "windows" -> Windows.all,
    "scalars" -> Scalars.all,
    "source_ops" -> SourceOps.all,
    "rwa" -> Rwa.all,
    "ccr" -> Ccr.all,
    "ofcp" -> Ofcp.all,
    "llm_ops" -> LlmOps.all,
    "events" -> Events.all,
    "domain" -> Domain.all,
    "pillar3" -> Pillar3.all,
    "corep08" -> Corep08.all,
    "corep09" -> Corep09.all,
    "catalogue" -> Catalogue.all)

  /** All operator demonstrations, assembled from the per-area batteries. */
  private def defs: Seq[QueryDef] = queryFamilies.flatMap(_._2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed domain pipeline (derive → conform → unify → FX →
    * hierarchy → classify → CCF → CRM waterfall → SA RW → aggregate). */
  def entry(spark: SparkSession): DataFrame =
    Domain.q90DomainPipeline.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator demonstrations, assembled from the per-area batteries. */
  private def defs: Seq[QueryDef] =
    Relational.all ++ Joins.all ++ Windows.all ++ Scalars.all ++
      SourceOps.all ++ Rwa.all ++ Ccr.all ++ Ofcp.all ++ LlmOps.all ++
      Events.all ++ Domain.all ++ Pillar3.all ++ Corep08.all ++
      Corep09.all ++ Catalogue.all

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

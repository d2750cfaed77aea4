package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator demonstration: a Spark query over the harness
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (driver): result columns are sorted by name then value-hashed
  * against the oracle result, so every computed column is aliased identically
  * on both sides, every query ends in a deterministic ORDER BY, and every
  * floating-point output is quantised with [[Q.q2]]/[[Q.q6]] — pure IEEE
  * `floor(x*k+0.5)/k` arithmetic that evaluates bit-identically in Spark and
  * DuckDB (unlike `round`, whose half-even/half-up rules differ per engine).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Quantisation helpers shared by all queries (Spark side). */
object Q {
  /** floor(x*k+0.5)/k — engine-portable rounding; k picked per unit. */
  private def qk(c: Column, k: Double): Column = floor(c * k + lit(0.5)) / k
  /** Money: 2 decimals. */
  def q2(c: Column): Column = qk(c, 100.0)
  /** Rates/ratios: 6 decimals. */
  def q6(c: Column): Column = qk(c, 1e6)
  /** SQL-side equivalents (DuckDB). */
  def sql2(e: String): String = s"floor(($e)*100+0.5)/100"
  def sql6(e: String): String = s"floor(($e)*1e6+0.5)/1e6"
}

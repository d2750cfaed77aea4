package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator demonstration: a Spark query over the harness
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Contract (driver): result columns are sorted by name then value-hashed
  * against the oracle result, so every computed column is aliased identically
  * on both sides and every query ends in a deterministic ORDER BY.
  *
  * Cross-engine float determinism: a float SUM over shuffled partitions is
  * not bit-stable (addition order differs between Spark and DuckDB — the
  * reference hits the identical caveat, reference
  * `tests/properties/test_conservation.py:36-39`). All money/number sums
  * therefore go through exact DECIMAL accumulation ([[Q.dsum]]) and
  * per-row float math is quantised with [[Q.q2]]/[[Q.q6]] — pure IEEE
  * `floor(x*k+0.5)/k`, which evaluates bit-identically in Spark and DuckDB
  * (unlike `round`, whose tie rules differ per engine).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Determinism helpers shared by all queries (Spark side + SQL strings). */
object Q {
  /** floor(x*k+0.5)/k — engine-portable rounding; k picked per unit. */
  private def qk(c: Column, k: Double): Column = floor(c * k + lit(0.5)) / k
  /** Money: 2 decimals. */
  def q2(c: Column): Column = qk(c, 100.0)
  /** Rates/ratios: 6 decimals. */
  def q6(c: Column): Column = qk(c, 1e6)

  /** Exact decimal sum of a double expression, surfaced as double.
    * Per-row cast double→DECIMAL(38,scale) is deterministic for arbitrary
    * doubles, the decimal SUM is exact in any order, and the final
    * decimal→double cast is exact for magnitudes < 2^53/10^scale.
    *
    * SCALE RULE: pick `scale` ≥ the true decimal precision of the summand
    * (e.g. money×rate with 2+2 decimal digits → scale ≥ 4, use 6). When the
    * cast has to ROUND a value that is a "pretty decimal" just beyond the
    * scale (…×.015 at scale 2), Spark and DuckDB disagree: Spark's
    * double→decimal goes through the shortest string repr
    * (BigDecimal.valueOf sees exactly .015, HALF_UP → .02) while DuckDB
    * rounds the binary double (.01499999… → .01). With scale beyond the
    * summand's decimal precision the cast never rounds, so both agree.
    * Ties are then only possible for genuinely irrational values — a
    * measure-zero event (q51's Basel-K sums confirm this empirically).
    *
    * MAGNITUDE RULE: the SUM must satisfy |sum|·10^scale < 2^53 when the
    * raw cast-to-double output is compared directly — beyond that the
    * decimal→double conversion itself rounds, and DuckDB's int128 path is
    * not correctly rounded where Java's BigDecimal.doubleValue is (q57
    * diverged at scale 8 with ~2e9 sums). When the summand has more
    * decimals than the magnitude allows, quantise per-row with [[q2]]
    * (pure floor arithmetic, engine-identical on the same double) and sum
    * at the quantised scale.
    */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** Window variant of [[dsum]]. */
  def dsumOver(c: Column, scale: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(38, scale))).over(w).cast("double")

  /** SQL-side equivalents (DuckDB). */
  def sql2(e: String): String = s"floor(($e)*100+0.5)/100"
  def sql6(e: String): String = s"floor(($e)*1e6+0.5)/1e6"
  def sqlDsum(e: String, scale: Int): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(38,$scale))) AS DOUBLE)"
  def sqlDsumOver(e: String, scale: Int, over: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(38,$scale))) OVER ($over) AS DOUBLE)"
}

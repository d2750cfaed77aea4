package graft.rulebook

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** Regime-as-data rulepack: regulatory parameters live as versioned data
  * (BigDecimal at rest), compiled ONCE per run into Catalyst `Column`
  * expressions or small broadcast-joinable DataFrames (reference
  * `rulebook/model.py`, `rulebook/compile.py:1-23` — "the single
  * Decimal->float boundary"; packs `rulebook/packs/{common,crr,b31}.py`).
  *
  * The Decimal→Double conversion is confined to this file's compile
  * methods, mirroring the reference's single-boundary discipline
  * (SURVEY.md §1.2, §4.1).
  */
sealed trait Rule

/** A single named scalar (e.g. a floor, a multiplier). */
final case class ScalarRule(value: BigDecimal) extends Rule {
  def toLit: Column = lit(value.toDouble)
}

/** key → value lookup, compiled to a when-chain or a broadcast frame
  * (reference `rulebook/compile.py` lookup_expr). When-chain for a handful
  * of keys (stays in codegen); broadcast DataFrame when wide.
  */
final case class LookupTable(
    mapping: Seq[(String, BigDecimal)],
    default: Option[BigDecimal] = None) extends Rule {

  def toWhenChain(key: Column): Column = {
    val base = mapping.foldLeft(Option.empty[Column]) {
      case (None, (k, v))      => Some(when(key === k, lit(v.toDouble)))
      case (Some(acc), (k, v)) => Some(acc.when(key === k, lit(v.toDouble)))
    }.getOrElse(lit(null).cast(DoubleType))
    default.fold(base)(d => base.otherwise(lit(d.toDouble)))
  }

  def toBroadcastDf(spark: SparkSession, keyCol: String, valueCol: String): DataFrame = {
    val rows = mapping.map { case (k, v) => Row(k, v.toDouble) }
    val schema = StructType(Seq(
      StructField(keyCol, StringType), StructField(valueCol, DoubleType)))
    broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1), schema))
  }
}

/** Banded (threshold) table: ordered (upperBoundExclusive → value) with a
  * terminal value — e.g. maturity bands, LTV bands (reference banded
  * tables in `rulebook/model.py`). Compiles to an ordered when-chain.
  */
final case class BandedTable(
    bands: Seq[(BigDecimal, BigDecimal)],
    terminal: BigDecimal) extends Rule {

  def toWhenChain(measure: Column): Column = {
    val base = bands.foldLeft(Option.empty[Column]) {
      case (None, (ub, v)) =>
        Some(when(measure < lit(ub.toDouble), lit(v.toDouble)))
      case (Some(acc), (ub, v)) =>
        Some(acc.when(measure < lit(ub.toDouble), lit(v.toDouble)))
    }.getOrElse(lit(null).cast(DoubleType))
    base.otherwise(lit(terminal.toDouble))
  }
}

/** Multi-key decision table rendered as a broadcast-joinable DataFrame
  * (reference `rulebook/compile.py:148-172` decision_table_df; consumer
  * `engine/crm/haircuts.py:499-520`). Keys are String columns; the value
  * lands in `valueCol`.
  */
final case class DecisionTable(
    keyCols: Seq[String],
    rows: Seq[(Seq[String], BigDecimal)]) extends Rule {

  def toBroadcastDf(spark: SparkSession, valueCol: String): DataFrame = {
    val schema = StructType(
      keyCols.map(StructField(_, StringType)) :+ StructField(valueCol, DoubleType))
    val data = rows.map { case (ks, v) => Row.fromSeq(ks :+ v.toDouble) }
    broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList, 1), schema))
  }
}

/** Feature flag gating regime-specific behaviour (reference feature flags
  * in `rulebook/packs`). */
final case class FeatureFlag(enabled: Boolean) extends Rule

/** A versioned pack of named rules for one regulatory regime. */
final case class Rulepack(
    regime: String,
    version: String,
    rules: Map[String, Rule]) {
  def scalar(name: String): ScalarRule = rules(name).asInstanceOf[ScalarRule]
  def lookup(name: String): LookupTable = rules(name).asInstanceOf[LookupTable]
  def banded(name: String): BandedTable = rules(name).asInstanceOf[BandedTable]
  def decision(name: String): DecisionTable = rules(name).asInstanceOf[DecisionTable]
  def flag(name: String): Boolean = rules(name).asInstanceOf[FeatureFlag].enabled
}

/** The regime packs' monetary-threshold bundles (reference
  * `rulebook/packs/crr.py:762-784` / `packs/b31.py:600-623` — translated
  * values with their citations) and the Phase-5 FX seam (reference
  * `engine/thresholds.py`): the packs hold FX-INVARIANT regulatory
  * values — CRR carries EUR bases with the `fx_derived` Feature ON, so
  * the engine applies the run's EUR/GBP rate at the read site; Basel 3.1
  * carries PRA-native GBP with the Feature OFF (the sole exception,
  * `sme_balance_sheet_threshold`, is the Rec 2003/361/EC EUR 43m frozen
  * at the default 0.8732 because PS1/26 does not restate it). The
  * market-input rate never enters the pack — it stays on the run config.
  */
object Packs {

  /** The reference's default EUR/GBP rate (`config` default 0.8732). */
  val DefaultEurGbpRate: BigDecimal = BigDecimal("0.8732")

  val crr: Rulepack = Rulepack("crr", "v3.0", Map(
    "regulatory_thresholds" -> LookupTable(Seq(
      "sme_turnover_threshold" -> BigDecimal("50000000"), // EUR 50m (Art. 501)
      "sme_balance_sheet_threshold" -> BigDecimal("43000000"), // EUR 43m
      "sme_exposure_threshold" -> BigDecimal("2500000"), // EUR 2.5m (Art. 501)
      "large_corporate_revenue_threshold" -> BigDecimal("0"), // n/a under CRR
      "retail_max_exposure" -> BigDecimal("1000000"), // EUR 1m (Art. 123(c))
      "qrre_max_limit" -> BigDecimal("100000"), // EUR 100k (Art. 123)
      "lfse_total_assets_threshold" -> BigDecimal("70000000000"))), // EUR 70bn
    "regulatory_thresholds_fx_derived" -> FeatureFlag(true)))

  val b31: Rulepack = Rulepack("b31", "v4.0.0", Map(
    "regulatory_thresholds" -> LookupTable(Seq(
      "sme_turnover_threshold" -> BigDecimal("44000000"), // GBP 44m (Art. 153(4))
      "sme_balance_sheet_threshold" -> BigDecimal("37547600"), // 43m x 0.8732 frozen
      "sme_exposure_threshold" -> BigDecimal("0"), // n/a under Basel 3.1
      "large_corporate_revenue_threshold" -> BigDecimal("440000000"), // GBP 440m
      "retail_max_exposure" -> BigDecimal("880000"), // GBP 880k (Art. 147(5A))
      "qrre_max_limit" -> BigDecimal("90000"), // GBP 90k (Art. 147(5A)(c))
      "lfse_total_assets_threshold" -> BigDecimal("79000000000"))), // GBP 79bn
    "regulatory_thresholds_fx_derived" -> FeatureFlag(false)))

  /** Resolve one GBP threshold from a pack, applying × rate where the
    * regime's Feature says the values are FX-derived (the
    * `engine/thresholds.py::regulatory_threshold` seam). Decimal
    * arithmetic until the single Decimal→Double boundary. */
  def regulatoryThreshold(
      pack: Rulepack, name: String, eurGbpRate: BigDecimal): Double = {
    val base = pack.lookup("regulatory_thresholds").mapping
      .find(_._1 == name)
      .getOrElse(throw new NoSuchElementException(name))._2
    val resolved =
      if (pack.flag("regulatory_thresholds_fx_derived")) base * eurGbpRate
      else base
    resolved.toDouble
  }
}

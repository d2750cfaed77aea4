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

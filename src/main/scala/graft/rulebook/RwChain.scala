package graft.rulebook

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dual-compiled risk-weight override chain (reference
  * `engine/sa/risk_weights.py:557-904` `_RWChain` combinators; the B3.1
  * override cascade `:1034-1243`).
  *
  * The cascade is pure data: ordered branches of (label, predicate,
  * value), where predicates and values are tiny ASTs that compile BOTH to
  * a Catalyst `Column` (a when-chain that stays inside whole-stage
  * codegen) and to the equivalent oracle SQL fragment — one source of
  * truth, two engines, transcription-proof parity. The label column gives
  * the per-exposure audit lineage ("which article fired") that the
  * reference carries in its output ledger.
  *
  * Long cascades are compiled in BATCHES: each batch of `batchSize`
  * branches becomes one when-chain yielding a nullable (label, rw)
  * struct, and the batches are `coalesce`d in order. Disjoint-prefix
  * semantics are identical to one long chain, but each generated Java
  * method stays small — the 64KB JVM method / codegen-split rule for
  * 849-branch-scale chains (SURVEY §2).
  */
object RwChain {

  // ---- predicate AST ---------------------------------------------------

  sealed trait Pred {
    def toColumn: Column
    def toSql: String
  }
  /** Bare boolean column (derived flags are non-null by construction). */
  final case class Flag(name: String) extends Pred {
    def toColumn: Column = col(name)
    def toSql: String = name
  }
  final case class Not(p: Pred) extends Pred {
    def toColumn: Column = !p.toColumn
    def toSql: String = s"NOT (${p.toSql})"
  }
  final case class EqS(name: String, v: String) extends Pred {
    def toColumn: Column = col(name) === v
    def toSql: String = s"$name = '$v'"
  }
  final case class NotNull(name: String) extends Pred {
    def toColumn: Column = col(name).isNotNull
    def toSql: String = s"$name IS NOT NULL"
  }
  final case class LeD(name: String, v: Double) extends Pred {
    def toColumn: Column = col(name) <= v
    def toSql: String = s"$name <= $v"
  }
  final case class All(ps: Pred*) extends Pred {
    def toColumn: Column = ps.map(_.toColumn).reduce(_ && _)
    def toSql: String = ps.map(p => s"(${p.toSql})").mkString(" AND ")
  }

  // ---- value AST (Decimal at rest; the toColumn/toSql methods are the
  //      single Decimal→Double boundary, same discipline as Rulepack) ----

  sealed trait RwValue {
    def toColumn: Column
    def toSql: String
  }
  final case class Fixed(v: BigDecimal) extends RwValue {
    def toColumn: Column = lit(v.toDouble)
    def toSql: String = s"CAST(${v.toDouble} AS DOUBLE)"
  }
  /** CQS-keyed lookup with unrated/default fallback. */
  final case class LookupInt(
      keyCol: String, table: Seq[(Int, BigDecimal)],
      default: BigDecimal) extends RwValue {
    def toColumn: Column = {
      val chain = table.foldLeft(Option.empty[Column]) {
        case (None, (k, v)) => Some(when(col(keyCol) === k, lit(v.toDouble)))
        case (Some(acc), (k, v)) => Some(acc.when(col(keyCol) === k, lit(v.toDouble)))
      }.get
      chain.otherwise(lit(default.toDouble))
    }
    def toSql: String = table
      .map { case (k, v) => s"WHEN $keyCol = $k THEN CAST(${v.toDouble} AS DOUBLE)" }
      .mkString("CASE ", " ", s" ELSE CAST(${default.toDouble} AS DOUBLE) END")
  }
  /** Banded (e.g. LTV) value: ordered upper-bound-exclusive bands. */
  final case class Banded(
      measureCol: String, bands: Seq[(BigDecimal, BigDecimal)],
      terminal: BigDecimal) extends RwValue {
    def toColumn: Column = {
      val chain = bands.foldLeft(Option.empty[Column]) {
        case (None, (ub, v)) => Some(when(col(measureCol) < ub.toDouble, lit(v.toDouble)))
        case (Some(acc), (ub, v)) => Some(acc.when(col(measureCol) < ub.toDouble, lit(v.toDouble)))
      }.get
      chain.otherwise(lit(terminal.toDouble))
    }
    def toSql: String = bands
      .map { case (ub, v) => s"WHEN $measureCol < ${ub.toDouble} THEN CAST(${v.toDouble} AS DOUBLE)" }
      .mkString("CASE ", " ", s" ELSE CAST(${terminal.toDouble} AS DOUBLE) END")
  }

  // ---- the chain -------------------------------------------------------

  final case class Branch(label: String, cond: Pred, value: RwValue)

  final case class Chain(
      branches: Seq[Branch],
      terminalLabel: String,
      terminal: RwValue) {

    /** Compile to (label, rw) Columns. Batched coalesce — see object doc. */
    def compile(batchSize: Int = 8): (Column, Column) = {
      val batchCols = branches.grouped(batchSize).map { batch =>
        batch.foldLeft(Option.empty[Column]) {
          case (None, b) => Some(when(b.cond.toColumn,
            struct(lit(b.label).as("label"), b.value.toColumn.as("rw"))))
          case (Some(acc), b) => Some(acc.when(b.cond.toColumn,
            struct(lit(b.label).as("label"), b.value.toColumn.as("rw"))))
        }.get
      }.toSeq
      val fallback = struct(lit(terminalLabel).as("label"),
        terminal.toColumn.as("rw"))
      val resolved = coalesce((batchCols :+ fallback): _*)
      (resolved.getField("label"), resolved.getField("rw"))
    }

    def toSqlLabel: String = branches
      .map(b => s"WHEN ${b.cond.toSql} THEN '${b.label}'")
      .mkString("CASE ", " ", s" ELSE '$terminalLabel' END")

    def toSqlRw: String = branches
      .map(b => s"WHEN ${b.cond.toSql} THEN (${b.value.toSql})")
      .mkString("CASE ", " ", s" ELSE (${terminal.toSql}) END")
  }
}

/** The B3.1-style SA risk-weight override cascade as rulepack data
  * (reference `engine/sa/risk_weights.py:1034-1243` ordering: defaults →
  * high-risk → sovereign/PSE → institutions (short-term gate) → retail
  * sub-classes → real estate (banded LTV) → ADC → corporate (SME gate) →
  * covered bonds → equity → residual other).
  */
object SaRwCascade {
  import RwChain._

  val sovereignRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.0"), 2 -> BigDecimal("0.2"), 3 -> BigDecimal("0.5"),
    4 -> BigDecimal("1.0"), 5 -> BigDecimal("1.0"), 6 -> BigDecimal("1.5"))
  val pseRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.2"), 2 -> BigDecimal("0.5"), 3 -> BigDecimal("0.5"),
    4 -> BigDecimal("1.0"), 5 -> BigDecimal("1.0"), 6 -> BigDecimal("1.5"))
  val institutionStRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.2"), 2 -> BigDecimal("0.2"), 3 -> BigDecimal("0.2"),
    4 -> BigDecimal("0.5"), 5 -> BigDecimal("0.5"), 6 -> BigDecimal("1.5"))
  val institutionRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.2"), 2 -> BigDecimal("0.3"), 3 -> BigDecimal("0.5"),
    4 -> BigDecimal("1.0"), 5 -> BigDecimal("1.0"), 6 -> BigDecimal("1.5"))
  val corporateRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.2"), 2 -> BigDecimal("0.5"), 3 -> BigDecimal("0.75"),
    4 -> BigDecimal("1.0"), 5 -> BigDecimal("1.5"), 6 -> BigDecimal("1.5"))
  val coveredBondRw: Seq[(Int, BigDecimal)] = Seq(
    1 -> BigDecimal("0.1"), 2 -> BigDecimal("0.2"), 3 -> BigDecimal("0.2"),
    4 -> BigDecimal("0.5"), 5 -> BigDecimal("0.5"), 6 -> BigDecimal("1.0"))
  val resiLtvBands: Seq[(BigDecimal, BigDecimal)] = Seq(
    BigDecimal("0.5") -> BigDecimal("0.2"), BigDecimal("0.6") -> BigDecimal("0.25"),
    BigDecimal("0.8") -> BigDecimal("0.3"), BigDecimal("0.9") -> BigDecimal("0.4"),
    BigDecimal("1.0") -> BigDecimal("0.5"))
  val commLtvBands: Seq[(BigDecimal, BigDecimal)] = Seq(
    BigDecimal("0.6") -> BigDecimal("0.6"), BigDecimal("0.8") -> BigDecimal("0.7"))

  /** 24 branches + terminal. Order is load-bearing: earlier overrides win. */
  val chain: Chain = Chain(
    branches = Seq(
      Branch("defaulted_secured",
        All(Flag("is_defaulted"), Flag("provisions_ge_20")), Fixed(BigDecimal("1.0"))),
      Branch("defaulted_unsecured", Flag("is_defaulted"), Fixed(BigDecimal("1.5"))),
      Branch("high_risk", Flag("is_high_risk"), Fixed(BigDecimal("1.5"))),
      Branch("sovereign_rated",
        All(EqS("uc", "SOVEREIGN"), NotNull("cqs")),
        LookupInt("cqs", sovereignRw, BigDecimal("1.0"))),
      Branch("sovereign_unrated", EqS("uc", "SOVEREIGN"), Fixed(BigDecimal("1.0"))),
      Branch("pse_rated",
        All(EqS("uc", "PSE"), NotNull("cqs")),
        LookupInt("cqs", pseRw, BigDecimal("1.0"))),
      Branch("pse_unrated", EqS("uc", "PSE"), Fixed(BigDecimal("1.0"))),
      Branch("institution_short_term_rated",
        All(EqS("uc", "INSTITUTION"), NotNull("cqs"), LeD("maturity_years", 0.25)),
        LookupInt("cqs", institutionStRw, BigDecimal("0.5"))),
      Branch("institution_rated",
        All(EqS("uc", "INSTITUTION"), NotNull("cqs")),
        LookupInt("cqs", institutionRw, BigDecimal("1.0"))),
      Branch("institution_unrated_scra", EqS("uc", "INSTITUTION"),
        Fixed(BigDecimal("0.4"))),
      Branch("qrre_transactor",
        All(EqS("uc", "RETAIL"), Flag("is_qrre_transactor")), Fixed(BigDecimal("0.45"))),
      Branch("retail_payroll",
        All(EqS("uc", "RETAIL"), Flag("is_payroll_loan")), Fixed(BigDecimal("0.35"))),
      Branch("retail_non_regulatory",
        All(EqS("uc", "RETAIL"), Not(Flag("qualifies_as_retail"))), Fixed(BigDecimal("1.0"))),
      Branch("retail_regulatory", EqS("uc", "RETAIL"), Fixed(BigDecimal("0.75"))),
      Branch("re_residential", EqS("uc", "RE_RESIDENTIAL"),
        Banded("ltv", resiLtvBands, BigDecimal("0.7"))),
      Branch("re_commercial", EqS("uc", "RE_COMMERCIAL"),
        Banded("ltv", commLtvBands, BigDecimal("1.0"))),
      Branch("adc_financing", EqS("uc", "ADC"), Fixed(BigDecimal("1.5"))),
      Branch("corporate_sme",
        All(EqS("uc", "CORPORATE"), Flag("is_sme")), Fixed(BigDecimal("0.85"))),
      Branch("corporate_rated",
        All(EqS("uc", "CORPORATE"), NotNull("cqs")),
        LookupInt("cqs", corporateRw, BigDecimal("1.0"))),
      Branch("corporate_unrated", EqS("uc", "CORPORATE"), Fixed(BigDecimal("1.0"))),
      Branch("covered_bond_rated",
        All(EqS("uc", "COVERED_BOND"), NotNull("cqs")),
        LookupInt("cqs", coveredBondRw, BigDecimal("0.5"))),
      Branch("covered_bond_unrated", EqS("uc", "COVERED_BOND"), Fixed(BigDecimal("0.5"))),
      Branch("equity_speculative",
        All(EqS("uc", "EQUITY"), Flag("is_speculative")), Fixed(BigDecimal("4.0"))),
      Branch("equity", EqS("uc", "EQUITY"), Fixed(BigDecimal("2.5")))),
    terminalLabel = "other",
    terminal = Fixed(BigDecimal("1.0")))
}

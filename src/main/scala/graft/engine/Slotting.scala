package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Specialised-lending slotting risk weights — CRR Art. 153(5) Table 1
  * (reference `engine/slotting`): category × residual-maturity band →
  * risk weight. Under UK CRR the HVCRE sub-class has NO separate table
  * (reference acceptance scenarios CRR-E4/E7/E8/E9), so HVCRE exposures
  * route through the same Table 1 — the hvcre flag changes nothing here.
  *
  * Pure when-chain over two columns — codegen-native, embarrassingly
  * parallel at any scale.
  */
object Slotting {

  /** (category, RW for residual maturity < 2.5y, RW for ≥ 2.5y). */
  val table1: Seq[(String, Double, Double)] = Seq(
    ("strong", 0.50, 0.70),
    ("good", 0.70, 0.90),
    ("satisfactory", 1.15, 1.15),
    ("weak", 2.50, 2.50),
    ("default", 0.0, 0.0))

  /** Art. 153(5) risk weight for a slotting category and residual
    * maturity in years. An unknown category is NOT floored silently —
    * it takes the punitive 'weak' 250% (conservative), mirroring the
    * reference's unmapped-category handling. */
  def riskWeight(category: Column, residualMaturityYears: Column): Column = {
    val lt25 = residualMaturityYears < 2.5
    table1.foldLeft(Option.empty[Column]) {
      case (acc, (cat, rwLt, rwGe)) =>
        val v = when(lt25, rwLt).otherwise(rwGe)
        Some(acc.fold(when(lower(category) === cat, v))(
          _.when(lower(category) === cat, v)))
    }.get.otherwise(2.50)
  }

  /** (category, EL rate for residual maturity < 2.5y, EL rate for ≥ 2.5y)
    * — CRR Art. 158(6) Table B (reference
    * `rulebook/packs/crr.py:512-537` `slotting_el_base`/`slotting_el_short`;
    * under UK CRR the table has a single specialised-lending column, the
    * EU HVCRE row was not onshored —
    * `engine/slotting/transforms.py:451-477`). */
  val elTable: Seq[(String, Double, Double)] = Seq(
    ("strong", 0.0, 0.004),
    ("good", 0.004, 0.008),
    ("satisfactory", 0.028, 0.028),
    ("weak", 0.08, 0.08),
    ("default", 0.50, 0.50))

  /** Art. 158(6) expected-loss rate for a slotting category and residual
    * maturity. The reference's unmapped-category default is the
    * satisfactory 2.8% (`slotting_el_base` `default=0.028`). */
  def elRate(category: Column, residualMaturityYears: Column): Column = {
    val lt25 = residualMaturityYears < 2.5
    elTable.foldLeft(Option.empty[Column]) {
      case (acc, (cat, elLt, elGe)) =>
        val v = when(lt25, elLt).otherwise(elGe)
        Some(acc.fold(when(lower(category) === cat, v))(
          _.when(lower(category) === cat, v)))
    }.get.otherwise(0.028)
  }
}

package graft.rulebook

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RulepackSpec extends SparkSpec {
  import spark.implicits._

  private val pack = Rulepack("crr", "v1", Map(
    "sme_factor" -> ScalarRule(BigDecimal("0.7619")),
    "cqs_rw" -> LookupTable(Seq(
      "1" -> BigDecimal("0.20"), "2" -> BigDecimal("0.50"),
      "3" -> BigDecimal("1.00")), default = Some(BigDecimal("1.50"))),
    "maturity_haircut" -> BandedTable(
      bands = Seq(BigDecimal(1) -> BigDecimal("0.005"),
                  BigDecimal(5) -> BigDecimal("0.02")),
      terminal = BigDecimal("0.04")),
    "haircuts" -> DecisionTable(
      keyCols = Seq("collateral_type", "cqs_band"),
      rows = Seq(
        Seq("bond", "good") -> BigDecimal("0.01"),
        Seq("bond", "bad") -> BigDecimal("0.04"),
        Seq("equity", "good") -> BigDecimal("0.15"))),
    "use_floor" -> FeatureFlag(true)))

  test("scalar compiles to an exact double literal") {
    val r = spark.range(1).select(pack.scalar("sme_factor").toLit.as("v")).first()
    assert(r.getDouble(0) == 0.7619)
  }

  test("lookup when-chain with default") {
    val df = Seq("1", "3", "9").toDF("cqs")
      .select(col("cqs"), pack.lookup("cqs_rw").toWhenChain(col("cqs")).as("rw"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("1" -> 0.20, "3" -> 1.00, "9" -> 1.50))
  }

  test("banded table resolves ordered thresholds") {
    val df = Seq(0.5, 3.0, 10.0).toDF("m")
      .select(col("m"), pack.banded("maturity_haircut").toWhenChain(col("m")).as("h"))
    val got = df.collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got == Map(0.5 -> 0.005, 3.0 -> 0.02, 10.0 -> 0.04))
  }

  test("decision table renders a broadcast-joinable frame") {
    val rules = pack.decision("haircuts").toBroadcastDf(spark, "haircut")
    val facts = Seq(("bond", "good"), ("equity", "good"), ("gold", "good"))
      .toDF("collateral_type", "cqs_band")
    val out = facts.join(rules, Seq("collateral_type", "cqs_band"), "left")
      .select(col("collateral_type"), col("haircut")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out == Map("bond" -> Some(0.01), "equity" -> Some(0.15), "gold" -> None))
  }

  test("feature flag") { assert(pack.flag("use_floor")) }
}

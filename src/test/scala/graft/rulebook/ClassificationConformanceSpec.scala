package graft.rulebook

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.DomainPipeline

/** Classification / approach-routing conformance (reference
  * `tests/conformance/test_classification_conformance.py`): the full
  * combination space is generated, the externally-authored decision
  * table resolves a verdict per combination (first match wins, a miss is
  * a failure), and the REAL `DomainPipeline.classify` runs over the same
  * combinations as a DataFrame — every verdict must agree. The table is
  * pure data (`classification_table.toml`); it must never be edited to
  * make a failing assertion pass.
  */
class ClassificationConformanceSpec extends SparkSpec {

  private lazy val tableText: String = {
    val in = getClass.getResourceAsStream("/conformance/classification_table.toml")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
  private lazy val table =
    ConformanceTable.load(tableText, Seq("exposure_class", "approach"))

  /** The generated combination space: every dimension value crossed. */
  private lazy val combos: Seq[Map[String, Any]] = for {
    sovereign <- Seq(true, false)
    cqs <- 1 to 6
    sector <- Seq("property", "manufacturing", "institution", "individual", "corporate")
    drawnBand <- Seq("under_100k", "over_100k")
    turnoverBand <- Seq("under_50m", "over_50m")
    parity <- Seq("even", "odd")
  } yield Map(
    "sovereign_listed" -> sovereign, "cqs" -> cqs, "sector" -> sector,
    "drawn_band" -> drawnBand, "turnover_band" -> turnoverBand,
    "parity" -> parity)

  /** Map a combination onto the physical classifier inputs. Geography
    * encodes both sovereign-listing and grant parity: GERMANY/FRANCE are
    * sovereign-eligible, EVENLAND/ODDLAND are not; GERMANY and EVENLAND
    * hold IRB grants. */
  private def country(c: Map[String, Any]): String =
    (c("sovereign_listed"), c("parity")) match {
      case (true, "even") => "GERMANY"
      case (true, _) => "FRANCE"
      case (false, "even") => "EVENLAND"
      case (false, _) => "ODDLAND"
    }

  test("table covers the full combination space with zero misses") {
    for (f <- Seq("exposure_class", "approach")) {
      val cov = ConformanceTable.coverage(table, f, combos)
      assert(cov.missed == 0, s"$f: ${cov.missed} combinations missed")
      assert(cov.excluded == 0)
      assert(cov.verdicted == combos.size)
      assert(cov.neverMatched(f).isEmpty,
        s"$f rules never matched: ${cov.neverMatched(f)}")
    }
  }

  test("engine classification agrees with every authored verdict") {
    val spark0 = spark
    import spark0.implicits._
    val rows = combos.zipWithIndex.map { case (c, i) =>
      (i.toLong, country(c), c("cqs").asInstanceOf[Int],
        c("sector").toString,
        if (c("drawn_band") == "under_100k") 50000.0 else 250000.0,
        if (c("turnover_band") == "under_50m") 10000000.0 else 90000000.0)
    }
    val input = rows.toDF(
      "combo_id", "country", "effective_cqs", "sector", "drawn_base", "turnover")
    val grants = Seq("GERMANY", "EVENLAND").flatMap(ctry =>
      Seq(("IRB-CORP-1", "corporate", ctry), ("IRB-INST-1", "institution", ctry)))
      .toDF("model_id", "perm_class", "perm_country")
      .select(col("perm_country"), col("perm_class"), col("model_id"))
    val out = DomainPipeline.classify(input, grants)
      .select(col("combo_id"), col("exposure_class"), col("approach"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap

    val disagreements = combos.zipWithIndex.flatMap { case (c, i) =>
      val (engineClass, engineApproach) = out(i.toLong)
      val wantClass = table.verdict("exposure_class", c).get
      val wantApproach = table.verdict("approach", c).get
      val diffs =
        (if (engineClass != wantClass)
          Seq(s"combo $i $c: class engine=$engineClass table=$wantClass") else Nil) ++
        (if (engineApproach != wantApproach)
          Seq(s"combo $i $c: approach engine=$engineApproach table=$wantApproach") else Nil)
      diffs
    }
    assert(disagreements.isEmpty,
      s"${disagreements.size} disagreement(s):\n${disagreements.take(10).mkString("\n")}")
    assert(out.size == combos.size)
  }

  test("matcher semantics: exclusions, misses and first-match order") {
    val t = ConformanceTable.load(
      """
        |[[x_rule]]
        |verdict = "a"
        |citation = "first"
        |[x_rule.when]
        |k = ["1", "2"]
        |
        |[[x_rule]]
        |verdict = "b"
        |citation = "second"
        |[x_rule.when]
        |k = "2"
        |
        |[[exclusion]]
        |[exclusion.when]
        |k = "9"
        |""".stripMargin, Seq("x"))
    assert(t.verdict("x", Map("k" -> "2")).contains("a")) // first match wins
    assert(t.verdict("x", Map("k" -> "3")).isEmpty)       // miss, no default
    assert(t.excluded(Map("k" -> "9")))
    assert(!t.excluded(Map("k" -> "1")))
    // authoring contract: a rule without citation is rejected
    assertThrows[IllegalArgumentException](ConformanceTable.load(
      "[[y_rule]]\nverdict = \"v\"\n", Seq("y")))
  }
}

package graft.queries

import graft.SparkSpec
import graft.rulebook.ValidationCatalogue
import graft.rulebook.ValidationCatalogue._

/** The catalogue-as-data machinery: record translation, the shared
  * formula grammar, scoping/expansion, and the evaluated outcome census
  * (reference `validations/rules.py` / `scope.py` / `evaluate.py`). */
class CatalogueSpec extends SparkSpec {

  test("catalogue data: both publishers load complete") {
    val recs = ValidationCatalogue.records
    assert(recs.size == 1831)
    assert(recs.count(_.catalogue == "crr") == 1011)
    assert(recs.count(_.catalogue == "b31") == 820)
    // the reference's real enforcement predicate (`rules.py::
    // is_currently_enforced`): live OR reactivated, excluding deleted —
    // 741 EBA rules, NOT the 588 that `status == live` alone yields
    // (153 were deactivated and later switched back on)
    assert(ValidationCatalogue.liveRecords.count(_.catalogue == "crr") == 741)
    assert(ValidationCatalogue.liveRecords.count(_.catalogue == "b31") == 808)
    // ids/severities survive translation
    val v0204 = recs.find(_.id == "v0204_m").get
    assert(v0204.severity == "ERROR" && v0204.tables == Seq("C 02.00"))
  }

  test("parser: EBA positional grammar") {
    val Right(cmp) = parse("{r0010, c0010} = {r0040, c0010} + {r0490, c0010}")
    assert(cmp.op == "=")
    val rs = refs(cmp.lhs) ++ refs(cmp.rhs)
    assert(rs.map(_.row) == Seq(Some("0010"), Some("0040"), Some("0490")))
    assert(rs.forall(_.colId.contains("0010")))
  }

  test("parser: table + sheet qualifiers, legacy 3-digit refs, percent") {
    val Right(c1) = parse("{C 02.00, r0070 , c0010}=={C 07.00.a, r0010 , c0220 , s0002}")
    assert(c1.op == "==")
    assert(refs(c1.rhs).head.sheet.contains("0002"))
    val Right(c2) = parse("{C 02.00, r310, c010} >= {r0020, c0010} * 4.5%")
    assert(refs(c2.lhs).head.row.contains("0310"))
    assert(c2.rhs.isInstanceOf[Bin])
  }

  test("parser: BoE keyed grammar with z-axis and filter") {
    val Right(c) = parse(
      "{t: OF09.01.01.01, r: 0010, c: 0010, filter: [eba_dim:CEG] = [eba_GA:x1]} = " +
        "{t: OF07.00.01.01, r: 0010, c: 0010, z: 0002}")
    val rs = refs(c.lhs) ++ refs(c.rhs)
    assert(rs.head.table.contains("OF09.01.01.01"))
    assert(rs.head.dimFilter.isDefined)
    assert(rs(1).sheet.contains("0002"))
  }

  test("parser: where-filtered row sum (the v7520/v7536 families)") {
    val Right(rule) = ValidationCatalogue.parseRule(
      "if {C 08.01.a, r0070, c0020, s0013} = {C 08.01.a, r0010, c0020, s0013} " +
        "then sum(where({C 08.02,rNNN,c0010,s0013}=1)" +
        "{C 08.02, rNNN, c0020, s0013}) = {C 09.02, r0080, c0030, [CEG=eba_GA:x1]}")
    assert(rule.conds.size == 1)
    val ws = rule.mains.head.lhs.asInstanceOf[ValidationCatalogue.WhereSum]
    assert(ws.op == "=" && ws.flag == ValidationCatalogue.Num("1"))
    assert(ws.cond.row.contains("NNN") && ws.cond.colId.contains("0010"))
    assert(ws.value.colId.contains("0020") && ws.value.sheet.contains("0013"))
    // the complement shape uses a `< 1` condition and survives spacing
    val Right(r2) = ValidationCatalogue.parseRule(
      "sum (where({C 08.02,rNNN,c0010,s0005} <1){C 08.02, rNNN, c0255, s0005}) " +
        "= {C 09.02, r0090, c0110, [CEG=eba_GA:x1]}")
    assert(r2.mains.head.lhs.asInstanceOf[ValidationCatalogue.WhereSum].op == "<")
  }

  test("parser: unsupported constructs refused by name") {
    assert(parse("if {r0010, c0010} > 0 then {r0020, c0010} > 0") == Left("conditional_rule"))
    assert(parse("[ei219] in {[eba_CT:x10]}") == Left("enum_membership"))
    assert(parse("{r0010} > 0 or {r0020} > 0") == Left("boolean_disjunction"))
  }

  test("parser: min/max compile to least/greatest arguments") {
    // the v6263_m shape: a scalar floor inside max
    val Right(c) = parse("{r0160} = max(0.08, {r0130}) + {r0740}")
    val fns = ValidationCatalogue.refs(c.rhs)
    assert(fns.map(_.row.get) == Seq("0130", "0740"))
    // the BoE multi-row shorthand expands to one arg per row
    val Right(c2) = parse(
      "{t: OF09.02.01.01, r: 0150} <= max({t: OF09.02.01.01, r: 0020; 0030; 0100})")
    assert(ValidationCatalogue.refs(c2.rhs).map(_.row.get) ==
      Seq("0020", "0030", "0100"))
  }

  test("parser: conjunctions split into conjunct comparisons") {
    // range assertion: each conjunct is its own main comparison
    val Right(r1) = ValidationCatalogue.parseRule(
      "({r0010, c0010} <= 1) and ({r0010, c0010} >= 0)")
    assert(r1.conds.isEmpty && r1.mains.size == 2)
    assert(r1.mains.map(_.op) == Seq("<=", ">="))
    // conditional with a conjunction precondition (the v6404_m shape)
    val Right(r2) = ValidationCatalogue.parseRule(
      "if {r0010, c0010} > 0 and {r0170, c0010} > 0 then {r0170, c0020} > 0")
    assert(r2.conds.size == 2 && r2.mains.size == 1)
    // the pre-conditional entry still refuses the multi-main family
    assert(parse("({r0010} <= 1) and ({r0010} >= 0)") == Left("boolean_conjunction"))
  }

  test("parser: sum-over-sheets open and ranged axis markers") {
    // the v0350_m cross-template shape: the open country axis
    val Right(c1) = parse("sum({C 09.01.a, r090, c010, (sNNN)}) = {r010, c010}")
    assert(refs(c1.lhs).head.sheet.contains("*"))
    assert(refs(c1.lhs).head.row.contains("0090"))
    // the v0415/v0420 shape: a ranged sheet axis
    val Right(c2) = parse(
      "{C 09.02, r0010, c0010, [CEG=eba_GA:x1]} = " +
        "sum({C 08.01.a, r0010, c0020, (s0003-0004)})")
    assert(refs(c2.rhs).head.sheet.contains("R:0003:0004"))
    // a sum body that is not a single cell ref stays a named refusal
    assert(parse("sum(1 + 2) = 3").left.exists(_.startsWith("grammar")))
  }

  test("scoping: scope-hoisted refs bind row/col from the instance") {
    // v0305_m: {c0090} = {c0050}+{c0060}+{c0070}+{c0080}, rows_scope=list.
    // Every emitted C 07.00 sheet instances the published CRM identity.
    val insts = Catalogue.instances.filter(_.ruleId == "v0305_m")
    assert(insts.nonEmpty)
    assert(insts.forall(_.instanceKey.split('|').length == 3))
    // the compiled LHS references the instance's 0090 outflow cell
    // (content-addressed name; the bound measure is the (-) total
    // outflow text)
    val lhsCell = insts.head.cells.find(c => insts.head.lhsSql.contains(c.name))
    assert(lhsCell.exists(_.aggSql.contains("guar_covered + coll_covered")))
  }

  test("census: the engine binds and evaluates a substantial battery") {
    val insts = Catalogue.instances
    val skips = Catalogue.skips
    assert(insts.size >= 800, s"evaluated instances: ${insts.size}")
    assert(insts.map(_.ruleId).distinct.size >= 60)
    // skips carry machine-readable reasons, never silence
    assert(skips.forall(_.reason.nonEmpty))
    val reasons = skips.map(_.reason.takeWhile(_ != ':')).distinct
    assert(reasons.contains("table_not_emitted"))
    assert(reasons.exists(_.startsWith("conditional_rule")) ||
      reasons.exists(_.startsWith("grammar")))
  }

  test("evaluation: published identities hold on the generated estate") {
    val dir = "/root/testdata/sf0.001"
    val out = Catalogue.q159ValidationCatalogue.build(spark, dir)
      .select("catalogue", "rule_id", "instance", "status").collect()
    val byRule = out.groupBy(r => (r.getString(0), r.getString(1)))
    // v0305_m (CRM outflow components) holds by construction on every sheet
    val v0305 = out.filter(r => r.getString(1) == "v0305_m" && r.getString(2) != "~")
    assert(v0305.nonEmpty && v0305.forall(r =>
      Set("pass", "vacuous")(r.getString(3))), "v0305_m must hold")
    // v0306_m / v0307_m: the published net-after-substitution and E*
    // identities ({c0110} = {c0040}+{c0090}+{c0100}; {c0150} = {c0110}+
    // {c0120}+{c0130}) hold on every instanced sheet-row
    Seq("v0306_m", "v0307_m").foreach { id =>
      val rows = out.filter(r => r.getString(1) == id && r.getString(2) != "~")
      assert(rows.nonEmpty && rows.forall(r =>
        Set("pass", "vacuous")(r.getString(3))), s"$id must hold")
    }
    // every live record produced at least one outcome row
    val outIds = out.map(r => (r.getString(0), r.getString(1))).toSet
    val liveIds = ValidationCatalogue.liveRecords.map(r => (r.catalogue, r.id)).toSet
    assert(liveIds.subsetOf(outIds ++ byRule.keySet))
  }

  test("geo templates: the live C 09 catalogue records evaluate and hold") {
    val dir = "/root/testdata/sf0.001"
    val out = Catalogue.q159ValidationCatalogue.build(spark, dir)
      .select("catalogue", "rule_id", "instance", "status").collect()
    def evaluated(id: String) =
      out.filter(r => r.getString(1) == id && r.getString(2) != "~")
    // the C 09.01 supporting-factor sign identity (c0080+c0081+c0082 =
    // c0090 on the REPORTED negative-adjustment cells)
    val v0407 = evaluated("v0407_m")
    assert(v0407.nonEmpty, "v0407_m must instance")
    assert(v0407.forall(r => Set("pass", "vacuous")(r.getString(3))))
    // "of which" monotonicity: SME rows within their parent class rows
    Seq("v0411_m", "v0412_m").foreach { id =>
      val rows = evaluated(id)
      assert(rows.nonEmpty, s"$id must instance")
      assert(rows.forall(r => Set("pass", "vacuous")(r.getString(3))),
        s"$id must hold")
    }
    // BoE OF09 ↔ OF07 geographic-total ties (the b31 catalogue)
    Seq("boe_b0190", "boe_b0197").foreach { id =>
      val rows = evaluated(id)
      assert(rows.nonEmpty, s"$id must instance")
      assert(rows.forall(r => Set("pass", "vacuous")(r.getString(3))),
        s"$id must hold")
    }
    // a BoE strict z-list naming sheets this vocabulary does not emit
    // stays a named skip, never a silent partial sum
    val b0282 = out.filter(r => r.getString(1) == "boe_b0282")
    assert(b0282.nonEmpty && b0282.forall(_.getString(2) == "~"))
  }
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.DomainPipeline
import Q._

/** COREP C 08.01 — the IRB own-funds template (reference
  * `reporting/corep/c08.py`; PRA PS1/26 / EBA Annex II). The defining
  * C 08.01 semantic carried over is the TWO-BASIS split the reference
  * records at length:
  *
  *  - ORIGIN basis (the obligor's own book): the gross exposure, the CRM
  *    substitution block (col 0070 outflow / 0080 inflow / 0090 net) and
  *    the parameter-driven EL memo stay keyed on the obligor's class —
  *    "presented in the exposure classes relevant for the exposures to
  *    the original obligor".
  *  - POST basis (after Art. 235/236 substitution): the exposure value
  *    and RWEA columns move the guaranteed part to the protection
  *    provider's sheet — the guarantee book of this rulebook is
  *    institution-backed (`DomainPipeline.guarantorRwChain` prices off
  *    the institution row), so every substitution inflow lands on the
  *    institution sheet.
  *
  * The sheet is the q94 mechanism re-used on the IRB branch: every cell
  * is one conditional decimal sum, the whole template ONE aggregation
  * pass over the persisted ledger slice, and the published-style
  * cross-cell rules (column additivity, the `0090 = 0020 − 0070 + 0080`
  * substitution identity rearranged to sum form, and the origin-vs-post
  * RWEA total tie-out) evaluate horizontally on the same single-row
  * aggregate — one ledger scan for sheet AND validations at any scale.
  *
  * The RWEA leg decomposition (collateral at the flat weight, guarantee
  * at the substituted min-weight, remainder at own weight) is EXACT on
  * this slice: the IRB-permitted classes carry no SME supporting factor,
  * so the ledger's `rwa` equals the sum of its three 2-decimal legs and
  * the basis tie-out holds to the cent.
  */
object Corep08 {

  private def d(v: Double): String = s"CAST($v AS DOUBLE)"
  private val collRw = DomainPipeline.collateralRw

  /** (row id, obligor-class predicate source; None = total row). */
  private val rows: Seq[(String, Option[String])] = Seq(
    "R_corporate" -> Some("corporate"),
    "R_institution" -> Some("institution"),
    "R_TOTAL" -> None)

  /** Rows that receive the substitution INFLOW (the guarantor's sheet:
    * institution, plus the total which nets to the whole book). */
  private def inflowRow(clsOpt: Option[String]): Boolean =
    clsOpt.forall(_ == "institution")

  private val cols: Seq[String] = Seq(
    "C0020", // original exposure pre-CRM (origin basis)
    "C0070", // (-) CRM substitution outflow (covered part leaving the obligor)
    "C0080", // CRM substitution inflow (landing on the guarantor's sheet)
    "C0090", // net exposure after substitution (= 0020 - 0070 + 0080)
    "C0255", // RWEA, origin basis (memo: the ledger's per-obligor rwa)
    "C0260", // RWEA, post-substitution basis (guaranteed leg on the guarantor)
    "C0280") // expected loss (origin basis, post-floor parameters)

  private def cellId(row: String, colId: String) = s"C08|$row|$colId"

  /** The Spark measure of one cell — class predicates folded into the
    * measure so every cell shares the single trivially-true predicate
    * (the whole sheet then compiles to one conditional-agg projection). */
  private def measure(colId: String, clsOpt: Option[String]): Column = {
    val cls: Column = clsOpt.fold(lit(true))(c => col("exposure_class") === c)
    val origin: Column => Column = m => when(cls, m).otherwise(0.0)
    val inflow: Column => Column =
      m => if (inflowRow(clsOpt)) m else lit(0.0)
    colId match {
      case "C0020" => origin(col("ead_pre_crm"))
      case "C0070" => origin(col("guar_covered"))
      case "C0080" => inflow(col("guar_covered"))
      case "C0090" =>
        origin(col("ead_pre_crm") - col("guar_covered")) +
          inflow(col("guar_covered"))
      case "C0255" => origin(col("rwa"))
      case "C0260" =>
        origin(col("leg_coll") + col("leg_unsec")) + inflow(col("leg_guar"))
      case "C0280" => origin(col("el"))
    }
  }

  /** The DuckDB twin of [[measure]], generated from the same geometry. */
  private def measureSql(colId: String, clsOpt: Option[String]): String = {
    def origin(m: String): String =
      clsOpt.fold(m)(c => s"CASE WHEN exposure_class = '$c' THEN $m ELSE 0.0 END")
    def inflow(m: String): String = if (inflowRow(clsOpt)) m else "0.0"
    colId match {
      case "C0020" => origin("ead_pre_crm")
      case "C0070" => origin("guar_covered")
      case "C0080" => inflow("guar_covered")
      case "C0090" =>
        s"(${origin("ead_pre_crm - guar_covered")}) + (${inflow("guar_covered")})"
      case "C0255" => origin("rwa")
      case "C0260" =>
        s"(${origin("leg_coll + leg_unsec")}) + (${inflow("leg_guar")})"
      case "C0280" => origin("el")
    }
  }

  /** Published-style cross-cell rules: column additivity (total = sum of
    * class rows), the substitution identity per row rearranged to
    * sum-vs-sum form (0090 + 0070 = 0020 + 0080 — the reference's
    * `boe_b0747`-family `0090 = 0020 − 0035 − 0070 + 0080` with no
    * netting column in this book), and the two-basis RWEA total tie-out
    * (substitution moves RWEA between sheets, never creates it). */
  private val rules: Seq[(String, Seq[String], Seq[String], Double)] =
    cols.map { colId =>
      (s"v_add_$colId",
        Seq(cellId("R_TOTAL", colId)),
        rows.collect { case (r, Some(_)) => cellId(r, colId) },
        0.01)
    } ++
    rows.map { case (row, _) =>
      (s"v_subst_$row",
        Seq(cellId(row, "C0090"), cellId(row, "C0070")),
        Seq(cellId(row, "C0020"), cellId(row, "C0080")),
        0.01)
    } :+
    (("v_basis_rwea",
      Seq(cellId("R_TOTAL", "C0255")),
      Seq(cellId("R_TOTAL", "C0260")),
      0.01))

  val q121CorepC08 = QueryDef(
    "q121_corep_c08",
    (s, dir) => {
      import graft.reporting.{CellSpec, TemplateGenerator}
      val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
      val pdF = greatest(
        lit(0.0001) + (k % 997).cast("double") * lit(0.001), lit(0.0003))
      val lgdF = greatest((k % 60).cast("double") * lit(0.01), lit(0.05))
      val irb = DomainPipeline.ledger(s, dir)
        .filter(col("approach") === "IRB")
        .withColumn("leg_coll", q2(col("coll_covered") * lit(collRw)))
        .withColumn("leg_unsec", q2(col("unsecured") * col("own_rw")))
        .withColumn("leg_guar", q2(col("guar_covered") *
          least(col("own_rw"), coalesce(col("guarantor_rw"), col("own_rw")))))
        .withColumn("el", q2(pdF * lgdF * col("ead_pre_crm")))
      val cells = for {
        (row, clsOpt) <- rows
        colId <- cols
      } yield CellSpec(cellId(row, colId), lit(true), measure(colId, clsOpt))
      // q94's single-branch discipline: ONE aggregation produces the wide
      // 1-row frame; cells and every rule total stack out of it.
      val row0 = TemplateGenerator.wideRow(irb, cells)
      def dsumH(ids: Seq[String]): Column =
        ids.map(id => col(s"`$id`").cast(DecimalType(38, 2)))
          .reduce(_ + _).cast("double")
      val wide = row0.select(
        cells.map(c => col(s"`${c.cellId}`")) ++
        rules.flatMap { case (id, lhs, rhs, _) =>
          Seq(dsumH(lhs).as(s"${id}__lhs"), dsumH(rhs).as(s"${id}__rhs")) }: _*)
      val nullD = "CAST(NULL AS DOUBLE)"
      val stackRows =
        cells.map(c =>
          s"'cell', '${c.cellId}', `${c.cellId}`, $nullD, $nullD") ++
        rules.map { case (id, _, _, _) =>
          s"'validation', '$id', $nullD, `${id}__lhs`, `${id}__rhs`" }
      val stacked = wide.selectExpr(
        s"stack(${stackRows.size}, ${stackRows.mkString(", ")}) " +
          "AS (section, id, value, lhs_total, rhs_total)")
      val tolChain = rules.foldLeft(Option.empty[Column]) {
        case (None, (id, _, _, tol)) => Some(when(col("id") === id, tol))
        case (Some(acc), (id, _, _, tol)) => Some(acc.when(col("id") === id, tol))
      }.get.otherwise(0.01)
      stacked
        .withColumn("diff", col("lhs_total") - col("rhs_total"))
        .withColumn("status", when(col("section") === "validation",
          when(abs(col("diff")) <= tolChain, "pass").otherwise("fail")))
        .orderBy(col("section"), col("id"))
    },
    Some {
      val cellDefs = for {
        ((row, clsOpt), ri) <- rows.zipWithIndex
        (colId, ci) <- cols.zipWithIndex
      } yield {
        val alias = s"cell_${ri}_$ci"
        (cellId(row, colId), alias,
          s"sum(CAST((${measureSql(colId, clsOpt)}) AS DECIMAL(38,2))) AS $alias")
      }
      val aggSelect = cellDefs.map(_._3).mkString(",\n               ")
      val cellUnion = cellDefs.map { case (id, alias, _) =>
        s"SELECT '$id' AS id, CAST($alias AS DOUBLE) AS value FROM agg"
      }.mkString("\n        UNION ALL ")
      val ruleUnion = rules.map { case (id, lhs, rhs, _) =>
        val lhsIn = lhs.map(c => s"'$c'").mkString(", ")
        val rhsIn = rhs.map(c => s"'$c'").mkString(", ")
        s"""SELECT '$id' AS rule_id,
           CAST(sum(CASE WHEN id IN ($lhsIn) THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0.0 AS DECIMAL(38,2)) END) AS DOUBLE) AS lhs_total,
           CAST(sum(CASE WHEN id IN ($rhsIn) THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0.0 AS DECIMAL(38,2)) END) AS DOUBLE) AS rhs_total
         FROM cells"""
      }.mkString("\n        UNION ALL ")
      val tolCase = rules.map { case (id, _, _, tol) =>
        s"WHEN rule_id = '$id' THEN $tol" }.mkString("CASE ", " ", " ELSE 0.01 END")
      s"""
      WITH ${Domain.domainLedgerCtes},
      irb0 AS (
        SELECT *, CAST(substr(exposure_reference, 5) AS BIGINT) AS k
        FROM final WHERE approach = 'IRB'),
      irb AS (
        SELECT *,
          ${sql2(s"coll_covered * ${d(collRw)}")} AS leg_coll,
          ${sql2("unsecured * own_rw")} AS leg_unsec,
          ${sql2("guar_covered * least(own_rw, coalesce(guarantor_rw, own_rw))")}
            AS leg_guar,
          ${sql2("greatest(0.0001 + (k % 997) * 0.001, 0.0003) * " +
            "greatest((k % 60) * 0.01, 0.05) * ead_pre_crm")} AS el
        FROM irb0),
      agg AS MATERIALIZED (
        SELECT $aggSelect
        FROM irb),
      cells AS (
        $cellUnion),
      vals AS (
        $ruleUnion),
      vout AS (
        SELECT rule_id, lhs_total, rhs_total,
               lhs_total - rhs_total AS diff,
               CASE WHEN abs(lhs_total - rhs_total) <= ($tolCase) THEN 'pass'
                    ELSE 'fail' END AS status
        FROM vals)
      SELECT * FROM (
        SELECT 'cell' AS section, id, value,
               NULL::DOUBLE AS lhs_total, NULL::DOUBLE AS rhs_total,
               NULL::DOUBLE AS diff, NULL::VARCHAR AS status
        FROM cells
        UNION ALL
        SELECT 'validation', rule_id, NULL::DOUBLE,
               lhs_total, rhs_total, diff, status
        FROM vout)
      ORDER BY section, id
      """.stripMargin.trim
    })

  val all: Seq[QueryDef] = Seq(q121CorepC08)
}

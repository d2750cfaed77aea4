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

  /** The leaf bands of the CR6 master scale (a PARTITION of [0, 1] plus
    * the forced default band): C 08.02 reports obligor grades, so only
    * the leaves appear — parents/total come from the ROLLUP pass. */
  private val leafRefs = Set(2, 3, 4, 5, 6, 8, 9, 11, 12, 14, 15, 16, 17)

  /** q128: COREP C 08.02 — the obligor-grade (PD scale) detail of
    * C 08.01 (reference `reporting/corep/c08.py`; EBA Annex II "Credit
    * risk IRB by obligor grades or pools"). Where q121 renders the
    * per-class TOTALS with the substitution block, this sheet breaks the
    * origin-basis book down the PD master scale: per (exposure class,
    * leaf PD band) the original exposure (0020), the substitution
    * OUTFLOW leaving the obligor's sheet (0070), the net origin-sheet
    * exposure (0020 − 0070), the EAD-weighted post-floor PD, the
    * distinct-obligor count, origin-basis RWEA, EL and RWA density.
    * Banding follows the CR6 discipline: half-open [lo, hi) on the
    * CRR-floored allocation PD, defaulted rows FORCED to the 100% band.
    * The leaf set partitions the PD axis, so the per-class Total row —
    * emitted by the same ROLLUP shuffle, never a second scan — ties out
    * to q121's class rows by construction.
    *
    * Scale shape: one projection over the persisted ledger slice, a
    * broadcast 13-row leaf-band join (each row lands in exactly ONE
    * band), one ROLLUP shuffle for bands + class totals together.
    */
  val q128CorepC0802 = QueryDef(
    "q128_corep_c0802",
    (s, dir) => {
      import s.implicits._
      val leaves = Pillar3.cr6Bands.filter(t => leafRefs(t._1))
      val bands = broadcast(leaves.toDF("row_ref", "pd_range", "lo", "hi"))
      val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
      val irb = DomainPipeline.ledger(s, dir)
        .filter(col("approach") === "IRB")
        .withColumn("k", k)
        .withColumn("pd_floored",
          greatest(lit(0.0001) + (col("k") % 997).cast("double") * lit(0.001),
            lit(0.0003)))
        .withColumn("lgd_floored",
          greatest((col("k") % 60).cast("double") * lit(0.01), lit(0.05)))
        .withColumn("alloc_pd",
          when(col("is_defaulted"), lit(1.0)).otherwise(col("pd_floored")))
      val agg = irb
        .join(bands, col("alloc_pd") >= col("lo") && col("alloc_pd") < col("hi"))
        .rollup(col("exposure_class"), col("row_ref"))
        .agg(
          count(lit(1)).as("n_exposures"),
          countDistinct(col("counterparty_reference")).as("n_obligors"),
          dsum(col("ead_pre_crm"), 2).as("orig_exposure"),
          dsum(col("guar_covered"), 2).as("subst_outflow"),
          dsum(q2(col("ead_pre_crm") - col("guar_covered")), 2)
            .as("net_origin_exposure"),
          dsum(q2(col("pd_floored") * col("ead_pre_crm")), 2).as("pd_num"),
          dsum(col("rwa"), 2).as("rwea"),
          dsum(q2(col("pd_floored") * col("lgd_floored") * col("ead_pre_crm")), 2)
            .as("expected_loss"))
        .filter(col("exposure_class").isNotNull)
      agg
        .join(broadcast(leaves.map(t => (t._1, t._2)).toDF("row_ref", "pd_range")),
          Seq("row_ref"), "left")
        .select(
          col("exposure_class"),
          coalesce(col("row_ref"), lit(99)).as("row_ref"),
          coalesce(col("pd_range"), lit("Total")).as("pd_range"),
          col("n_exposures"), col("n_obligors"),
          col("orig_exposure"), col("subst_outflow"), col("net_origin_exposure"),
          when(col("orig_exposure") > 0,
            q6(col("pd_num") / col("orig_exposure") * 100)).as("ead_w_pd_pct"),
          col("rwea"),
          when(col("orig_exposure") > 0,
            q6(col("rwea") / col("orig_exposure"))).as("rwa_density"),
          col("expected_loss"))
        .orderBy(col("exposure_class"), col("row_ref"))
    },
    Some {
      val leafValues = Pillar3.cr6Bands.filter(t => leafRefs(t._1))
        .map { case (r, l, lo, hi) => s"($r, '$l', ${d(lo)}, ${d(hi)})" }
        .mkString(", ")
      s"""
      WITH ${Domain.domainLedgerCtes},
      bands(row_ref, pd_range, lo, hi) AS (VALUES $leafValues),
      irb AS (
        SELECT *,
               greatest(0.0001 + (CAST(substr(exposure_reference, 5) AS BIGINT)
                 % 997) * 0.001, 0.0003) AS pd_floored,
               greatest((CAST(substr(exposure_reference, 5) AS BIGINT) % 60)
                 * 0.01, 0.05) AS lgd_floored
        FROM final WHERE approach = 'IRB'),
      c08alloc AS (
        SELECT *, CASE WHEN is_defaulted THEN 1.0 ELSE pd_floored END
                    AS alloc_pd
        FROM irb),
      banded AS (
        SELECT a.*, b.row_ref
        FROM c08alloc a JOIN bands b ON a.alloc_pd >= b.lo AND a.alloc_pd < b.hi),
      rolled AS (
        SELECT exposure_class, row_ref,
               count(*) AS n_exposures,
               count(DISTINCT counterparty_reference) AS n_obligors,
               ${sqlDsum("ead_pre_crm", 2)} AS orig_exposure,
               ${sqlDsum("guar_covered", 2)} AS subst_outflow,
               ${sqlDsum(sql2("ead_pre_crm - guar_covered"), 2)}
                 AS net_origin_exposure,
               ${sqlDsum(sql2("pd_floored * ead_pre_crm"), 2)} AS pd_num,
               ${sqlDsum("rwa", 2)} AS rwea,
               ${sqlDsum(sql2("pd_floored * lgd_floored * ead_pre_crm"), 2)}
                 AS expected_loss
        FROM banded
        GROUP BY ROLLUP(exposure_class, row_ref))
      SELECT r.exposure_class,
             coalesce(r.row_ref, 99) AS row_ref,
             coalesce(b.pd_range, 'Total') AS pd_range,
             r.n_exposures, r.n_obligors,
             r.orig_exposure, r.subst_outflow, r.net_origin_exposure,
             CASE WHEN r.orig_exposure > 0
                  THEN ${sql6("r.pd_num / r.orig_exposure * 100")} END
               AS ead_w_pd_pct,
             r.rwea,
             CASE WHEN r.orig_exposure > 0
                  THEN ${sql6("r.rwea / r.orig_exposure")} END AS rwa_density,
             r.expected_loss
      FROM rolled r LEFT JOIN bands b ON b.row_ref = r.row_ref
      WHERE r.exposure_class IS NOT NULL
      ORDER BY 1, 2
    """.stripMargin.trim
    })

  val all: Seq[QueryDef] = Seq(q121CorepC08, q128CorepC0802)
}

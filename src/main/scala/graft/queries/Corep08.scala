package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{DomainPipeline, Slotting}
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

  /** Published-style cross-cell rules — (id, severity, op, lhs, rhs,
    * tol); `op` ∈ eq/le/ge exactly as q94's catalogue engine. The
    * engine's own identities: column additivity (total = sum of class
    * rows), the substitution identity per row rearranged to sum-vs-sum
    * form (0090 + 0070 = 0020 + 0080 — the reference's `boe_b0747`-
    * family `0090 = 0020 − 0035 − 0070 + 0080` with no netting column
    * in this book), and the two-basis RWEA total tie-out (substitution
    * moves RWEA between sheets, never creates it).
    *
    * Plus the BoE v4.0.0 catalogue slice (reference
    * `reporting/validations/rules/basel31-boe-v4.0.0-credit-risk.json`,
    * the PS1/26 banking_reporting extract — loaded as data by
    * `validations/rules.py`): the OF08.01 families bindable to this
    * sheet's column analogues, ids + severities preserved, instanced
    * per row the way the RAW expressions scope per (r, c):
    *
    *  - boe_b0380 (`abs({c0280}) <= abs({c0020})`): expected loss never
    *    exceeds the original exposure — on this book every cell is
    *    non-negative, so abs() is the identity and the plain `le`
    *    comparison is the published check.
    *  - boe_b0314 family (`{t: OF08.01.01.01} >= 0`): the template-wide
    *    non-negativity sweep (published as per-scope instances
    *    b0314_1_1…b0314_8), instanced here per (row, column) with the
    *    q94 `v3703_s@row:col` keying. */
  private val rules: Seq[(String, String, String, Seq[String], Seq[String], Double)] =
    cols.map { colId =>
      (s"v_add_$colId", "ERROR", "eq",
        Seq(cellId("R_TOTAL", colId)),
        rows.collect { case (r, Some(_)) => cellId(r, colId) },
        0.01)
    } ++
    rows.map { case (row, _) =>
      (s"v_subst_$row", "ERROR", "eq",
        Seq(cellId(row, "C0090"), cellId(row, "C0070")),
        Seq(cellId(row, "C0020"), cellId(row, "C0080")),
        0.01)
    } ++
    Seq(("v_basis_rwea", "ERROR", "eq",
      Seq(cellId("R_TOTAL", "C0255")),
      Seq(cellId("R_TOTAL", "C0260")),
      0.01)) ++
    rows.map { case (row, _) =>
      (s"boe_b0380@$row", "ERROR", "le",
        Seq(cellId(row, "C0280")), Seq(cellId(row, "C0020")), 0.01)
    } ++
    (for {
      (row, _) <- rows
      colId <- Seq("C0020", "C0090", "C0255", "C0260", "C0280")
    } yield (s"boe_b0314@$row:$colId", "ERROR", "ge",
      Seq(cellId(row, colId)), Seq.empty[String], 0.0))

  /** The q121 derived-leg prep over the raw sealed ledger — shared by
    * the sheet build and the REST cell drill-down
    * (`/api/lineage/cell`), so a drilled C 08 cell re-derives its legs
    * identically to the published sheet. */
  private[graft] def c08Prepare(led: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
    val pdF = greatest(
      lit(0.0001) + (k % 997).cast("double") * lit(0.001), lit(0.0003))
    val lgdF = greatest((k % 60).cast("double") * lit(0.01), lit(0.05))
    led.filter(col("approach") === "IRB")
      .withColumn("leg_coll", q2(col("coll_covered") * lit(collRw)))
      .withColumn("leg_unsec", q2(col("unsecured") * col("own_rw")))
      .withColumn("leg_guar", q2(col("guar_covered") *
        least(col("own_rw"), coalesce(col("guarantor_rw"), col("own_rw")))))
      .withColumn("el", q2(pdF * lgdF * col("ead_pre_crm")))
  }

  /** The C 08.01 cell catalogue — predicates stay trivially-true because
    * the substitution-inflow cells (0080/0090/0260) draw from rows of
    * OTHER classes (the guaranteed leg lands on the guarantor's sheet);
    * the class scoping lives inside the measure, so the whole book is
    * each cell's honest drill-down population. */
  private[graft] def c08Cells: Seq[graft.reporting.CellSpec] = for {
    (row, clsOpt) <- rows
    colId <- cols
  } yield graft.reporting.CellSpec(
    cellId(row, colId), lit(true), measure(colId, clsOpt))

  val q121CorepC08 = QueryDef(
    "q121_corep_c08",
    (s, dir) => {
      import graft.reporting.TemplateGenerator
      val irb = c08Prepare(DomainPipeline.ledger(s, dir))
      val cells = c08Cells
      // q94's single-branch discipline: ONE aggregation produces the wide
      // 1-row frame; cells and every rule total stack out of it.
      val row0 = TemplateGenerator.wideRow(irb, cells)
      def dsumH(ids: Seq[String]): Column =
        if (ids.isEmpty) lit(0.0)
        else ids.map(id => col(s"`$id`").cast(DecimalType(38, 2)))
          .reduce(_ + _).cast("double")
      val wide = row0.select(
        cells.map(c => col(s"`${c.cellId}`")) ++
        rules.flatMap { case (id, _, _, lhs, rhs, _) =>
          Seq(dsumH(lhs).as(s"${id}__lhs"), dsumH(rhs).as(s"${id}__rhs")) }: _*)
      val nullD = "CAST(NULL AS DOUBLE)"
      val nullS = "CAST(NULL AS STRING)"
      val stackRows =
        cells.map(c =>
          s"'cell', '${c.cellId}', $nullS, `${c.cellId}`, $nullD, $nullD") ++
        rules.map { case (id, sev, _, _, _, _) =>
          s"'validation', '$id', '$sev', $nullD, `${id}__lhs`, `${id}__rhs`" }
      val stacked = wide.selectExpr(
        s"stack(${stackRows.size}, ${stackRows.mkString(", ")}) " +
          "AS (section, id, severity, value, lhs_total, rhs_total)")
      val passChain = rules.foldLeft(Option.empty[Column]) {
        case (acc, (id, _, op, _, _, tol)) =>
          val cond = op match {
            case "eq" => abs(col("diff")) <= tol
            case "le" => col("diff") <= tol
            case _ => -col("diff") <= tol
          }
          acc match {
            case None => Some(when(col("id") === id, cond))
            case Some(a) => Some(a.when(col("id") === id, cond))
          }
      }.get.otherwise(lit(false))
      stacked
        .withColumn("diff", col("lhs_total") - col("rhs_total"))
        .withColumn("status", when(col("section") === "validation",
          when(passChain, "pass").otherwise("fail")))
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
      def sideSql(ids: Seq[String]): String =
        if (ids.isEmpty) "CAST(0.0 AS DOUBLE)"
        else {
          val in = ids.map(c => s"'$c'").mkString(", ")
          s"CAST(sum(CASE WHEN id IN ($in) THEN CAST(value AS DECIMAL(38,2)) ELSE CAST(0.0 AS DECIMAL(38,2)) END) AS DOUBLE)"
        }
      val ruleUnion = rules.map { case (id, sev, _, lhs, rhs, _) =>
        s"""SELECT '$id' AS rule_id, '$sev' AS severity,
           ${sideSql(lhs)} AS lhs_total,
           ${sideSql(rhs)} AS rhs_total
         FROM cells"""
      }.mkString("\n        UNION ALL ")
      val statusCase = rules.map { case (id, _, op, _, _, tol) =>
        val cond = op match {
          case "eq" => s"abs(lhs_total - rhs_total) <= $tol"
          case "le" => s"lhs_total - rhs_total <= $tol"
          case _ => s"rhs_total - lhs_total <= $tol"
        }
        s"WHEN rule_id = '$id' THEN CASE WHEN $cond THEN 'pass' ELSE 'fail' END"
      }.mkString("CASE ", " ", " ELSE 'fail' END")
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
        SELECT rule_id, severity, lhs_total, rhs_total,
               lhs_total - rhs_total AS diff,
               $statusCase AS status
        FROM vals)
      SELECT * FROM (
        SELECT 'cell' AS section, id, NULL::VARCHAR AS severity, value,
               NULL::DOUBLE AS lhs_total, NULL::DOUBLE AS rhs_total,
               NULL::DOUBLE AS diff, NULL::VARCHAR AS status
        FROM cells
        UNION ALL
        SELECT 'validation', rule_id, severity, NULL::DOUBLE,
               lhs_total, rhs_total, diff, status
        FROM vout)
      ORDER BY section, id
      """.stripMargin.trim
    })

  /** The leaf bands of the CR6 master scale (a PARTITION of [0, 1] plus
    * the forced default band): C 08.02 reports obligor grades, so only
    * the leaves appear — parents/total come from the ROLLUP pass. */
  private[queries] val leafRefs = Set(2, 3, 4, 5, 6, 8, 9, 11, 12, 14, 15, 16, 17)

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

  /** The four PARENT rows of the C 08.03 PD masterscale in the cr6Bands
    * numbering (1/7/10/13 = EBA refs 0010/0070/0100/0130): the published
    * scale is HIERARCHICAL, not a partition — each parent repeats its
    * span as the finer sub-breakdown on the rows below it, so a parent
    * row overlaps its children and equals their sum (reference
    * `reporting/corep/pd_scale.py:1-25`, `templates.py`
    * C08_03_PD_PARENT_REFS; EBA v09753-v09756). */
  private[queries] val c0803ParentRefs = Set(1, 7, 10, 13)

  /** q144: COREP C 08.03 — the IRB book over the fixed regulatory PD
    * masterscale (reference `reporting/corep/pd_scale.py` banded_rows +
    * `c08.py` _c08_03_cells; Reg (EU) 2021/451 Annex I C 08.03, PRA
    * PS1/26 Annex II §3.3.5). Where q128 breaks each class down the 13
    * LEAF bands, this sheet renders the full published 17-row
    * hierarchical axis portfolio-wide: an exposure sits in exactly one
    * leaf band but ALSO rolls into its enclosing parent band, so no
    * single label column keys every row — the reference derives a leaf
    * and a parent label per exposure (`PD_LEAF_COL`/`PD_PARENT_COL`) and
    * keys each row on one of the two. Here the same two when-chain
    * assignments feed an explode into (leaf, parent?) row memberships —
    * ≤2 rows per exposure — so ONE groupBy shuffle aggregates every row
    * of the hierarchy, and the distinct-obligor cell (Annex II col 0060)
    * stays exact on parent rows where child counts cannot be summed.
    * Rows allocate on the PRE-input-floor... in this rulebook's
    * vocabulary the CRR-floored allocation PD (q128's discipline:
    * half-open [lo, hi), defaulted rows forced to the 100% band); cols
    * follow the reference surface: per-side gross carriers (on-BS drawn
    * / off-BS undrawn), the off-BS-gross-weighted CCF, EAD, EAD-weighted
    * PD/LGD/maturity, distinct obligors, RWEA + density, EL. Rows stay
    * SPARSE (only populated bands emit; a populated leaf always
    * populates its parent). The parent = Σ(children) cross-cell rule
    * (v09753-v09756) is pinned in Corep08Spec — the explode aggregates
    * parents INDEPENDENTLY of their leaves, so the tie-out is a real
    * check, not true by construction.
    */
  val q144CorepC0803 = QueryDef(
    "q144_corep_c0803",
    (s, dir) => {
      import s.implicits._
      val axis = Pillar3.cr6Bands.filter(_._1 != 18)
      val leaves = axis.filter(t => leafRefs(t._1))
      val parents = axis.filter(t => c0803ParentRefs(t._1))
      def bandChain(bands: Seq[(Int, String, Double, Double)]): Column =
        bands.foldLeft(Option.empty[Column]) {
          case (None, (r, _, lo, hi)) =>
            Some(when(col("alloc_pd") >= lo && col("alloc_pd") < hi, r))
          case (Some(acc), (r, _, lo, hi)) =>
            Some(acc.when(col("alloc_pd") >= lo && col("alloc_pd") < hi, r))
        }.get.otherwise(lit(null).cast("int"))
      val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
      val banded = DomainPipeline.ledger(s, dir)
        .filter(col("approach") === "IRB")
        .withColumn("k", k)
        .withColumn("pd_floored",
          greatest(lit(0.0001) + (col("k") % 997).cast("double") * lit(0.001),
            lit(0.0003)))
        .withColumn("lgd_floored",
          greatest((col("k") % 60).cast("double") * lit(0.01), lit(0.05)))
        .withColumn("alloc_pd",
          when(col("is_defaulted"), lit(1.0)).otherwise(col("pd_floored")))
        .withColumn("leaf_ref", bandChain(leaves))
        .withColumn("parent_ref", bandChain(parents))
        .withColumn("row_ref",
          explode(filter(array(col("leaf_ref"), col("parent_ref")),
            x => x.isNotNull)))
      val agg = banded.groupBy(col("row_ref")).agg(
        count(lit(1)).as("n_exposures"),
        countDistinct(col("counterparty_reference")).as("n_obligors"),
        dsum(col("drawn_base"), 2).as("gross_on_bs"),
        dsum(col("undrawn_base"), 2).as("gross_off_bs"),
        dsum(q2(col("ccf_eff") * col("undrawn_base")), 2).as("ccf_num"),
        dsum(col("ead_pre_crm"), 2).as("ead"),
        dsum(q2(col("pd_floored") * col("ead_pre_crm")), 2).as("pd_num"),
        dsum(q2(col("lgd_floored") * col("ead_pre_crm")), 2).as("lgd_num"),
        dsum(q2(col("maturity_years") * col("ead_pre_crm")), 2).as("mat_num"),
        dsum(col("rwa"), 2).as("rwea"),
        dsum(q2(col("pd_floored") * col("lgd_floored") * col("ead_pre_crm")), 2)
          .as("expected_loss"))
      val labels = broadcast(axis.map(t => (t._1, t._2, c0803ParentRefs(t._1)))
        .toDF("row_ref", "pd_range", "is_parent"))
      agg.join(labels, Seq("row_ref"))
        .select(
          col("row_ref"), col("pd_range"), col("is_parent"),
          col("n_exposures"), col("n_obligors"),
          col("gross_on_bs"), col("gross_off_bs"),
          when(col("gross_off_bs") > 0,
            q6(col("ccf_num") / col("gross_off_bs"))).as("avg_ccf"),
          col("ead"),
          when(col("ead") > 0, q6(col("pd_num") / col("ead") * 100))
            .as("ead_w_pd_pct"),
          when(col("ead") > 0, q6(col("lgd_num") / col("ead") * 100))
            .as("ead_w_lgd_pct"),
          when(col("ead") > 0, q6(col("mat_num") / col("ead")))
            .as("ead_w_maturity_y"),
          col("rwea"),
          when(col("ead") > 0, q6(col("rwea") / col("ead"))).as("rwa_density"),
          col("expected_loss"))
        .orderBy(col("row_ref"))
    },
    Some {
      def bandCase(bands: Seq[(Int, String, Double, Double)]): String =
        bands.map { case (r, _, lo, hi) =>
          s"WHEN alloc_pd >= ${d(lo)} AND alloc_pd < ${d(hi)} THEN $r" }
          .mkString("CASE ", " ", " ELSE NULL END")
      val axis = Pillar3.cr6Bands.filter(_._1 != 18)
      val leafCase = bandCase(axis.filter(t => leafRefs(t._1)))
      val parentCase = bandCase(axis.filter(t => c0803ParentRefs(t._1)))
      val axisValues = axis
        .map(t => s"(${t._1}, '${t._2}', ${c0803ParentRefs(t._1)})")
        .mkString(", ")
      s"""
      WITH ${Domain.domainLedgerCtes},
      c0803irb AS (
        SELECT counterparty_reference, drawn_base, undrawn_base, ccf_eff,
               ead_pre_crm, rwa, is_defaulted,
               -- the pipeline stamps maturity_years = 1.0 + o_orderkey % 5 on
               -- both exposure legs; the ledger CTE chain does not carry it,
               -- so re-derive it from the key (= o_orderkey for ORD-/FAC-)
               1.0 + (CAST(substr(exposure_reference, 5) AS BIGINT) % 5)
                 AS maturity_years,
               greatest(0.0001 + (CAST(substr(exposure_reference, 5) AS BIGINT)
                 % 997) * 0.001, 0.0003) AS pd_floored,
               greatest((CAST(substr(exposure_reference, 5) AS BIGINT) % 60)
                 * 0.01, 0.05) AS lgd_floored
        FROM final WHERE approach = 'IRB'),
      c0803alloc AS (
        SELECT *, CASE WHEN is_defaulted THEN 1.0 ELSE pd_floored END
                    AS alloc_pd
        FROM c0803irb),
      c0803keyed AS (
        SELECT *, $leafCase AS leaf_ref, $parentCase AS parent_ref
        FROM c0803alloc),
      c0803x AS (
        SELECT *, leaf_ref AS row_ref FROM c0803keyed
        UNION ALL
        SELECT *, parent_ref AS row_ref FROM c0803keyed
        WHERE parent_ref IS NOT NULL),
      c0803rolled AS (
        SELECT row_ref,
               count(*) AS n_exposures,
               count(DISTINCT counterparty_reference) AS n_obligors,
               ${sqlDsum("drawn_base", 2)} AS gross_on_bs,
               ${sqlDsum("undrawn_base", 2)} AS gross_off_bs,
               ${sqlDsum(sql2("ccf_eff * undrawn_base"), 2)} AS ccf_num,
               ${sqlDsum("ead_pre_crm", 2)} AS ead,
               ${sqlDsum(sql2("pd_floored * ead_pre_crm"), 2)} AS pd_num,
               ${sqlDsum(sql2("lgd_floored * ead_pre_crm"), 2)} AS lgd_num,
               ${sqlDsum(sql2("maturity_years * ead_pre_crm"), 2)} AS mat_num,
               ${sqlDsum("rwa", 2)} AS rwea,
               ${sqlDsum(sql2("pd_floored * lgd_floored * ead_pre_crm"), 2)}
                 AS expected_loss
        FROM c0803x
        GROUP BY row_ref),
      c0803axis(row_ref, pd_range, is_parent) AS (VALUES $axisValues)
      SELECT r.row_ref, a.pd_range, a.is_parent,
             r.n_exposures, r.n_obligors,
             r.gross_on_bs, r.gross_off_bs,
             CASE WHEN r.gross_off_bs > 0
                  THEN ${sql6("r.ccf_num / r.gross_off_bs")} END AS avg_ccf,
             r.ead,
             CASE WHEN r.ead > 0
                  THEN ${sql6("r.pd_num / r.ead * 100")} END AS ead_w_pd_pct,
             CASE WHEN r.ead > 0
                  THEN ${sql6("r.lgd_num / r.ead * 100")} END AS ead_w_lgd_pct,
             CASE WHEN r.ead > 0
                  THEN ${sql6("r.mat_num / r.ead")} END AS ead_w_maturity_y,
             r.rwea,
             CASE WHEN r.ead > 0
                  THEN ${sql6("r.rwea / r.ead")} END AS rwa_density,
             r.expected_loss
      FROM c0803rolled r JOIN c0803axis a ON a.row_ref = r.row_ref
      ORDER BY r.row_ref
    """.stripMargin.trim
    })

  // ---- C 02.00 — own funds requirements, the master roll-up ----------
  //      (reference `reporting/corep/c02.py`;
  //       `templates.py` CRR_C02_00_ROW_SECTIONS / C02_00_SA_CLASS_MAP)

  /** The C 02.00 row grid in this rulebook's vocabulary:
    * (row_ref, item, wide-column name or a literal CAST). The reference's
    * recorded row disciplines carried over exactly:
    *
    *  - rows 0010/0050 are FLAT sums — Art. 92 is untouched by the
    *    substitution keying (`c02.py:242-246`);
    *  - row 0060 admits the SA-CCR business next to ledger-SA (`c02.py`
    *    `_SA_APPROACHES`, recorded fix 2026-07-12: Annex II defines the
    *    SA child against C 07.00, which reports CCR rows);
    *  - the SA class rows 0070-0211 route through the many-to-one
    *    ACCUMULATING class map (`templates.py` C02_00_SA_CLASS_MAP:
    *    corporate AND sme_corporate both land on 0130) on the
    *    POST-SUBSTITUTION basis — the guaranteed leg discloses on the
    *    guarantor's row 0120, tying the rows to C 07.00 / C 08.01
    *    (q94/q121) rather than the origination class;
    *  - rows in the credit-risk set with no population in this
    *    vocabulary ZERO-fill; the other-risk-type rows this engine does
    *    not compute (market, operational, fixed overheads,
    *    securitisation) NULL-fill — zero is a computed claim, null is
    *    "out of scope" (`c02.py` C02_00_CREDIT_RISK_ROWS note);
    *  - the whole IRB book of this rulebook is FOUNDATION (supervisory
    *    LGD), so row 0240 mirrors 0220 and the A-IRB block zero-fills —
    *    the reference's `_irb_*_split` fallback discipline ("with no
    *    sub-row data the whole total lands in one bucket").
    */
  private val c02Rows: Seq[(String, String, String)] = {
    val zero = "CAST(0.0 AS DOUBLE)"
    val nul = "CAST(NULL AS DOUBLE)"
    Seq(
      ("0010", "total_risk_exposure_amount", "tot"),
      ("0040", "total_own_funds_requirements", "ofr"),
      ("0050", "credit_ccr_dilution_risk", "cr0050"),
      ("0060", "of_which_standardised", "sa0060"),
      ("0070", "sa_central_govts_central_banks", "sa_sov"),
      ("0080", "sa_rgla", zero),
      ("0090", "sa_pse", zero),
      ("0100", "sa_mdb", zero),
      ("0110", "sa_international_org", zero),
      ("0120", "sa_institutions", "sa_inst"),
      ("0130", "sa_corporates", "sa_corp"),
      ("0140", "sa_retail", "sa_ret"),
      ("0150", "sa_secured_immovable_property", zero),
      ("0160", "sa_in_default", zero),
      ("0170", "sa_higher_risk", zero),
      ("0180", "sa_covered_bonds", zero),
      ("0190", "sa_short_term_assessment", zero),
      ("0200", "sa_ciu", zero),
      ("0210", "sa_equity", zero),
      ("0211", "sa_other_items", zero),
      ("0220", "of_which_irb", "irb_flat"),
      ("0240", "of_which_foundation_irb", "irb_flat"),
      ("0250", "firb_institutions", "irb_inst"),
      ("0260", "firb_corporates", "irb_corp"),
      ("0300", "of_which_advanced_irb", zero),
      ("0310", "airb_central_govts", zero),
      ("0330", "airb_institutions", zero),
      ("0340", "airb_corporates", zero),
      ("0370", "airb_retail", zero),
      ("0380", "airb_retail_immovable_property", zero),
      ("0390", "airb_retail_qrre", zero),
      ("0400", "airb_retail_other_sme", zero),
      ("0410", "supervisory_slotting", zero),
      ("0420", "equity_irb", zero),
      ("0430", "settlement_risk", "settle_rwea"),
      ("0440", "securitisation_banking_book", nul),
      ("0460", "market_risk", nul),
      ("0590", "cva", "cva_rwea"),
      ("0640", "operational_risk", nul),
      ("0680", "fixed_overheads", nul))
  }

  /** q140: COREP C 02.00 — own funds requirements, the master capital
    * roll-up (reference `reporting/corep/c02.py`, the recorded "Kind-9"
    * pre-pass template; CRR Art. 92). One row per Annex II row ref with
    * the RWEA under BOTH frameworks (`rwea_crr` off `rwa`, `rwea_b31`
    * off `rwa_b31` — the CCR/CVA/settlement books carry no regime delta,
    * the q130 OV1 rule).
    *
    * CLASS-ROW BASIS: the per-class values are the SME-factored
    * substitution legs — collateral at the flat weight and the
    * unsecured remainder stay on the obligor's class, the guaranteed
    * leg moves to the guarantor's institution row (0120 SA / 0250 IRB),
    * each leg scaled by the row's `sf_factor` so the class rows re-sum
    * to the flat approach totals within leg-rounding cents. Composition,
    * not duplication: the non-ledger components are the existing battery
    * queries (q56/q105/q96/q97) reduced to scalars, so row 0010 ties to
    * q130 OV1's Total row by construction, and 0010 = 0050 + 0430 + 0590
    * exactly (Pillar3Spec pins both).
    *
    * Scale shape: ONE conditional aggregation over the persisted ledger
    * produces every ledger measure; each component aggregates to a 1-row
    * frame before its broadcast cross-join; totals are horizontal
    * decimal sums on the single wide row; the 40-row grid stacks out of
    * that row with zero further shuffles.
    */
  val q140CorepC02 = QueryDef(
    "q140_corep_c02",
    (s, dir) => {
      val led = DomainPipeline.ledger(s, dir)
        .withColumn("og_leg", q2(
          (q2(col("coll_covered") * lit(collRw)) +
            q2(col("unsecured") * col("own_rw"))) * col("sf_factor")))
        .withColumn("og_leg_b31", q2(
          (q2(col("coll_covered") * lit(collRw)) +
            q2(col("unsecured") * col("own_rw_b31"))) * col("sf_factor")))
        .withColumn("gi_leg", q2(
          q2(col("guar_covered") *
            least(col("own_rw"), coalesce(col("guarantor_rw"), col("own_rw"))))
            * col("sf_factor")))
        .withColumn("gi_leg_b31", q2(
          q2(col("guar_covered") *
            least(col("own_rw_b31"),
              coalesce(col("guarantor_rw"), col("own_rw_b31"))))
            * col("sf_factor")))
      def m(app: String, clsSet: Seq[String], leg: String): Column =
        dsum(when(col("approach") === app &&
          col("exposure_class").isin(clsSet: _*), col(leg)).otherwise(0.0), 2)
      def inflow(app: String, leg: String): Column =
        dsum(when(col("approach") === app, col(leg)).otherwise(0.0), 2)
      val agg = led.agg(
        dsum(when(col("approach") === "SA", col("rwa")).otherwise(0.0), 2)
          .as("sa_flat"),
        dsum(when(col("approach") === "SA", col("rwa_b31")).otherwise(0.0), 2)
          .as("sa_flat_b31"),
        dsum(when(col("approach") === "IRB", col("rwa")).otherwise(0.0), 2)
          .as("irb_flat"),
        dsum(when(col("approach") === "IRB", col("rwa_b31")).otherwise(0.0), 2)
          .as("irb_flat_b31"),
        m("SA", Seq("sovereign"), "og_leg").as("sa_sov"),
        m("SA", Seq("sovereign"), "og_leg_b31").as("sa_sov_b31"),
        m("SA", Seq("institution"), "og_leg").as("sa_inst_og"),
        m("SA", Seq("institution"), "og_leg_b31").as("sa_inst_og_b31"),
        m("SA", Seq("corporate", "sme_corporate"), "og_leg").as("sa_corp"),
        m("SA", Seq("corporate", "sme_corporate"), "og_leg_b31")
          .as("sa_corp_b31"),
        m("SA", Seq("retail"), "og_leg").as("sa_ret"),
        m("SA", Seq("retail"), "og_leg_b31").as("sa_ret_b31"),
        inflow("SA", "gi_leg").as("sa_inf"),
        inflow("SA", "gi_leg_b31").as("sa_inf_b31"),
        m("IRB", Seq("institution"), "og_leg").as("irb_inst_og"),
        m("IRB", Seq("institution"), "og_leg_b31").as("irb_inst_og_b31"),
        m("IRB", Seq("corporate", "sme_corporate"), "og_leg").as("irb_corp"),
        m("IRB", Seq("corporate", "sme_corporate"), "og_leg_b31")
          .as("irb_corp_b31"),
        inflow("IRB", "gi_leg").as("irb_inf"),
        inflow("IRB", "gi_leg_b31").as("irb_inf_b31"))
      val ccr = Ccr.q56SaCcrAddon.build(s, dir)
        .agg(dsum(q2(col("ns_addon") * 1.4), 2).as("ccr_rwea"))
      val dfund = Ccr.q105DefaultFund.build(s, dir)
        .agg(dsum(col("total_rwea"), 2).as("dfund_rwea"))
      val cva = Ccr.q96BaCva.build(s, dir)
        .select(col("cva_rwa").as("cva_rwea"))
      val settle = Ccr.q97FailedTrades.build(s, dir)
        .agg(dsum(col("total_rwa"), 4).as("settle_rwea"))
      def h2(cols: Seq[String]): Column =
        cols.map(c => col(c).cast(DecimalType(38, 4))).reduce(_ + _)
          .cast("double")
      val wide = agg
        .crossJoin(broadcast(ccr)).crossJoin(broadcast(dfund))
        .crossJoin(broadcast(cva)).crossJoin(broadcast(settle))
        .withColumn("tot", h2(Seq(
          "sa_flat", "irb_flat", "ccr_rwea", "dfund_rwea", "cva_rwea",
          "settle_rwea")))
        .withColumn("tot_b31", h2(Seq(
          "sa_flat_b31", "irb_flat_b31", "ccr_rwea", "dfund_rwea",
          "cva_rwea", "settle_rwea")))
        .withColumn("ofr", q2(col("tot") * 0.08))
        .withColumn("ofr_b31", q2(col("tot_b31") * 0.08))
        .withColumn("cr0050",
          h2(Seq("sa_flat", "irb_flat", "ccr_rwea", "dfund_rwea")))
        .withColumn("cr0050_b31",
          h2(Seq("sa_flat_b31", "irb_flat_b31", "ccr_rwea", "dfund_rwea")))
        .withColumn("sa0060", h2(Seq("sa_flat", "ccr_rwea", "dfund_rwea")))
        .withColumn("sa0060_b31",
          h2(Seq("sa_flat_b31", "ccr_rwea", "dfund_rwea")))
        .withColumn("sa_inst", h2(Seq("sa_inst_og", "sa_inf")))
        .withColumn("sa_inst_b31", h2(Seq("sa_inst_og_b31", "sa_inf_b31")))
        .withColumn("irb_inst", h2(Seq("irb_inst_og", "irb_inf")))
        .withColumn("irb_inst_b31", h2(Seq("irb_inst_og_b31", "irb_inf_b31")))
      val stackArgs = c02Rows.map { case (ref, item, e) =>
        val b31 = e match {
          case lit if lit.startsWith("CAST(") => lit
          case "settle_rwea" | "cva_rwea" => e
          case c => s"${c}_b31"
        }
        s"'$ref', '$item', $e, $b31"
      }.mkString(",\n             ")
      wide.selectExpr(
        s"""stack(${c02Rows.size},
             $stackArgs)
           AS (row_ref, item, rwea_crr, rwea_b31)""")
        .orderBy(col("row_ref"))
    },
    Some {
      val rowSelects = c02Rows.map { case (ref, item, e) =>
        val b31 = e match {
          case lit if lit.startsWith("CAST(") => lit
          case "settle_rwea" | "cva_rwea" => e
          case c => s"${c}_b31"
        }
        s"SELECT '$ref' AS row_ref, '$item' AS item, $e AS rwea_crr, $b31 AS rwea_b31 FROM wide"
      }.mkString("\n        UNION ALL ")
      val ogLeg = sql2(s"(${sql2(s"coll_covered * ${d(collRw)}")} + " +
        s"${sql2("unsecured * own_rw")}) * sf_factor")
      val ogLegB31 = sql2(s"(${sql2(s"coll_covered * ${d(collRw)}")} + " +
        s"${sql2("unsecured * own_rw_b31")}) * sf_factor")
      val giLeg = sql2(s"${sql2(
        "guar_covered * least(own_rw, coalesce(guarantor_rw, own_rw))")}" +
        " * sf_factor")
      val giLegB31 = sql2(s"${sql2(
        "guar_covered * least(own_rw_b31, coalesce(guarantor_rw, own_rw_b31))")}" +
        " * sf_factor")
      def msql(app: String, clsIn: String, leg: String): String =
        sqlDsum(s"CASE WHEN approach = '$app' AND exposure_class IN ($clsIn)" +
          s" THEN $leg ELSE 0.0 END", 2)
      def inflowSql(app: String, leg: String): String =
        sqlDsum(s"CASE WHEN approach = '$app' THEN $leg ELSE 0.0 END", 2)
      val h2 = (cols: Seq[String]) =>
        "CAST(" + cols.map(c => s"CAST($c AS DECIMAL(38,4))").mkString(" + ") +
          " AS DOUBLE)"
      val corpIn = "'corporate', 'sme_corporate'"
      s"""
      WITH ${Domain.domainLedgerCtes},
      legs AS (
        SELECT *, $ogLeg AS og_leg, $ogLegB31 AS og_leg_b31,
               $giLeg AS gi_leg, $giLegB31 AS gi_leg_b31
        FROM final),
      agg AS MATERIALIZED (
        SELECT
          ${sqlDsum("CASE WHEN approach = 'SA' THEN rwa ELSE 0.0 END", 2)}
            AS sa_flat,
          ${sqlDsum("CASE WHEN approach = 'SA' THEN rwa_b31 ELSE 0.0 END", 2)}
            AS sa_flat_b31,
          ${sqlDsum("CASE WHEN approach = 'IRB' THEN rwa ELSE 0.0 END", 2)}
            AS irb_flat,
          ${sqlDsum("CASE WHEN approach = 'IRB' THEN rwa_b31 ELSE 0.0 END", 2)}
            AS irb_flat_b31,
          ${msql("SA", "'sovereign'", "og_leg")} AS sa_sov,
          ${msql("SA", "'sovereign'", "og_leg_b31")} AS sa_sov_b31,
          ${msql("SA", "'institution'", "og_leg")} AS sa_inst_og,
          ${msql("SA", "'institution'", "og_leg_b31")} AS sa_inst_og_b31,
          ${msql("SA", corpIn, "og_leg")} AS sa_corp,
          ${msql("SA", corpIn, "og_leg_b31")} AS sa_corp_b31,
          ${msql("SA", "'retail'", "og_leg")} AS sa_ret,
          ${msql("SA", "'retail'", "og_leg_b31")} AS sa_ret_b31,
          ${inflowSql("SA", "gi_leg")} AS sa_inf,
          ${inflowSql("SA", "gi_leg_b31")} AS sa_inf_b31,
          ${msql("IRB", "'institution'", "og_leg")} AS irb_inst_og,
          ${msql("IRB", "'institution'", "og_leg_b31")} AS irb_inst_og_b31,
          ${msql("IRB", corpIn, "og_leg")} AS irb_corp,
          ${msql("IRB", corpIn, "og_leg_b31")} AS irb_corp_b31,
          ${inflowSql("IRB", "gi_leg")} AS irb_inf,
          ${inflowSql("IRB", "gi_leg_b31")} AS irb_inf_b31
        FROM legs),
      ccr AS (
        SELECT ${sqlDsum(sql2("ns_addon * 1.4"), 2)} AS ccr_rwea
        FROM (${Ccr.q56SaCcrAddon.oracle.get}) t),
      dfund AS (
        SELECT ${sqlDsum("total_rwea", 2)} AS dfund_rwea
        FROM (${Ccr.q105DefaultFund.oracle.get}) t),
      cva AS (
        SELECT cva_rwa AS cva_rwea
        FROM (${Ccr.q96BaCva.oracle.get}) t),
      settle AS (
        SELECT ${sqlDsum("total_rwa", 4)} AS settle_rwea
        FROM (${Ccr.q97FailedTrades.oracle.get}) t),
      wide AS MATERIALIZED (
        SELECT *,
          ${h2(Seq("sa_flat", "irb_flat", "ccr_rwea", "dfund_rwea",
            "cva_rwea", "settle_rwea"))} AS tot,
          ${h2(Seq("sa_flat_b31", "irb_flat_b31", "ccr_rwea", "dfund_rwea",
            "cva_rwea", "settle_rwea"))} AS tot_b31,
          ${h2(Seq("sa_flat", "irb_flat", "ccr_rwea", "dfund_rwea"))}
            AS cr0050,
          ${h2(Seq("sa_flat_b31", "irb_flat_b31", "ccr_rwea", "dfund_rwea"))}
            AS cr0050_b31,
          ${h2(Seq("sa_flat", "ccr_rwea", "dfund_rwea"))} AS sa0060,
          ${h2(Seq("sa_flat_b31", "ccr_rwea", "dfund_rwea"))} AS sa0060_b31,
          ${h2(Seq("sa_inst_og", "sa_inf"))} AS sa_inst,
          ${h2(Seq("sa_inst_og_b31", "sa_inf_b31"))} AS sa_inst_b31,
          ${h2(Seq("irb_inst_og", "irb_inf"))} AS irb_inst,
          ${h2(Seq("irb_inst_og_b31", "irb_inf_b31"))} AS irb_inst_b31
        FROM agg, ccr, dfund, cva, settle),
      wide2 AS (
        SELECT *, ${sql2("tot * 0.08")} AS ofr,
               ${sql2("tot_b31 * 0.08")} AS ofr_b31
        FROM wide),
      sheet AS (
        ${rowSelects.replace("FROM wide", "FROM wide2")})
      SELECT row_ref, item, rwea_crr, rwea_b31
      FROM sheet
      ORDER BY row_ref
      """.stripMargin.trim
    })

  /** q148: COREP C 08.05 — IRB PD back-testing per exposure class over
    * the same hierarchical PD masterscale as C 08.03 (reference
    * `c08.py` _c08_05_cells — "the sparse PD-range pair"; Reg (EU)
    * 2021/451 Annex I C 08.05). Where CR9 (q145) keys sheets on the
    * Annex XXII leaf taxonomy, C 08.05 keys on the sealed exposure
    * class itself, and its column surface is the back-testing core: col
    * 0010 the arithmetic-mean report PD (the reference's
    * WeightedAvg-by-one), 0020 the obligor count (distinct — no
    * prior-year carrier, the recorded proxy), 0030 the defaulted
    * obligor count, 0040 the observed rate (0030/0020 × 100, an
    * intra-row Formula), 0050 the copy-of-0040 fallback (no historical
    * series carrier). Rows stay sparse over the leaf+parent explode
    * (q144's shape — no Total row on this template; `banded_rows` emits
    * populated bands only). Same one-shuffle scale posture as q144. */
  val q148CorepC0805 = QueryDef(
    "q148_corep_c0805",
    (s, dir) => {
      import s.implicits._
      val axis = Pillar3.cr6Bands.filter(_._1 != 18)
      val leaves = axis.filter(t => leafRefs(t._1))
      val parents = axis.filter(t => c0803ParentRefs(t._1))
      def bandChain(bands: Seq[(Int, String, Double, Double)]): Column =
        bands.foldLeft(Option.empty[Column]) {
          case (None, (r, _, lo, hi)) =>
            Some(when(col("alloc_pd") >= lo && col("alloc_pd") < hi, r))
          case (Some(acc), (r, _, lo, hi)) =>
            Some(acc.when(col("alloc_pd") >= lo && col("alloc_pd") < hi, r))
        }.get.otherwise(lit(null).cast("int"))
      val k = expr("CAST(substring(exposure_reference, 5) AS BIGINT)")
      val banded = DomainPipeline.ledger(s, dir)
        .filter(col("approach") === "IRB")
        .withColumn("k", k)
        .withColumn("pd_floored",
          greatest(lit(0.0001) + (col("k") % 997).cast("double") * lit(0.001),
            lit(0.0003)))
        .withColumn("alloc_pd",
          when(col("is_defaulted"), lit(1.0)).otherwise(col("pd_floored")))
        .withColumn("leaf_ref", bandChain(leaves))
        .withColumn("parent_ref", bandChain(parents))
        .withColumn("row_ref",
          explode(filter(array(col("leaf_ref"), col("parent_ref")),
            x => x.isNotNull)))
      val agg = banded.groupBy(col("exposure_class"), col("row_ref")).agg(
        count(lit(1)).as("n_exposures"),
        countDistinct(col("counterparty_reference")).as("n_obligors"),
        countDistinct(when(col("is_defaulted"), col("counterparty_reference")))
          .as("n_defaulted_obligors"),
        dsum(col("pd_floored"), 6).as("pd_sum"))
      val labels = broadcast(axis.map(t => (t._1, t._2))
        .toDF("row_ref", "pd_range"))
      agg.join(labels, Seq("row_ref"))
        .select(
          col("exposure_class"), col("row_ref"), col("pd_range"),
          q6(col("pd_sum") / col("n_exposures") * 100).as("mean_pd_pct"),
          col("n_obligors"), col("n_defaulted_obligors"),
          q6(col("n_defaulted_obligors").cast("double") /
            col("n_obligors").cast("double") * 100).as("observed_rate_pct"))
        .withColumn("hist_rate_pct", col("observed_rate_pct"))
        .orderBy(col("exposure_class"), col("row_ref"))
    },
    Some {
      def bandCase(bands: Seq[(Int, String, Double, Double)]): String =
        bands.map { case (r, _, lo, hi) =>
          s"WHEN alloc_pd >= ${d(lo)} AND alloc_pd < ${d(hi)} THEN $r" }
          .mkString("CASE ", " ", " ELSE NULL END")
      val axis = Pillar3.cr6Bands.filter(_._1 != 18)
      val leafCase = bandCase(axis.filter(t => leafRefs(t._1)))
      val parentCase = bandCase(axis.filter(t => c0803ParentRefs(t._1)))
      val axisValues = axis.map(t => s"(${t._1}, '${t._2}')").mkString(", ")
      s"""
      WITH ${Domain.domainLedgerCtes},
      c0805irb AS (
        SELECT exposure_class, counterparty_reference, is_defaulted,
               greatest(0.0001 + (CAST(substr(exposure_reference, 5) AS BIGINT)
                 % 997) * 0.001, 0.0003) AS pd_floored
        FROM final WHERE approach = 'IRB'),
      c0805alloc AS (
        SELECT *, CASE WHEN is_defaulted THEN 1.0 ELSE pd_floored END
                    AS alloc_pd
        FROM c0805irb),
      c0805keyed AS (
        SELECT *, $leafCase AS leaf_ref, $parentCase AS parent_ref
        FROM c0805alloc),
      c0805x AS (
        SELECT *, leaf_ref AS row_ref FROM c0805keyed
        UNION ALL
        SELECT *, parent_ref FROM c0805keyed WHERE parent_ref IS NOT NULL),
      c0805rolled AS (
        SELECT exposure_class, row_ref,
               count(*) AS n_exposures,
               count(DISTINCT counterparty_reference) AS n_obligors,
               count(DISTINCT CASE WHEN is_defaulted
                 THEN counterparty_reference END) AS n_defaulted_obligors,
               ${sqlDsum("pd_floored", 6)} AS pd_sum
        FROM c0805x GROUP BY 1, 2),
      c0805axis(row_ref, pd_range) AS (VALUES $axisValues)
      SELECT r.exposure_class, r.row_ref, a.pd_range,
             ${sql6("r.pd_sum / r.n_exposures * 100")} AS mean_pd_pct,
             r.n_obligors, r.n_defaulted_obligors,
             ${sql6("CAST(r.n_defaulted_obligors AS DOUBLE) / CAST(r.n_obligors AS DOUBLE) * 100")}
               AS observed_rate_pct,
             ${sql6("CAST(r.n_defaulted_obligors AS DOUBLE) / CAST(r.n_obligors AS DOUBLE) * 100")}
               AS hist_rate_pct
      FROM c0805rolled r JOIN c0805axis a ON a.row_ref = r.row_ref
      ORDER BY r.exposure_class, r.row_ref
      """.stripMargin.trim
    })

  /** q149: COREP C 08.07 — IRB scope of use (reference
    * `reporting/corep/c08_07.py`; CRR Art. 143/148/150, COREP Annex II
    * §3.3.6). The recorded population decision carried over exactly:
    * the population is the FULL book (SA enters every denominator), the
    * sheet keys the RAW exposure class (the one COREP sheet deliberately
    * not retargeted to the applied ladder), and cols 0030/0040/0050 are
    * DPM FRACTIONS, not 0-100 percentages. Col 0040 (% under a roll-out
    * plan) needs the optional `is_under_irb_rollout` input column this
    * vocabulary lacks — the reference's recorded degradation: the slice
    * is empty, 0040 = 0.0 and 0030 (permanent partial use) keeps the
    * WHOLE SA share, preserving 0030 + 0040 = the SA fraction. One
    * ROLLUP shuffle produces the class rows and the whole-population
    * Total (CRR row 0170 semantics). */
  val q149CorepC0807 = QueryDef(
    "q149_corep_c0807",
    (s, dir) => {
      val led = DomainPipeline.ledger(s, dir)
      led.rollup(col("exposure_class"))
        .agg(
          count(lit(1)).as("n_exposures"),
          dsum(when(col("approach") === "IRB", col("ead_pre_crm"))
            .otherwise(0.0), 2).as("ead_irb"),
          dsum(col("ead_pre_crm"), 2).as("ead_total"))
        .select(
          coalesce(col("exposure_class"), lit("TOTAL")).as("exposure_class"),
          col("n_exposures"), col("ead_irb"), col("ead_total"),
          when(col("ead_total") > 0,
            q6((col("ead_total") - col("ead_irb")) / col("ead_total")))
            .as("pct_ppu_sa"),
          lit(0.0).as("pct_rollout"),
          when(col("ead_total") > 0, q6(col("ead_irb") / col("ead_total")))
            .as("pct_irb"))
        .orderBy(col("exposure_class"))
    },
    Some(s"""
      WITH ${Domain.domainLedgerCtes},
      c0807 AS (
        SELECT exposure_class,
               count(*) AS n_exposures,
               ${sqlDsum("CASE WHEN approach = 'IRB' THEN ead_pre_crm ELSE 0.0 END", 2)}
                 AS ead_irb,
               ${sqlDsum("ead_pre_crm", 2)} AS ead_total
        FROM final
        GROUP BY ROLLUP(exposure_class))
      SELECT coalesce(exposure_class, 'TOTAL') AS exposure_class,
             n_exposures, ead_irb, ead_total,
             CASE WHEN ead_total > 0
                  THEN ${sql6("(ead_total - ead_irb) / ead_total")} END
               AS pct_ppu_sa,
             CAST(0.0 AS DOUBLE) AS pct_rollout,
             CASE WHEN ead_total > 0
                  THEN ${sql6("ead_irb / ead_total")} END AS pct_irb
      FROM c0807
      ORDER BY exposure_class
    """.stripMargin.trim))

  /** The C 02.00 catalogue slice (same EBA v3.0(3.0.1) extract as q94's):
    * the master-roll-up identities bindable to q140's row grid, ids +
    * severities preserved, evaluated under BOTH frameworks (each rule
    * instanced per rwea column — the catalogue's framework scoping).
    * The published `if_value_missing: "treat as zero"` policy is applied
    * LITERALLY: the out-of-scope null rows (market 0460, securitisation
    * 0440, operational 0640, fixed overheads 0680) participate in
    * v0204_m's RHS as zeros, exactly as the EBA evaluator treats an
    * unreported cell. */
  private val c02Rules: Seq[(String, String, String, Seq[String], Seq[String], Double)] =
    Seq(
      // TREA = the sum of the risk-type blocks (Art. 92(3))
      ("v0204_m", "ERROR", "eq", Seq("0010"),
        Seq("0050", "0430", "0440", "0460", "0590", "0640", "0680"), 0.01),
      // credit risk = SA block + IRB block
      ("v0205_m", "WARNING", "eq", Seq("0050"), Seq("0060", "0220"), 0.01),
      // foundation-IRB block = its class rows
      ("v0210_m", "ERROR", "eq", Seq("0240"), Seq("0250", "0260"), 0.01)) ++
    // v3686_s: the template-wide non-negativity sweep, instanced per
    // populated row (null rows are out of scope, zero rows in scope)
    Seq("0010", "0040", "0050", "0060", "0070", "0120", "0130", "0140",
        "0220", "0240", "0250", "0260", "0430", "0590").map { ref =>
      (s"v3686_s@$ref", "ERROR", "ge", Seq(ref), Seq.empty[String], 0.0)
    }

  /** q147: the C 02.00 supervisory validation pass — the published
    * catalogue rules evaluated over q140's generated template (the
    * reference's separate `validations/evaluate.py` pass over a
    * produced sheet, not a sheet feature). ONE conditional aggregation
    * over the 40-row frame computes every rule side under both
    * frameworks; output one row per (rule, framework) with id, severity,
    * totals, diff and status. */
  val q147C02Validations = QueryDef(
    "q147_c02_validations",
    (s, dir) => {
      val t = q140CorepC02.build(s, dir)
      def side(ids: Seq[String], rweaCol: String): Column =
        if (ids.isEmpty) lit(0.0)
        else sum(when(col("row_ref").isin(ids: _*),
          coalesce(col(rweaCol), lit(0.0))).otherwise(0.0)
          .cast(DecimalType(38, 4))).cast("double")
      val aggs = c02Rules.flatMap { case (id, _, _, lhs, rhs, _) =>
        Seq("rwea_crr" -> "crr", "rwea_b31" -> "b31").flatMap {
          case (c, fw) => Seq(
            side(lhs, c).as(s"${id}__${fw}__lhs"),
            side(rhs, c).as(s"${id}__${fw}__rhs"))
        }
      }
      val row0 = t.agg(aggs.head, aggs.tail: _*)
      val stackRows = c02Rules.flatMap { case (id, sev, _, _, _, _) =>
        Seq("crr", "b31").map(fw =>
          s"'$id', '$fw', '$sev', `${id}__${fw}__lhs`, `${id}__${fw}__rhs`")
      }
      val stacked = row0.selectExpr(
        s"stack(${stackRows.size}, ${stackRows.mkString(", ")}) " +
          "AS (rule_id, framework, severity, lhs_total, rhs_total)")
      val passChain = c02Rules.foldLeft(Option.empty[Column]) {
        case (acc, (id, _, op, _, _, tol)) =>
          val cond = op match {
            case "eq" => abs(col("diff")) <= tol
            case "le" => col("diff") <= tol
            case _ => -col("diff") <= tol
          }
          acc match {
            case None => Some(when(col("rule_id") === id, cond))
            case Some(a) => Some(a.when(col("rule_id") === id, cond))
          }
      }.get.otherwise(lit(false))
      stacked
        .withColumn("diff", col("lhs_total") - col("rhs_total"))
        .withColumn("status", when(passChain, "pass").otherwise("fail"))
        .orderBy(col("rule_id"), col("framework"))
    },
    Some {
      def sideSql(ids: Seq[String], rweaCol: String): String =
        if (ids.isEmpty) "CAST(0.0 AS DOUBLE)"
        else {
          val in = ids.map(r => s"'$r'").mkString(", ")
          s"CAST(sum(CASE WHEN row_ref IN ($in) THEN CAST(coalesce($rweaCol, 0.0) AS DECIMAL(38,4)) ELSE CAST(0.0 AS DECIMAL(38,4)) END) AS DOUBLE)"
        }
      val ruleUnion = c02Rules.flatMap { case (id, sev, _, lhs, rhs, _) =>
        Seq("rwea_crr" -> "crr", "rwea_b31" -> "b31").map { case (c, fw) =>
          s"""SELECT '$id' AS rule_id, '$fw' AS framework, '$sev' AS severity,
             ${sideSql(lhs, c)} AS lhs_total,
             ${sideSql(rhs, c)} AS rhs_total
           FROM c02t"""
        }
      }.mkString("\n        UNION ALL ")
      val statusCase = c02Rules.map { case (id, _, op, _, _, tol) =>
        val cond = op match {
          case "eq" => s"abs(lhs_total - rhs_total) <= $tol"
          case "le" => s"lhs_total - rhs_total <= $tol"
          case _ => s"rhs_total - lhs_total <= $tol"
        }
        s"WHEN rule_id = '$id' THEN CASE WHEN $cond THEN 'pass' ELSE 'fail' END"
      }.mkString("CASE ", " ", " ELSE 'fail' END")
      s"""
      WITH c02t AS MATERIALIZED (${q140CorepC02.oracle.get}),
      c02vals AS (
        $ruleUnion)
      SELECT rule_id, framework, severity, lhs_total, rhs_total,
             lhs_total - rhs_total AS diff,
             $statusCase AS status
      FROM c02vals
      ORDER BY rule_id, framework
      """.stripMargin.trim
    })

  // ---- q172: COREP C 08.06 — IRB specialised lending (slotting) -------

  /** (category, is_short) → published row ref (`templates.py`
    * CRR_C08_06_ROWS; totals 0110/0120 are per-MATURITY-LEG, the
    * published v09782/v09783 row identities). */
  private val c0806RowRefs: Seq[(String, Boolean, String)] = Seq(
    ("strong", true, "0010"), ("strong", false, "0020"),
    ("good", true, "0030"), ("good", false, "0040"),
    ("satisfactory", true, "0050"), ("satisfactory", false, "0060"),
    ("weak", true, "0070"), ("weak", false, "0080"),
    ("default", true, "0090"), ("default", false, "0100"))

  /** The CR10 slotting-view derivations as shared SQL texts (EXACTLY
    * q131's hash vocabulary — C 08.06 and CR10 are two renderings of
    * one slotting result set in the reference, so the COREP grid must
    * tie to the Pillar-3 sheet cell-for-cell). */
  private val slvCat =
    "CASE WHEN is_defaulted THEN 'default' " +
      "WHEN CAST(substring(exposure_reference, 5) AS BIGINT) % 4 = 0 THEN 'strong' " +
      "WHEN CAST(substring(exposure_reference, 5) AS BIGINT) % 4 = 1 THEN 'good' " +
      "WHEN CAST(substring(exposure_reference, 5) AS BIGINT) % 4 = 2 THEN 'satisfactory' " +
      "ELSE 'weak' END"
  private val slvMat =
    "1.0 + CAST(CAST(substring(exposure_reference, 5) AS BIGINT) % 5 AS DOUBLE)"
  /** Art. 153(5) Table 1 / Art. 158(6) Table B rendered to SQL (values
    * identical to `engine/Slotting`). */
  private val slRw = Slotting.table1.map { case (c, lt, ge) =>
    s"WHEN cat = '$c' THEN (CASE WHEN is_short THEN $lt ELSE $ge END)"
  }.mkString("CASE ", " ", " ELSE 2.5 END")
  private val slEl = Slotting.elTable.map { case (c, lt, ge) =>
    s"WHEN cat = '$c' THEN (CASE WHEN is_short THEN $lt ELSE $ge END)"
  }.mkString("CASE ", " ", " ELSE 0.028 END")

  /** q172: COREP C 08.06 — the slotting template (reference
    * `reporting/corep/templates.py` CRR_C08_06_ROWS/COLUMNS; CRR
    * Art. 153(5) Table 1, Art. 158(6)): the CR10 slotting view — the
    * IRB corporate slice under q131's category/maturity vocabulary —
    * banded category × residual-maturity leg onto the published 12-row
    * grid. Columns follow the CRR surface: original exposure (0010),
    * exposure after CRM substitution (0020 — CRM substitution does not
    * reach the slotting view, which prices the obligor's own book, so
    * it equals 0010 and the published monotonicities v09784-86 hold as
    * written), of-which off-BS original (0030), exposure value (0040 =
    * the ledger's post-CCF EAD — ties CR10's exposure_value column),
    * of-which off-BS EV (0050 = EAD − drawn, the CCF-weighted undrawn
    * leg), CCR leg (0060 — zero, no derivatives in this book), the
    * row's Table-1 risk weight (0070, null on total rows), RWEA (0080 —
    * ties CR10's rwea cell-for-cell) and the Art. 158(6) expected loss
    * (0090). The reference renders one sheet per SL TYPE; this frame
    * renders the type-axis TOTAL (the C 09.01 axis-total discipline —
    * the catalogue binds the total, a named type sheet stays
    * unbindable).
    *
    * Scale shape: one projection over the persisted ledger slice, ONE
    * rollup shuffle (maturity leg, category) emitting category rows and
    * both leg totals together — never a second pass for totals. */
  val q172CorepC0806 = QueryDef(
    "q172_corep_c0806",
    (s, dir) => {
      val refMap = c0806RowRefs.map { case (c, sh, r) =>
        s"WHEN cat = '$c' AND is_short = $sh THEN '$r'"
      }.mkString("CASE ",
        " ", " WHEN cat IS NULL AND is_short THEN '0110' " +
          "WHEN cat IS NULL THEN '0120' END")
      DomainPipeline.ledger(s, dir)
        .filter(col("approach") === "IRB" && col("exposure_class") === "corporate")
        .selectExpr("*", s"$slvCat AS cat", s"($slvMat) < 2.5 AS is_short")
        .selectExpr("*", s"$slRw AS rw", s"$slEl AS el_rate")
        .rollup(col("is_short"), col("cat"))
        .agg(
          count(lit(1)).as("n_exposures"),
          dsum(col("drawn_base") + col("undrawn_base"), 2).as("orig_exposure"),
          dsum(col("undrawn_base"), 2).as("off_bs_orig"),
          dsum(col("ead_pre_crm"), 2).as("exposure_value"),
          dsum(q2(col("ead_pre_crm") - col("drawn_base")), 2).as("off_bs_ev"),
          dsum(q2(col("ead_pre_crm") * col("rw")), 2).as("rwea"),
          dsum(q2(col("ead_pre_crm") * col("el_rate")), 2).as("expected_loss"),
          max(col("rw")).as("rw_max"))
        .filter(col("is_short").isNotNull)
        .selectExpr(
          s"$refMap AS row_ref",
          "coalesce(cat, 'total') AS category",
          "is_short AS is_short_maturity",
          "n_exposures",
          "orig_exposure",
          "orig_exposure AS post_crm_exposure",
          "off_bs_orig",
          "exposure_value",
          "off_bs_ev",
          "CAST(0.0 AS DOUBLE) AS ev_ccr",
          "CASE WHEN cat IS NULL THEN CAST(NULL AS DOUBLE) ELSE rw_max END AS risk_weight",
          "rwea",
          "expected_loss")
        .orderBy(col("row_ref"))
    },
    Some {
      val refMap = c0806RowRefs.map { case (c, sh, r) =>
        s"WHEN cat = '$c' AND is_short = $sh THEN '$r'"
      }.mkString("CASE ",
        " ", " WHEN cat IS NULL AND is_short THEN '0110' " +
          "WHEN cat IS NULL THEN '0120' END")
      s"""
      WITH ${Domain.domainLedgerCtes},
      c0806slice AS (
        SELECT *, $slvCat AS cat, ($slvMat) < 2.5 AS is_short
        FROM final
        WHERE approach = 'IRB' AND exposure_class = 'corporate'),
      c0806priced AS (
        SELECT *, $slRw AS rw, $slEl AS el_rate
        FROM c0806slice),
      c0806rolled AS (
        SELECT is_short, cat,
               count(*) AS n_exposures,
               ${sqlDsum("drawn_base + undrawn_base", 2)} AS orig_exposure,
               ${sqlDsum("undrawn_base", 2)} AS off_bs_orig,
               ${sqlDsum("ead_pre_crm", 2)} AS exposure_value,
               ${sqlDsum(sql2("ead_pre_crm - drawn_base"), 2)} AS off_bs_ev,
               ${sqlDsum(sql2("ead_pre_crm * rw"), 2)} AS rwea,
               ${sqlDsum(sql2("ead_pre_crm * el_rate"), 2)} AS expected_loss,
               max(rw) AS rw_max
        FROM c0806priced
        GROUP BY ROLLUP(is_short, cat))
      SELECT * FROM (
        SELECT $refMap AS row_ref,
               coalesce(cat, 'total') AS category,
               is_short AS is_short_maturity,
               n_exposures,
               orig_exposure,
               orig_exposure AS post_crm_exposure,
               off_bs_orig,
               exposure_value,
               off_bs_ev,
               CAST(0.0 AS DOUBLE) AS ev_ccr,
               CASE WHEN cat IS NULL THEN NULL ELSE rw_max END AS risk_weight,
               rwea,
               expected_loss
        FROM c0806rolled
        WHERE is_short IS NOT NULL)
      ORDER BY row_ref
      """.stripMargin.trim
    })

  val all: Seq[QueryDef] = Seq(
    q121CorepC08, q128CorepC0802, q140CorepC02, q144CorepC0803,
    q147C02Validations, q148CorepC0805, q149CorepC0807, q172CorepC0806)
}

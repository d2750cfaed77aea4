package graft.refbook

import RefCube._

/** Pillar 3 disclosure templates over the reporting cube, in the
  * published grids (CRR Part 8 / PRA PS1/26 Annex XX-XXII layouts):
  * OV1, CR4, CR5, CR6-A, CR7, CR8, and the Basel 3.1 CMS1 / CMS2
  * modelled-vs-standardised comparisons. Cell semantics mirror the
  * reference's declarative specs (`reporting/pillar3/{ov1,cr4,cr5,cr6a,
  * cr7,cr8,cms1,cms2}.py`) re-expressed over the cube; Pillar 3's
  * empty-subset policy is null unless a cell carries the zero override.
  */
object RefPillar3 {

  // ---- shared population predicates ------------------------------------

  val ccrRiskTypes: Set[String] = Set("CCR_DERIVATIVE", "CCR_SFT", "CCR_DEFAULT_FUND")
  def isCcr(r: CRow): Boolean = r.s("risk_type").exists(ccrRiskTypes)
  private def isDerivative(r: CRow) = r.s("risk_type").contains("CCR_DERIVATIVE")
  private def facesCcp(r: CRow) = r.s("cp_entity_type").contains("ccp")

  val irbFamily: Set[String] = Set("foundation_irb", "advanced_irb", "slotting")

  def approachOrigin(r: CRow): Option[String] = r.s("reporting_approach_origin")
  def approachPost(r: CRow): Option[String] = r.s("reporting_approach")

  /** CR4/CR5 population: SA CREDIT risk — the CCR / settlement synthetic
    * legs leave entirely (reference `pillar3/sa_scope.py`); the
    * `facility_undrawn` leg reclassifies off-balance-sheet (already the
    * sealed convention here). */
  def saCreditPop(r: CRow): Boolean =
    !r.s("exposure_type").exists(Set("ccr_netting_set", "ccr_default_fund", "ccr_failed_trade"))

  // ---- OV1 --------------------------------------------------------------

  private val ov1ApproachRefs: Map[String, Set[String]] = Map(
    "2" -> Set("standardised", "equity"),
    "3" -> Set("foundation_irb"),
    "4" -> Set("slotting"),
    "UK4a" -> Set("equity"),
    "5" -> Set("advanced_irb"))

  def ov1(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "ov1")
    def ccp(r: CRow) = isCcr(r) && facesCcp(r)
    def saCcr(r: CRow) = isDerivative(r) && !facesCcp(r)
    def aCell(ref: String): Option[Double] = ref match {
      case "29" => sumCell(cube, _ => true, "rwa_final", emptyAsNone = true)
      case "1" => sumCell(cube, r => !isCcr(r), "rwa_final", emptyAsNone = true)
      case "6" => sumCell(cube, isCcr, "rwa_final", emptyAsNone = false)
      case "7" => sumCell(cube, saCcr, "rwa_final", emptyAsNone = false)
      case "UK8a" => sumCell(cube, ccp, "rwa_final", emptyAsNone = false)
      case "9" => sumCell(cube, r => isCcr(r) && !saCcr(r) && !ccp(r),
        "rwa_final", emptyAsNone = false)
      case "24" =>
        // Art. 48(4) threshold items: origin "other" class at a 250% RW
        // (recorded approximation — reference ov1.py row 24).
        sumCell(cube,
          r => r.s("reporting_class_origin").contains("other") &&
            r.d("reporting_rw").exists(w => w >= 2.495 && w <= 2.505),
          "rwa_final", emptyAsNone = true)
      case "26" if cfg.isB31 => Some(cfg.outputFloorPct)
      case ref if ov1ApproachRefs.contains(ref) =>
        sumCell(cube,
          r => !isCcr(r) && approachPost(r).exists(ov1ApproachRefs(ref)),
          "rwa_final", emptyAsNone = false)
      // 8 (IMM — not implemented: null, not 0), 11-14 (F6-stripped equity
      // discriminators), 27 (OF-ADJ side input — not threaded here).
      case _ => None
    }
    RefFrame.build(grid) { (ref, colRef) =>
      colRef match {
        case "a" => aCell(ref)
        case "c" if ref != "26" && ref != "27" => aCell(ref).map(_ * 0.08)
        case _ => None
      }
    }
  }

  // ---- CR4 ----------------------------------------------------------------

  /** The Art. 112 SA disclosure row classes (reference
    * `pillar3/templates.py::SA_DISCLOSURE_CLASSES`). */
  val saDisclosureClasses: Vector[(String, Set[String])] = Vector(
    "1" -> Set("central_govt_central_bank"),
    "2" -> Set("rgla"),
    "3" -> Set("pse"),
    "4" -> Set("mdb"),
    "5" -> Set("international_organisation"),
    "6" -> Set("institution"),
    "7" -> Set("corporate", "corporate_sme"),
    "8" -> Set("retail_other", "retail_qrre"),
    "9" -> Set("retail_mortgage", "residential_mortgage", "commercial_mortgage"),
    "10" -> Set("defaulted"),
    "12" -> Set("covered_bond"),
    "15" -> Set("equity"),
    "16" -> Set("other"))
  private val cr4Classes = saDisclosureClasses.toMap +
    ("7a" -> Set("specialised_lending"))

  def cr4(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cr4")
    val pop = cube.filter(r => saCreditPop(r) &&
      approachOrigin(r).contains("standardised"))
    def rowCells(classes: Option[Set[String]]): String => Option[Double] = {
      def co(r: CRow) = classes.forall(cs => r.s("reporting_class_origin").exists(cs))
      def cp(r: CRow) = classes.forall(cs => r.s("reporting_class").exists(cs))
      val c = total(pop, r => cp(r) && r.b("reporting_on_balance_sheet").contains(true), "ead_final")
      val d = total(pop, r => cp(r) && r.b("reporting_on_balance_sheet").contains(false), "ead_final")
      val e = total(pop, cp, "rwa_final")
      Map(
        "a" -> Some(total(pop, co, "reporting_gross_on_bs")),
        "b" -> Some(total(pop, co, "reporting_gross_off_bs")),
        "c" -> Some(c), "d" -> Some(d), "e" -> Some(e),
        "f" -> (if (c + d > 0) Some(e / (c + d)) else None))
    }
    RefFrame.build(grid) { (ref, colRef) =>
      if (ref == "17") rowCells(None)(colRef)
      else cr4Classes.get(ref) match {
        case Some(cs) => rowCells(Some(cs))(colRef)
        case None => None // unmapped rows (11/13/14, B31 9a-9e memo sub-rows)
      }
    }
  }

  // ---- CR5 ----------------------------------------------------------------

  /** CR5 risk-weight bands per framework (reference
    * `pillar3/templates.py::{CRR,B31}_CR5_RISK_WEIGHTS`). */
  val cr5BandsCrr: Vector[Double] = Vector(
    0.0, 0.02, 0.04, 0.10, 0.20, 0.35, 0.50, 0.70, 0.75, 1.00, 1.50,
    2.50, 3.70, 12.50)
  val cr5BandsB31: Vector[Double] = Vector(
    0.0, 0.02, 0.04, 0.10, 0.15, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45,
    0.50, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 1.00, 1.05, 1.10, 1.30,
    1.35, 1.50, 2.50, 3.00, 4.00, 12.50)

  def cr5(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cr5")
    val bands = if (cfg.isB31) cr5BandsB31 else cr5BandsCrr
    val bandRefs = grid.cols.take(bands.size)
    val otherRef = grid.cols(bands.size)
    val totalRef = grid.cols(bands.size + 1)
    val unratedRef = grid.cols(bands.size + 2)
    val pop = cube.filter(r => saCreditPop(r) &&
      approachOrigin(r).contains("standardised"))
    def member(classes: Option[Set[String]])(r: CRow) =
      classes.forall(cs => r.s("reporting_class").exists(cs))
    def bucketOf(r: CRow): Option[Int] =
      r.d("reporting_rw").flatMap { w =>
        bands.zipWithIndex.find { case (b, _) => w >= b - 0.005 && w < b + 0.005 }
          .map(_._2)
      }
    RefFrame.build(grid) { (ref, colRef) =>
      // CR5 shares the CR4 row classes; the B31 9f/9g 55%-LTV split memo
      // rows key the splitter's `re_split_role` tag — a carrier this
      // ledger does not yet produce, so their membership is empty (the
      // reference's tolerant-equals absent-column behaviour: 0.0 cells).
      val membership: Option[CRow => Boolean] =
        if (ref == "17") Some(_ => true)
        else if (ref == "9f" || ref == "9g") Some(_ => false)
        else cr4Classes.get(ref).map(cs => member(Some(cs)) _)
      membership match {
        case None => None
        case Some(m) =>
          val totalEad = total(pop, m, "ead_final")
          if (bandRefs.contains(colRef)) {
            val i = bandRefs.indexOf(colRef)
            Some(total(pop, r => m(r) && bucketOf(r).contains(i), "ead_final"))
          } else if (colRef == otherRef) {
            val allocated = bandRefs.indices.map(i =>
              total(pop, r => m(r) && bucketOf(r).contains(i), "ead_final")).sum
            Some(math.max(0.0, totalEad - allocated))
          } else if (colRef == totalRef) Some(totalEad)
          else if (colRef == unratedRef)
            Some(total(pop, r => m(r) && r.is("external_unrated"), "ead_final"))
          else if (cfg.isB31 && colRef == "ba") Some(total(pop, m, "reporting_gross_on_bs"))
          else if (cfg.isB31 && colRef == "bb") Some(total(pop, m, "reporting_gross_off_bs"))
          else if (cfg.isB31 && colRef == "bc") {
            // EAD-weighted average CCF over the off-balance-sheet rows.
            def off(r: CRow) = m(r) && r.b("reporting_on_balance_sheet").contains(false)
            val w = total(pop, off, "ead_final")
            if (w == 0.0) None
            else Some(pop.iterator.filter(off)
              .map(r => r.d("ccf").getOrElse(0.0) * r.m("ead_final")).sum / w)
          } else if (cfg.isB31 && colRef == "bd") Some(totalEad)
          else None
      }
    }
  }

  // ---- CR6-A --------------------------------------------------------------

  private val cr6aClasses: Map[String, Set[String]] = Map(
    "1" -> Set("central_govt_central_bank"),
    "2" -> Set("institution"),
    "3" -> Set("corporate", "corporate_sme", "specialised_lending"),
    "4" -> Set("retail_mortgage"),
    "5" -> Set("retail_qrre"),
    "6" -> Set("retail_other"))

  def cr6a(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cr6a")
    val totalRef = if (cfg.isB31) "7" else "8"
    val crrEquityRef = if (cfg.isB31) None else Some("7")
    RefFrame.build(grid) { (ref, colRef) =>
      val classes: Option[Option[Set[String]]] =
        if (ref == totalRef) Some(None)
        else if (crrEquityRef.contains(ref)) Some(Some(Set("equity")))
        else cr6aClasses.get(ref).map(Some(_))
      classes match {
        case None => None
        case Some(cls) =>
          // Membership is on the raw ORIGINATION exposure_class.
          def m(r: CRow) = cls.forall(cs => r.s("exposure_class").exists(cs))
          val a = total(cube, r => m(r) && approachOrigin(r).exists(irbFamily), "ead_final")
          val b = total(cube, m, "ead_final")
          colRef match {
            case "a" => Some(a)
            case "b" => Some(b)
            case "c" => if (b > 0) Some((b - a) / b * 100.0) else None
            case "d" => if (b > 0) Some(a / b * 100.0) else None
            case "e" => Some(0.0) // roll-out plans are not pipeline data
            case _ => None
          }
      }
    }
  }

  // ---- CR7 ----------------------------------------------------------------

  def cr7(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cr7")
    val firb = Set("foundation_irb"); val airb = Set("advanced_irb")
    val corpB31 = Set("corporate", "corporate_sme", "specialised_lending")
    val preds: Map[String, CRow => Boolean] =
      if (cfg.isB31) Map(
        "1" -> (r => approachOrigin(r).exists(firb)),
        "2" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").contains("institution")),
        "3" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").exists(corpB31)),
        "4" -> (r => approachOrigin(r).exists(airb)),
        "5" -> (r => approachOrigin(r).exists(airb) &&
          r.s("reporting_class_origin").exists(corpB31)),
        "6" -> (r => approachOrigin(r).exists(airb) &&
          r.s("reporting_class_origin").exists(
            Set("retail_mortgage", "retail_qrre", "retail_other"))),
        "7" -> (r => approachOrigin(r).contains("slotting")),
        "8" -> (r => approachOrigin(r).exists(irbFamily)))
      else Map(
        "1" -> (r => approachOrigin(r).exists(firb)),
        "2" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").contains("central_govt_central_bank")),
        "3" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").contains("institution")),
        "4" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").contains("corporate_sme")),
        "5" -> (r => approachOrigin(r).exists(firb) &&
          r.s("reporting_class_origin").exists(Set("corporate", "specialised_lending"))),
        "6" -> (r => approachOrigin(r).exists(airb)),
        "7" -> (r => approachOrigin(r).exists(airb) &&
          r.s("reporting_class_origin").exists(corpB31)),
        "8" -> (r => approachOrigin(r).exists(airb) &&
          r.s("reporting_class_origin").contains("retail_mortgage")),
        "9" -> (r => approachOrigin(r).exists(airb) &&
          r.s("reporting_class_origin").exists(Set("retail_other", "retail_qrre"))),
        "10" -> (r => approachOrigin(r).exists(irbFamily)))
    RefFrame.build(grid) { (ref, colRef) =>
      preds.get(ref).flatMap { p =>
        if (colRef == "a" || colRef == "b") sumCell(cube, p, "rwa_final", emptyAsNone = true)
        else None
      }
    }
  }

  // ---- CR8 ----------------------------------------------------------------

  def cr8(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cr8")
    val pop: Pred = r =>
      r.s("approach_applied").exists(Set("foundation_irb", "advanced_irb")) ||
        approachOrigin(r).exists(Set("foundation_irb", "advanced_irb"))
    RefFrame.build(grid) { (ref, colRef) =>
      // No prior-period frame is threaded: rows 1 (opening) and 8 (the flow
      // residual) stay null, exactly as the reference dispatch without one.
      if (ref == "9" && colRef == "a") sumCell(cube, pop, "rwa_final", emptyAsNone = true)
      else None
    }
  }

  // ---- CMS1 / CMS2 (Basel 3.1 only) ----------------------------------------

  private def modelled(r: CRow) = approachOrigin(r).exists(irbFamily)

  def cms1(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cms1")
    val rowCcr: Map[String, Option[Boolean]] =
      Map("0010" -> Some(false), "0020" -> Some(true), "0080" -> None)
    RefFrame.build(grid) { (ref, colRef) =>
      rowCcr.get(ref).flatMap { ccrSide =>
        def side(r: CRow) = ccrSide.forall(_ == isCcr(r))
        colRef match {
          case "a" => Some(total(cube, r => side(r) && modelled(r), "rwa_final"))
          case "b" => Some(total(cube, r => side(r) && !modelled(r), "rwa_final"))
          case "c" => Some(total(cube, r => side(r) && modelled(r), "rwa_final") +
            total(cube, r => side(r) && !modelled(r), "rwa_final"))
          case "d" => Some(total(cube, side, "sa_rwa"))
          case _ => None
        }
      }
    }
  }

  private val cms2Classes: Map[String, Set[String]] = Map(
    "0010" -> Set("central_govt_central_bank"),
    "0011" -> Set("mdb", "pse"),
    "0020" -> Set("institution"),
    "0030" -> Set("equity"),
    "0040" -> Set("corporate", "corporate_sme", "specialised_lending"),
    "0043" -> Set("specialised_lending"),
    "0050" -> Set("retail_mortgage", "retail_qrre", "retail_other"),
    "0051" -> Set("retail_qrre"),
    "0052" -> Set("retail_other"),
    "0053" -> Set("retail_mortgage"),
    "0060" -> Set("other", "rgla", "covered_bond", "defaulted"))

  def cms2(cfg: RefRunConfig, cube: Vector[CRow]): RefFrame = {
    val grid = RefLayouts.grid(cfg.framework, "cms2")
    val corp = cms2Classes("0040")
    def member(cs: Set[String])(r: CRow) = r.s("exposure_class").exists(cs)
    RefFrame.build(grid) { (ref, colRef) =>
      def classCells(cs: Set[String]): Option[Double] = colRef match {
        case "a" => sumCell(cube, r => member(cs)(r) && modelled(r), "rwa_final",
          emptyAsNone = true)
        case "b" => sumCell(cube, r => member(cs)(r) && modelled(r), "sa_rwa",
          emptyAsNone = true)
        case "c" => Some(total(cube, member(cs), "rwa_final"))
        case "d" => sumCell(cube, member(cs), "sa_rwa", emptyAsNone = true)
        case _ => None
      }
      ref match {
        case "0070" => colRef match { // Total
          case "a" => sumCell(cube, modelled, "rwa_final", emptyAsNone = true)
          case "b" => sumCell(cube, modelled, "sa_rwa", emptyAsNone = true)
          case "c" => Some(total(cube, _ => true, "rwa_final"))
          case "d" => sumCell(cube, _ => true, "sa_rwa", emptyAsNone = true)
          case _ => None
        }
        case "0041" =>
          def firbCorp(r: CRow) = member(corp)(r) &&
            approachOrigin(r).contains("foundation_irb")
          colRef match {
            case "a" => sumCell(cube, firbCorp, "rwa_final", emptyAsNone = true)
            case "b" => sumCell(cube, firbCorp, "sa_rwa", emptyAsNone = true)
            case "c" => Some(total(cube, firbCorp, "rwa_final"))
            case "d" => sumCell(cube, member(corp), "sa_rwa", emptyAsNone = true)
            case _ => None
          }
        case "0042" =>
          def airbCorp(r: CRow) = member(corp)(r) &&
            approachOrigin(r).contains("advanced_irb")
          colRef match {
            case "a" => sumCell(cube, airbCorp, "rwa_final", emptyAsNone = true)
            case "b" => sumCell(cube, airbCorp, "sa_rwa", emptyAsNone = true)
            case "c" => sumCell(cube, airbCorp, "rwa_final", emptyAsNone = true) // mirrors a
            case _ => None
          }
        case _ => cms2Classes.get(ref).flatMap(classCells)
      }
    }
  }

  // ---- CR6 — IRB by class and PD range (reference `pillar3/cr6.py`) -----

  private val irbNonSlotting = Set("foundation_irb", "advanced_irb")
  private val irbExposureClasses = Set("central_govt_central_bank",
    "institution", "corporate", "corporate_sme", "specialised_lending",
    "retail_mortgage", "retail_qrre", "retail_other", "equity")

  private def wavgOf(rows: Vector[CRow], pred: CRow => Boolean,
      num: String, den: String, scale: Double = 1.0): Option[Double] = {
    val subset = rows.filter(pred)
    val w = subset.iterator.map(_.m(den)).sum
    if (subset.isEmpty || w == 0.0) None
    else Some(subset.iterator.map(_.m(num)).sum / w * scale)
  }

  /** Generate CR6: one frame per obligor exposure class over the origin
    * F-IRB/A-IRB book. Rows 1-17 are the fixed hierarchical PD scale (the
    * sealed `cr6_band_leaf`/`cr6_band_parent` labels, defaulted legs
    * forced to the 100% band); empty bands render all-null; row 18 pools
    * the class. Col `a` is the String PD-range label (= the row name),
    * injected after the nulling pass. */
  def cr6(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "cr6")
    val pop = cube.filter(r => !isCcr(r) &&
      r.s("reporting_approach_origin").exists(irbNonSlotting))
    if (pop.isEmpty) return Map.empty
    val parents = Set("1", "7", "10", "13")
    val axis = pop.flatMap(_.s("reporting_class_origin"))
      .filter(irbExposureClasses).toSet.toSeq.sorted
    axis.map { ec =>
      val sheet = pop.filter(r => r.s("reporting_class_origin").contains(ec))
      def band(ref: String)(r: CRow): Boolean =
        if (parents(ref)) r.s("cr6_band_parent").contains(ref)
        else r.s("cr6_band_leaf").contains(ref)
      def sum(m: String, pred: CRow => Boolean): Option[Double] = {
        val subset = sheet.filter(pred)
        if (subset.isEmpty) None else Some(subset.iterator.map(_.m(m)).sum)
      }
      val computed = grid.rows.flatMap { case (ref, _) =>
        val t: CRow => Boolean = if (ref == "18") _ => true else band(ref) _
        val off = (r: CRow) => t(r) &&
          r.b("reporting_on_balance_sheet").contains(false)
        val obligors = RefCube.distinctObligors(sheet, t).toLong
        val ead = sheet.iterator.filter(t).map(_.m("ead_final")).sum
        val rwa = sheet.iterator.filter(t).map(_.m("rwa_final")).sum
        val cells: Seq[(String, Option[Double])] = Seq(
          "b" -> sum("reporting_gross_on_bs", t),
          "c" -> sum("reporting_gross_off_bs", t),
          "d" -> wavgOf(sheet, off, "ccf_eadw", "ead_final"),
          "e" -> (if (sheet.exists(t)) Some(ead) else Some(0.0)), // empty_cell zero
          "f" -> wavgOf(sheet, t, "pd_w", "ead_final", 100.0),
          "g" -> (if (sheet.exists(t)) Some(obligors.toDouble) else None),
          "h" -> wavgOf(sheet, t, "lgd_w", "ead_final", 100.0),
          "i" -> wavgOf(sheet, t, "m_w", "ead_final"),
          "j" -> (if (sheet.exists(t)) Some(rwa) else Some(0.0)),
          "k" -> (if (sheet.exists(t) && ead != 0.0) Some(rwa / ead) else None),
          "l" -> sum("expected_loss", t),
          "m" -> None) // scra_provision_amount: never sealed
        cells.filter { case (c, _) => grid.cols.contains(c) }
          .map { case (c, v) => ((ref, c), v) }
      }.toMap
      // empty PD bands render all-null (`_null_empty_bands`); the Total
      // row and the String label survive
      val emptyRefs = grid.rows.map(_._1)
        .filter(ref => ref != "18" && !sheet.exists(band(ref))).toSet
      val strCells: Map[(String, String), Option[String]] =
        grid.rows.map { case (ref, name) => ((ref, "a"), Option(name)) }.toMap
      ec -> frameOf(grid, computed).nullRows(emptyRefs).copy(strCells = strCells)
    }.toMap
  }

  // ---- CR7-A — extent of CRM use, IRB (reference `pillar3/cr7a.py`) -----

  private val cr7aFirbRows: Vector[(String, String, Option[Set[String]])] = Vector(
    ("1", "Central governments or central banks", Some(Set("central_govt_central_bank"))),
    ("2", "Institutions", Some(Set("institution"))),
    ("3", "Corporates — Specialised lending", Some(Set("specialised_lending"))),
    ("4", "Corporates — Other", Some(Set("corporate", "corporate_sme"))),
    ("5", "Total", None))
  private val cr7aAirbRows: Vector[(String, String, Option[Set[String]])] = Vector(
    ("1", "Corporates — Specialised lending", Some(Set("specialised_lending"))),
    ("2", "Corporates — Other", Some(Set("corporate", "corporate_sme"))),
    ("3", "Retail — Secured by immovable property", Some(Set("retail_mortgage"))),
    ("4", "Retail — Qualifying revolving", Some(Set("retail_qrre"))),
    ("5", "Retail — Other", Some(Set("retail_other"))),
    ("6", "Total", None))

  /** Generate CR7-A: one frame per ORIGIN approach. Col a = total EAD
    * (zero on an empty class row); the funded/unfunded percentage columns
    * divide the (sealed-zero) collateral carriers by the row EAD; c is
    * the d+e+f formula (null when all zero); m and n both sum rwa_final
    * (the recorded m == n approximation); g-j, l and the B31 slotting
    * pair stay permanently null. Template empty policy: null. */
  def cr7a(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "cr7a")
    val results = for ((approach, rows) <- Seq(
      ("foundation_irb", cr7aFirbRows), ("advanced_irb", cr7aAirbRows))) yield {
      val sheet = cube.filter(r =>
        r.s("reporting_approach_origin").contains(approach))
      if (sheet.isEmpty) None
      else {
        val sheetGrid = RefLayouts.Grid(rows.map(r => (r._1, r._2)), grid.cols)
        val computed = rows.flatMap { case (ref, _, classes) =>
          val t = (r: CRow) =>
            classes.forall(cs => r.s("reporting_class_origin").exists(cs))
          val subset = sheet.filter(t)
          val ead = subset.iterator.map(_.m("ead_final")).sum
          val rwa = subset.iterator.map(_.m("rwa_final")).sum
          val pct: Option[Double] = // Ratio over the sealed-zero carriers
            if (subset.isEmpty || ead == 0.0) None else Some(0.0)
          // col d: the per-leg-capped RE collateral share (the one carrier
          // this book seals); c = d + e + f, null when every component is 0
          val dVal: Option[Double] =
            if (subset.isEmpty || ead == 0.0) None
            else Some(subset.iterator.map(_.m("coll_re_capped")).sum / ead * 100.0)
          val cVal: Option[Double] = dVal.filter(_ != 0.0)
          val cells: Seq[(String, Option[Double])] = Seq(
            "a" -> Some(ead), // explicit empty_cell="zero"
            "b" -> pct, "d" -> dVal, "e" -> pct, "f" -> pct, "k" -> pct,
            "c" -> cVal,
            "m" -> (if (subset.isEmpty) None else Some(rwa)),
            "n" -> (if (subset.isEmpty) None else Some(rwa)))
          cells.filter { case (c, _) => grid.cols.contains(c) }
            .map { case (c, v) => ((ref, c), v) }
        }.toMap
        Some(approach -> frameOf(sheetGrid, computed))
      }
    }
    results.flatten.toMap
  }

  // ---- CR9 — IRB PD back-testing (Basel 3.1 only; `pillar3/cr9.py`) -----

  /** The Annex XXII leaf-class taxonomy per origin approach: (sheet key,
    * display label, membership). `corporate_financial_large` needs the
    * never-sealed `cp_is_financial_sector_entity` flag, so it matches
    * nothing and residual corporates collapse onto the non-SME leaf
    * (the recorded absent-column degradation). */
  private def cr9Classes(approach: String): Vector[(String, String, CRow => Boolean)] = {
    def cls(ec: String)(r: CRow) = r.s("reporting_class_origin").contains(ec)
    val corpOther = (r: CRow) => cls("corporate")(r) // financial_large clause dropped
    val shared = Vector(
      ("specialised_lending", "Corporates — Specialised lending",
        cls("specialised_lending") _),
      ("corporate_sme", "Corporates — Other general corporates (SME)",
        cls("corporate_sme") _),
      ("corporate_other_non_sme", "Corporates — Other general corporates (non-SME)",
        corpOther))
    if (approach == "foundation_irb")
      Vector(("institution", "Institutions", cls("institution") _),
        shared(0),
        ("corporate_financial_large", "Corporates — Financial and large corporates",
          (_: CRow) => false),
        shared(1), shared(2))
    else shared ++ Vector(
      ("retail_rre_sme", "Retail — Secured by residential immovable property (SME)",
        (r: CRow) => cls("retail_mortgage")(r) && r.is("is_sme") &&
          r.s("property_type").contains("residential")),
      ("retail_rre_non_sme", "Retail — Secured by residential immovable property (non-SME)",
        (r: CRow) => cls("retail_mortgage")(r) && !r.is("is_sme") &&
          r.s("property_type").contains("residential")),
      ("retail_cre_sme", "Retail — Secured by commercial immovable property (SME)",
        (r: CRow) => cls("retail_mortgage")(r) && r.is("is_sme") &&
          r.s("property_type").contains("commercial")),
      ("retail_cre_non_sme", "Retail — Secured by commercial immovable property (non-SME)",
        (r: CRow) => cls("retail_mortgage")(r) && !r.is("is_sme") &&
          r.s("property_type").contains("commercial")),
      ("retail_qrre", "Retail — Qualifying revolving", cls("retail_qrre") _),
      ("retail_other_sme", "Retail — Other (SME)",
        (r: CRow) => cls("retail_other")(r) && r.is("is_sme")),
      ("retail_other_non_sme", "Retail — Other (non-SME)",
        (r: CRow) => cls("retail_other")(r) && !r.is("is_sme")))
  }

  private val cr9BandOrder: Vector[(String, String)] = Vector(
    "1" -> "0.00 to <0.15", "2" -> "0.00 to <0.10", "3" -> "0.10 to <0.15",
    "4" -> "0.15 to <0.25", "5" -> "0.25 to <0.50", "6" -> "0.50 to <0.75",
    "7" -> "0.75 to <2.50", "8" -> "0.75 to <1.75", "9" -> "1.75 to <2.5",
    "10" -> "2.50 to <10.00", "11" -> "2.5 to <5", "12" -> "5 to <10",
    "13" -> "10.00 to <100.00", "14" -> "10 to <20", "15" -> "20 to <30",
    "16" -> "30.00 to <100.00", "17" -> "100.00 (Default)")

  /** Generate CR9 (Basel 3.1 only): one frame per (origin approach ×
    * Annex XXII leaf class), compound-keyed `"approach - class"`, with
    * ONLY the populated PD bands (plus the Total, ref 18) emitted. Cols
    * a/b are the String class / PD-range labels. */
  def cr9(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    if (!cfg.isB31) return Map.empty
    val grid = RefLayouts.grid(cfg.framework, "cr9")
    val parents = Set("1", "7", "10", "13")
    val pop = cube.filter(r =>
      r.s("reporting_approach_origin").exists(irbNonSlotting))
    if (pop.isEmpty) return Map.empty
    val out = for {
      approach <- Seq("foundation_irb", "advanced_irb")
      approachRows = pop.filter(r =>
        r.s("reporting_approach_origin").contains(approach))
      if approachRows.nonEmpty
      (classKey, display, leaf) <- cr9Classes(approach)
      sheet = approachRows.filter(leaf)
      if sheet.nonEmpty
    } yield {
      def band(ref: String)(r: CRow): Boolean =
        if (parents(ref)) r.s("cr6_band_parent").contains(ref)
        else r.s("cr6_band_leaf").contains(ref)
      val rows = cr9BandOrder.filter { case (ref, _) => sheet.exists(band(ref)) } :+
        ("18" -> "Total")
      val sheetGrid = RefLayouts.Grid(rows.map(r => (r._1, r._2)), grid.cols)
      val computed = rows.flatMap { case (ref, _) =>
        val t: CRow => Boolean = if (ref == "18") _ => true else band(ref) _
        val subset = sheet.filter(t)
        val obligors = RefCube.distinctObligors(sheet, t)
        val defaulted = RefCube.distinctObligors(sheet,
          r => t(r) && r.is("is_defaulted"))
        val rate = if (obligors <= 0) 0.0 else defaulted / obligors * 100.0
        val n = subset.map(_.n).sum
        val meanPd = if (n == 0) None
          else Some(subset.iterator.map(_.m("pd_floored_sum")).sum / n * 100.0)
        Seq(
          ((ref, "c"), Some(obligors)),
          ((ref, "d"), Some(defaulted)),
          ((ref, "e"), Some(rate)),
          ((ref, "f"), wavgOf(sheet, t, "pd_w", "ead_final", 100.0)),
          ((ref, "g"), meanPd),
          ((ref, "h"), Some(rate))) // no historical series → copy of e
      }.toMap
      val strCells: Map[(String, String), Option[String]] =
        rows.flatMap { case (ref, name) =>
          Seq(((ref, "a"), Option(display)), ((ref, "b"), Option(name)))
        }.toMap
      s"$approach - $classKey" ->
        frameOf(sheetGrid, computed).copy(strCells = strCells)
    }
    out.toMap
  }

  private def frameOf(grid: RefLayouts.Grid,
      computed: Map[(String, String), Option[Double]]): RefFrame =
    RefFrame(grid.rows, grid.cols,
      (for { (r, _) <- grid.rows; c <- grid.cols }
        yield ((r, c), computed.getOrElse((r, c), None))).toMap)

  // ---- CCR1 / CCR3 / CCR8 (reference `pillar3/ccr.py`) ------------------

  private def p3CcrPop(cube: Vector[CRow]): Vector[CRow] =
    cube.filter(r => r.s("ccr_netting_set_id").isDefined &&
      !r.s("risk_type").contains("CCR_SFT"))
  private def p3QccpTrade(r: CRow): Boolean =
    r.s("cp_entity_type").contains("ccp") && r.b("cp_is_qccp").forall(identity)

  /** CCR1: SA-CCR row + Total — col a = portfolio SA-CCR EAD, col b = the
    * default-risk RWEA (QCCP trade legs excluded; they disclose on CCR8).
    * IMM / original-exposure rows stay null. None when no `ccr__` rows. */
  def ccr1(cfg: RefRunConfig, cube: Vector[CRow]): Option[RefFrame] = {
    val ccr = p3CcrPop(cube)
    if (ccr.isEmpty) return None
    val grid = RefLayouts.grid(cfg.framework, "ccr1")
    val ead = ccr.map(_.m("ead_final")).sum
    val rwa = ccr.filterNot(p3QccpTrade).map(_.m("rwa_final")).sum
    Some(frameOf(grid, Map(
      ("1", "a") -> Some(ead), ("1", "b") -> Some(rwa),
      ("11", "a") -> Some(ead), ("11", "b") -> Some(rwa))))
  }

  /** CCR3: SA-CCR EAD per risk-weight band (the grid's own "Risk weight
    * X%" ladder; unmatched weights fall to the Other row); empty bands
    * stay null; the Total re-derives the whole population. */
  def ccr3(cfg: RefRunConfig, cube: Vector[CRow]): Option[RefFrame] = {
    val ccr = p3CcrPop(cube)
    if (ccr.isEmpty) return None
    val grid = RefLayouts.grid(cfg.framework, "ccr3")
    val bandRows = grid.rows.flatMap { case (ref, name) =>
      if (name == "Total") None
      else if (name == "Risk weight Other") Some((ref, None))
      else Some((ref,
        Some(name.stripPrefix("Risk weight ").stripSuffix("%").toDouble / 100.0)))
    }
    val bands = bandRows.collect { case (_, Some(v)) => v }
    def round4(x: Double) = math.rint(x * 1e4) / 1e4
    val computed = grid.rows.flatMap { case (ref, name) =>
      val subset =
        if (name == "Total") ccr
        else bandRows.find(_._1 == ref).get._2 match {
          case Some(w) => ccr.filter(r =>
            r.d("reporting_rw").exists(x => round4(x) == round4(w)))
          case None => ccr.filter(r => // Other: no band matches
            !r.d("reporting_rw").exists(x => bands.exists(b => round4(x) == round4(b))))
        }
      Seq(((ref, "a"),
        if (subset.isEmpty) Option.empty[Double]
        else Some(subset.map(_.m("ead_final")).sum)))
    }.toMap
    Some(frameOf(grid, computed))
  }

  /** CCR8: the CCP trade legs by QCCP flag — col a = RWEA, col b = EAD;
    * Total = the two rows' sum. None when no `ccr__` rows face a CCP. */
  def ccr8(cfg: RefRunConfig, cube: Vector[CRow]): Option[RefFrame] = {
    val ccp = p3CcrPop(cube).filter(_.s("cp_entity_type").contains("ccp"))
    if (ccp.isEmpty) return None
    val grid = RefLayouts.grid(cfg.framework, "ccr8")
    def sums(rows: Vector[CRow]): (Option[Double], Option[Double]) =
      if (rows.isEmpty) (None, None)
      else (Some(rows.map(_.m("rwa_final")).sum), Some(rows.map(_.m("ead_final")).sum))
    val (qR, qE) = sums(ccp.filter(r => r.b("cp_is_qccp").forall(identity)))
    val (nR, nE) = sums(ccp.filterNot(r => r.b("cp_is_qccp").forall(identity)))
    val (tR, tE) = (Some(qR.getOrElse(0.0) + nR.getOrElse(0.0)),
      Some(qE.getOrElse(0.0) + nE.getOrElse(0.0)))
    Some(frameOf(grid, Map(
      ("1", "a") -> qR, ("1", "b") -> qE,
      ("2", "a") -> nR, ("2", "b") -> nE,
      ("21", "a") -> tR, ("21", "b") -> tE)))
  }

  // ---- CR10 — slotting + IRB equity (reference `pillar3/cr10.py`) -------

  private val cr10SlotRows: Vector[(String, String, Boolean, String, Double)] = Vector(
    ("1", "Category 1 (Strong)", true, "strong", 50.0),
    ("2", "Category 1 (Strong)", false, "strong", 70.0),
    ("3", "Category 2 (Good)", true, "good", 70.0),
    ("4", "Category 2 (Good)", false, "good", 90.0),
    ("5", "Category 3 (Satisfactory)", true, "satisfactory", 114.99999999999999),
    ("6", "Category 3 (Satisfactory)", false, "satisfactory", 114.99999999999999),
    ("7", "Category 4 (Weak)", true, "weak", 250.0),
    ("8", "Category 4 (Weak)", false, "weak", 250.0),
    ("9", "Category 5 (Default)", true, "default", 0.0),
    ("10", "Category 5 (Default)", false, "default", 0.0))

  /** Generate CR10: one sheet per slotting SL type (category × maturity
    * rows with the Art. 153(5) display weights) and — when the equity
    * book runs the IRB simple method — the equity sheet (private /
    * exchange-traded / other at 190/290/370%). Pillar 3 null policy:
    * empty subsets report null in the value columns, the display weight
    * stays. */
  def cr10(cfg: RefRunConfig, cube: Vector[CRow]): Map[String, RefFrame] = {
    val grid = RefLayouts.grid(cfg.framework, "cr10")
    val slotting = cube.filter(r =>
      r.s("reporting_approach_origin").contains("slotting"))
    val slotSheets = slotting.flatMap(_.s("sl_type")).toSet.toSeq.sorted.map { slType =>
      val sheet = slotting.filter(r => r.s("sl_type").contains(slType))
      val rows = cr10SlotRows.map { case (ref, label, short, _, _) =>
        (ref, s"$label — remaining maturity ${if (short) "<" else ">="} 2.5 years")
      } ++ Vector(
        ("11", "Total — remaining maturity < 2.5 years"),
        ("12", "Total — remaining maturity >= 2.5 years"))
      val sheetGrid = RefLayouts.Grid(rows, grid.cols)
      def cellsFor(t: CRow => Boolean, disp: Option[Double]): Seq[(String, Option[Double])] = {
        val subset = sheet.filter(t)
        def sum(m: String): Option[Double] =
          if (subset.isEmpty) None else Some(subset.map(_.m(m)).sum)
        Seq(
          "a" -> Some(subset.map(_.m("reporting_gross_on_bs")).sum),
          "b" -> Some(subset.map(_.m("reporting_gross_off_bs")).sum),
          "c" -> disp,
          "d" -> sum("ead_final"), "e" -> sum("rwa_final"),
          "f" -> sum("expected_loss"))
      }
      val computed = (cr10SlotRows.map { case (ref, _, short, cat, disp) =>
        ref -> cellsFor(r => r.b("sl_short").contains(short) &&
          r.s("slotting_category").contains(cat), Some(disp))
      } ++ Seq(
        "11" -> cellsFor(r => r.b("sl_short").contains(true), None),
        "12" -> cellsFor(r => r.b("sl_short").contains(false), None)))
        .flatMap { case (ref, cells) => cells.map { case (c, v) => ((ref, c), v) } }
        .toMap
      slType -> frameOf(sheetGrid, computed)
    }
    val equityIrbRows = cube.filter(r =>
      r.s("reporting_approach_origin").contains("equity") &&
        r.s("equity_method").exists(Set("irb_simple", "pd_lgd")))
    val equitySheet =
      if (equityIrbRows.isEmpty) Nil
      else {
        val rows = Vector(("1", "Private equity exposures"),
          ("2", "Exchange-traded equity exposures"), ("3", "Other equity exposures"),
          ("4", "Total"))
        val types = Map("1" -> "private", "2" -> "listed", "3" -> "other")
        val disp = Map("1" -> 190.0, "2" -> 290.0, "3" -> 370.0)
        val sheetGrid = RefLayouts.Grid(rows, grid.cols)
        val computed = rows.flatMap { case (ref, _) =>
          val subset =
            if (ref == "4") equityIrbRows
            else equityIrbRows.filter(r => r.s("equity_type").contains(types(ref)))
          def sum(m: String): Option[Double] =
            if (subset.isEmpty) None else Some(subset.map(_.m(m)).sum)
          Seq(((ref, "a"), sum("ead_final")), ((ref, "b"), None),
            ((ref, "c"), disp.get(ref)), ((ref, "d"), sum("ead_final")),
            ((ref, "e"), sum("rwa_final")), ((ref, "f"), sum("expected_loss")))
        }.toMap
        Seq("equity" -> frameOf(sheetGrid, computed))
      }
    (slotSheets ++ equitySheet).toMap
  }
}

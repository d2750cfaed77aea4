package graft.rulebook

/** The sealed exposure-class vocabulary — the single production source of
  * truth every classification target and reporting class-key must be a
  * member of (reference `domain/enums.py:43-120` `ExposureClass`; CRR
  * Art. 112 / Art. 147, Basel 3.1 CRE20).
  *
  * Why a sealed set and not ad-hoc strings: an unmatched class key does
  * not raise anywhere in the pipeline — it zero-fills, so a breakdown row
  * silently sheds exposure while the independently-computed parent still
  * counts it (the reference's documented B2/B3 phantom-key lesson). Every
  * class→row map in the reporting estate is checked against THIS set by
  * the C4a discovery conformance (`ReportingClassKeysSpec`), and the
  * classifier's own target maps are sealed at [[graft.refbook.RefBook]]
  * object init.
  */
object ExposureClasses {

  /** Every `ExposureClass` member value (reference `domain/enums.py`). */
  val values: Set[String] = Set(
    "central_govt_central_bank", // Art. 112(a), CRE20.7-15
    "institution", // Art. 112(d), CRE20.16-21
    "corporate", // Art. 112(g), CRE20.22-25
    "corporate_sme", // turnover ceiling split
    "retail_mortgage", // Art. 112(h) retail secured on property
    "residential_mortgage", // SA RE-splitter secured child (Art. 125)
    "commercial_mortgage", // SA RE-splitter secured child (Art. 126)
    "retail_qrre", // CRE30.23-24
    "retail_other", // Art. 112(h)
    "specialised_lending", // slotting (CRE33)
    "equity", // Art. 112(p) / Art. 147(2)(e)
    "defaulted", // Art. 112(j) / Art. 127
    "pse", // Art. 112(c)
    "mdb", // Art. 112(e)
    "international_organisation", // Art. 112(f)
    "rgla", // Art. 112(b)
    "covered_bond", // Art. 112(l) / Art. 129
    "high_risk", // Art. 112(k) / Art. 128
    "other") // Art. 112(q) / Art. 134
}

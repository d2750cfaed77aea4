package graft.rulebook

/** The supervisory validation-rule catalogues as DATA, plus the formula
  * parser — the repo's port of the reference's catalogue machinery
  * (reference `reporting/validations/rules.py` load_rules /
  * `validations/evaluate.py` parse_expression): rules are published
  * records evaluated generically, not hand-written code.
  *
  * Two publisher grammars parse onto ONE AST (the reference's stated
  * design): the EBA writes `{C 08.01.a, r0070, c0020, s0013}` with
  * row/column scope hoisted into spreadsheet scope lists; the BoE writes
  * `{t: OF08.01.01.01, r: 0070, c: 0020, z: 0002}` with the sheet hoisted
  * into a `z:` member. Constructs beyond one comparison of two arithmetic
  * combinations of cell refs (if/then, where(...), sum-over-sheets,
  * enum-membership) are refused BY NAME — a skipped rule is an outcome
  * with a reason, never a silent pass (`evaluate.py` _UNSUPPORTED_MARKERS
  * discipline).
  */
object ValidationCatalogue {

  /** One catalogue record (the translated JSON fields).
    *
    * `prereqs` is the EBA prerequisite-table conjunction ("C 07.00.a and
    * C 07.00.b" → both must be reported for the rule to run at all —
    * reference `validations/scope.py::expand_rule` prerequisite gate).
    * `scopeGroups` carries the BoE per-TABLE scope(...) groups
    * (`rules.py::_parse_boe_scope`): `(table, rowsScope, rows, colsScope,
    * cols, sheetsScope, sheets)` — empty for EBA records, whose single
    * scope is the rowsScope..sheets fields. */
  final case class CatRecord(
      catalogue: String, id: String, severity: String, live: Boolean,
      tables: Seq[String], rowsScope: String, rows: Seq[String],
      colsScope: String, cols: Seq[String], sheetsScope: String,
      sheets: Seq[String], arithmetic: String, missing: String,
      formula: String, prereqs: Seq[String] = Nil,
      scopeGroups: Seq[(String, String, Seq[String], String, Seq[String], String, Seq[String])] = Nil)

  private def split(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(";").toSeq

  lazy val records: Seq[CatRecord] = ValidationCatalogueData.lines.map { ln =>
    val f = ln.split("\t", -1)
    require(f.length == 16, s"bad catalogue line: $ln")
    val groups = if (f(15).isEmpty) Nil else f(15).split("\\^").toSeq.map { g =>
      val p = g.split("~", -1)
      require(p.length == 7, s"bad scope group: $g")
      (p(0), p(1), split(p(2)), p(3), split(p(4)), p(5), split(p(6)))
    }
    CatRecord(f(0), f(1), f(2), f(3) == "1", split(f(4)), f(5), split(f(6)),
      f(7), split(f(8)), f(9), split(f(10)), f(11), f(12), f(13),
      split(f(14)), groups)
  }.toVector

  lazy val liveRecords: Seq[CatRecord] = records.filter(_.live)

  // ---- formula AST -----------------------------------------------------

  sealed trait Expr
  /** A cell reference; any coordinate may be absent (bound later from the
    * rule's scope lists or the instance's sheet). `dimFilter` carries a
    * dimensional filter text (e.g. the total-geography selector
    * `[CEG=eba_GA:x1]`) verbatim for the binder to interpret or refuse. */
  final case class CellRef(
      table: Option[String], row: Option[String], colId: Option[String],
      sheet: Option[String], dimFilter: Option[String]) extends Expr
  final case class Num(text: String) extends Expr
  final case class Bin(op: Char, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Abs(e: Expr) extends Expr
  /** Horizontal min/max over argument expressions — compiles to
    * least/greatest, whose NULL-skipping semantics are identical in
    * Spark and DuckDB (verified: both ignore NULL args, return NULL
    * only when every arg is NULL). The BoE writes one multi-row ref
    * (`max({t: X, r: 0020; 0030; …})`); the parser expands it into one
    * arg per row. */
  final case class Fn(name: String, args: Seq[Expr]) extends Expr

  /** The published where-filtered row sum (the v7520/v7536 families):
    * `sum(where({T, rNNN, cCOND, sS} OP flag){T, rNNN, cVAL, sS})` —
    * iterate the referenced template's open row axis, keep the rows
    * whose condition cell compares true against the literal, and sum
    * the value cell over them. `cond`/`value` carry the row WILDCARD
    * (`row = Some("NNN")`); the binder expands them over the emitted
    * leaf-row axis before compilation. */
  final case class WhereSum(op: String, flag: Num, cond: CellRef,
      value: CellRef) extends Expr

  /** One parsed comparison. */
  final case class Cmp(op: String, lhs: Expr, rhs: Expr)

  /** One parsed rule: optional `if` PRECONDITION comparisons (a
    * conjunction — every cond must hold for the rule to trigger) gating
    * the main comparisons (also a conjunction: the publishers write
    * `(X <= 1) and (X >= 0)` range assertions — each conjunct is
    * evaluated as its own instance). A rule whose precondition
    * evaluates false is NOT TRIGGERED — an outcome, never a silent
    * pass. The reference's evaluator refuses the conditional and
    * conjunction families by name (`_UNSUPPORTED_MARKERS`); the generic
    * compiler here evaluates them — every conjunct is the same
    * one-comparison grammar. */
  final case class ParsedRule(conds: Seq[Cmp], mains: Seq[Cmp]) {
    def cond: Option[Cmp] = conds.headOption
    def main: Cmp = mains.head
  }

  /** Constructs refused by name → Left(reason). */
  private val unsupportedMarkers: Seq[(String, String)] = Seq(
    "count(" -> "count_aggregate",
    "isnull" -> "isnull_predicate", "true()" -> "boolean_literal",
    " or " -> "boolean_disjunction",
    "empty(" -> "empty_function", " empty" -> "empty_literal",
    "not(" -> "negated_filter",
    " in " -> "enum_membership",
    "match(" -> "match_function")

  /** Parse one formula into an optionally-conditional rule, or a named
    * refusal. */
  def parseRule(formula: String): Either[String, ParsedRule] = {
    // `if A then B else true()` ≡ `if A then B` — drop the vacuous else
    // BEFORE marker checks so the true() literal marker cannot refuse it
    val trimmed = formula.trim.replaceAll("(?i)\\s+else\\s+true\\(\\)$", "")
    val low = trimmed.toLowerCase
    unsupportedMarkers.collectFirst {
      case (m, why) if low.contains(m) => why
    } match {
      case Some(why) => Left(why)
      case None => new Parser(trimmed).rule()
    }
  }

  /** Parse one formula into a single comparison, or a named refusal
    * (the pre-conditional entry point — a conditional rule is refused
    * here by name, matching the reference's evaluator surface). */
  def parse(formula: String): Either[String, Cmp] =
    parseRule(formula).flatMap { r =>
      if (r.conds.nonEmpty) Left("conditional_rule")
      else if (r.mains.size > 1) Left("boolean_conjunction")
      else Right(r.main)
    }

  /** Zero-pad a legacy 3-digit row/col code to the 4-digit DPM form
    * (older EBA rules write r090/c010 for r0090/c0010). */
  private def pad4(s: String): String = if (s.length >= 4) s else ("0" * (4 - s.length)) + s

  /** Recursive-descent parser for the shared grammar:
    * cmp := sum (=|==|!=|<=|>=|<|>) sum
    * sum := prod (('+'|'-') prod)*
    * prod := atom (('*'|'/') atom)*
    * atom := number['%'] | cellref | '(' sum ')' | '-' atom | 'abs(' sum ')'
    */
  private final class Parser(input: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

    def comparison(): Either[String, Cmp] =
      try {
        val c = cmp()
        ws()
        if (pos != input.length) fail(s"trailing input at $pos")
        Right(c)
      } catch { case e: IllegalArgumentException => Left(s"grammar:${e.getMessage}") }

    /** rule := 'if' cmpAnd 'then' cmpAnd | cmpAnd
      * cmpAnd := cmp ('and' cmp)* */
    def rule(): Either[String, ParsedRule] =
      try {
        ws()
        if (input.regionMatches(true, pos, "if ", 0, 3)) {
          pos += 3
          val cs = cmpAnd()
          ws()
          if (!input.regionMatches(true, pos, "then ", 0, 5))
            fail(s"'then' expected at $pos")
          pos += 5
          val ms = cmpAnd()
          ws()
          if (pos != input.length) fail(s"trailing input at $pos")
          Right(ParsedRule(cs, ms))
        } else {
          val ms = cmpAnd()
          ws()
          if (pos != input.length) fail(s"trailing input at $pos")
          Right(ParsedRule(Nil, ms))
        }
      } catch { case e: IllegalArgumentException => Left(s"grammar:${e.getMessage}") }

    private def cmpAnd(): Seq[Cmp] = {
      val out = Seq.newBuilder[Cmp]
      out += cmp()
      ws()
      while (input.regionMatches(true, pos, "and ", 0, 4)) {
        pos += 4
        out += cmp()
        ws()
      }
      out.result()
    }

    private def cmp(): Cmp = {
      // tolerate a fully-parenthesized comparison — `if (A > B) then
      // (C = D)` (the BoE cross-template conditional family). A '(' is
      // ambiguous (it may group arithmetic), so try-and-backtrack.
      ws()
      if (peek == '(') {
        val save = pos
        pos += 1
        try {
          val c = cmpBare(); ws()
          if (peek != ')') fail("')' expected")
          pos += 1
          return c
        } catch { case _: IllegalArgumentException => pos = save }
      }
      cmpBare()
    }

    private def cmpBare(): Cmp = {
      val l = sum()
      ws()
      val op = cmpOp()
      val r = sum()
      Cmp(op, l, r)
    }

    private def cmpOp(): String = {
      val ops = Seq("==", "!=", ">=", "<=", "=", "<", ">")
      ops.find(o => input.startsWith(o, pos)) match {
        case Some(o) => pos += o.length; o
        case None => fail(s"comparison op expected at $pos")
      }
    }

    private def sum(): Expr = {
      var e = prod()
      ws()
      while (peek == '+' || (peek == '-' && !input.startsWith("->", pos))) {
        val op = peek; pos += 1
        e = Bin(op, e, prod()); ws()
      }
      e
    }

    private def prod(): Expr = {
      var e = atom()
      ws()
      while (peek == '*' || peek == '/') {
        val op = peek; pos += 1
        e = Bin(op, e, atom()); ws()
      }
      e
    }

    private def atom(): Expr = {
      ws()
      peek match {
        case '-' => pos += 1; Neg(atom())
        case '+' => pos += 1; atom()
        case '(' =>
          pos += 1; val e = sum(); ws()
          if (peek != ')') fail(s"')' expected at $pos"); pos += 1; e
        case '{' => cellref()
        case 'a' | 'A' if input.regionMatches(true, pos, "abs(", 0, 4) =>
          pos += 4; val e = sum(); ws()
          if (peek != ')') fail(s"')' expected at $pos"); pos += 1; Abs(e)
        case 'm' | 'M' if input.regionMatches(true, pos, "min(", 0, 4) ||
            input.regionMatches(true, pos, "max(", 0, 4) =>
          val name = input.substring(pos, pos + 3).toLowerCase
          pos += 4
          val args = Seq.newBuilder[Expr]
          args += sum(); ws()
          while (peek == ',') { pos += 1; args += sum(); ws() }
          if (peek != ')') fail(s"')' expected at $pos"); pos += 1
          // the BoE multi-row shorthand: one ref whose r: member lists
          // rows expands to one argument per row
          Fn(name, args.result().flatMap {
            case c: CellRef if c.row.exists(_.contains(";")) =>
              c.row.get.split(";").toSeq.map(r => c.copy(row = Some(r)))
            case e => Seq(e)
          })
        // sum-over-sheets: sum({ref, (sNNN)}) / sum({ref, (sA-B)}) — the
        // published cross-template shape (v0350_m family). The inner ref
        // carries the open or ranged sheet axis as a sheet MARKER; any
        // other sum( body is a named refusal.
        case 's' | 'S' if input.regionMatches(true, pos, "sum", 0, 3) =>
          pos += 3; ws()
          if (peek != '(') fail(s"'(' expected at $pos")
          pos += 1; ws()
          if (input.regionMatches(true, pos, "where", 0, 5)) {
            // sum(where({ref} OP flag){ref}) — the row-filtered sum
            pos += 5; ws()
            if (peek != '(') fail("where_scope_complex")
            pos += 1
            val c = cmpBare(); ws()
            if (peek != ')') fail("where_scope_complex")
            pos += 1; ws()
            val v = cellref(); ws()
            if (peek != ')') fail("where_scope_complex")
            pos += 1
            (c, v) match {
              case (Cmp(op, cr: CellRef, n: Num), vr: CellRef) =>
                WhereSum(if (op == "==") "=" else op, n, cr, vr)
              case _ => fail("where_scope_complex")
            }
          } else {
            if (peek != '{') fail("sum_scope_complex")
            val e = cellref(); ws()
            if (peek != ')') fail("sum_scope_complex")
            pos += 1; e
          }
        case c if c.isDigit || c == '.' => number()
        case c => fail(s"unexpected '$c' at $pos")
      }
    }

    private def number(): Expr = {
      val start = pos
      while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
      var txt = input.substring(start, pos)
      ws()
      if (peek == '%') { pos += 1; txt = s"($txt / 100.0)" }
      Num(txt)
    }

    private def cellref(): Expr = {
      if (peek != '{') fail(s"'{' expected at $pos")
      val end = input.indexOf('}', pos)
      if (end < 0) fail(s"unterminated cell ref at $pos")
      val body = input.substring(pos + 1, end)
      pos = end + 1
      // dimensional filter sub-bracket may contain commas: extract first
      var rest = body
      var dim: Option[String] = None
      val db = rest.indexOf('[')
      if (db >= 0) {
        val de = rest.indexOf(']', db)
        if (de < 0) fail("unterminated dimensional filter")
        dim = Some(rest.substring(db, de + 1))
        rest = rest.substring(0, db) + rest.substring(de + 1)
      }
      var table: Option[String] = None
      var row: Option[String] = None
      var colId: Option[String] = None
      var sheet: Option[String] = None
      rest.split(",").map(_.trim).filter(_.nonEmpty).foreach { p =>
        val kv = p.split(":", 2).map(_.trim)
        if (kv.length == 2) kv(0) match {          // BoE keyed members
          case "t" => table = Some(kv(1))
          case "r" => // a semicolon list is legal ONLY inside min/max
            // (expanded there); elsewhere it simply never binds
            row = Some(kv(1).split(";").map(c => pad4(c.trim)).mkString(";"))
          case "c" => colId = Some(pad4(kv(1)))
          case "z" => // a semicolon list names particular sheets (a
            // STRICT marker: every listed sheet must bind or the
            // coordinate is unbindable); a single code passes through
            val codes = kv(1).split(";").map(c => pad4(c.trim)).toSeq
            sheet = Some(
              if (codes.size == 1) codes.head else "L:" + codes.mkString(":"))
          case "filter" => dim = Some(kv(1))
          case "dv" | "seq" | "id" | "f" | "fv" => ()   // raw-grammar noise
          case other => fail(s"unknown member '$other'")
        } else p match {                            // EBA positional members
          case m if m.matches("r\\d{3,4}") => row = Some(pad4(m.substring(1)))
          case m if m.matches("(?i)\\(?rNNN\\)?") => row = Some("NNN")
          case m if m.matches("c\\d{3,4}") => colId = Some(pad4(m.substring(1)))
          case m if m.matches("s\\d{3,4}") => sheet = Some(pad4(m.substring(1)))
          // open sheet axis "(sNNN)" -> sum over every sheet; ranged
          // axis "(s0003-0004)" -> sum over the sheets in the range
          case m if m.matches("\\(s\\d{3,4}-\\d{3,4}\\)") =>
            val Array(a, b) = m.stripPrefix("(s").stripSuffix(")").split("-")
            sheet = Some(s"R:${pad4(a)}:${pad4(b)}")
          case m if m.matches("\\(s.*\\)") => sheet = Some("*")
          case m => table = Some(m)
        }
      }
      CellRef(table, row, colId, sheet, dim)
    }
  }

  /** All cell refs in an expression tree. */
  def refs(e: Expr): Seq[CellRef] = e match {
    case c: CellRef => Seq(c)
    case w: WhereSum => Seq(w.cond, w.value)
    case Bin(_, l, r) => refs(l) ++ refs(r)
    case Neg(x) => refs(x)
    case Abs(x) => refs(x)
    case Fn(_, args) => args.flatMap(refs)
    case _: Num => Nil
  }
}

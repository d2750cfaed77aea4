package graft.rulebook

/** Loader and matcher for externally-authored conformance decision tables
  * (reference `tests/conformance/table.py` + `classification_table.toml`):
  * a TOML document holding, per asserted output field, an ordered rule
  * list evaluated top-down FIRST MATCH WINS against a generated input
  * combination. A combination matching no rule is a MISS (a hard finding,
  * never a default); `[[exclusion]]` sections carve out combinations the
  * rule-space generates but the domain does not admit.
  *
  * The matcher knows nothing about the engine — pure data plus matching —
  * so an engine change can never quietly change what the table asserts.
  *
  * Rule grammar:
  * {{{
  * [[class_rule]]
  * verdict = "sovereign"
  * citation = "..."            # mandatory provenance
  * [class_rule.when]           # absent dimension = wildcard;
  * sovereign_listed = true     # list value = membership test
  * cqs = [1, 2]
  * }}}
  */
object ConformanceTable {

  final case class Rule(
      verdict: String, citation: String, when: Map[String, Set[String]])

  final case class Decision(field: String, verdict: Option[String])

  final case class Table(
      fields: Map[String, Vector[Rule]],
      exclusions: Vector[Map[String, Set[String]]]) {

    /** Is this combination carved out of the asserted space? */
    def excluded(combo: Map[String, Any]): Boolean =
      exclusions.exists(ex => matches(ex, combo))

    /** First-match-wins verdict for one field; None = MISS. */
    def verdict(field: String, combo: Map[String, Any]): Option[String] =
      fields(field).find(r => matches(r.when, combo)).map(_.verdict)

    private def matches(when: Map[String, Set[String]], combo: Map[String, Any]): Boolean =
      when.forall { case (dim, allowed) =>
        combo.get(dim).exists(v => allowed.contains(norm(v)))
      }
  }

  /** Normalise scalar dimension values to comparable strings (TOML
    * numbers parse as Double; combination values may be Int/Long). */
  private def norm(v: Any): String = v match {
    case d: Double if d.isWhole => d.toLong.toString
    case other => other.toString
  }

  /** Load a table asserting the given fields; `<field>_rule` sections must
    * exist, every rule carries a verdict + citation. */
  def load(text: String, fields: Seq[String]): Table = {
    val doc = Toml.parse(text)
    def asWhen(m: Any): Map[String, Set[String]] = m match {
      case t: Map[_, _] => t.map { case (k, v) =>
        val allowed: Set[String] = v match {
          case xs: Vector[_] => xs.map(norm).toSet
          case one => Set(norm(one))
        }
        k.toString -> allowed
      }.toMap
      case other => throw new IllegalArgumentException(s"bad when-table: $other")
    }
    val ruleLists = fields.map { f =>
      val section = s"${f}_rule"
      val rules = doc.get(section) match {
        case Some(xs: Vector[_]) => xs.map {
          case rt: Map[_, _] =>
            val r = rt.asInstanceOf[Map[String, Any]]
            val verdict = r.getOrElse("verdict",
              throw new IllegalArgumentException(s"$section rule missing verdict")).toString
            val citation = r.getOrElse("citation",
              throw new IllegalArgumentException(
                s"$section rule '$verdict' missing citation")).toString
            Rule(verdict, citation,
              r.get("when").map(asWhen).getOrElse(Map.empty))
          case other => throw new IllegalArgumentException(s"bad rule: $other")
        }
        case _ => throw new IllegalArgumentException(s"missing [[${section}]] list")
      }
      f -> rules
    }.toMap
    val exclusions = doc.get("exclusion") match {
      case Some(xs: Vector[_]) => xs.map {
        case et: Map[_, _] =>
          asWhen(et.asInstanceOf[Map[String, Any]].getOrElse("when", Map.empty[String, Any]))
        case other => throw new IllegalArgumentException(s"bad exclusion: $other")
      }
      case _ => Vector.empty
    }
    Table(ruleLists, exclusions)
  }

  /** Coverage census over a combination space (reference `table.py`
    * reports combinations generated / excluded / verdicted / missed and
    * rules never matched — coverage as numbers, not vibes). */
  final case class Coverage(
      generated: Int, excluded: Int, verdicted: Int, missed: Int,
      neverMatched: Map[String, Seq[String]])

  def coverage(
      table: Table, field: String, combos: Seq[Map[String, Any]]): Coverage = {
    val (ex, in) = combos.partition(table.excluded)
    val verdicts = in.map(c => table.verdict(field, c))
    // matched rules are keyed by position, not citation text — two rules
    // sharing a citation must be censused independently
    val rules = table.fields(field)
    val matchedIdx = in.flatMap { c =>
      val i = rules.indexWhere(r =>
        r.when.forall { case (d, a) => c.get(d).exists(v => a.contains(norm(v))) })
      if (i >= 0) Some(i) else None
    }.toSet
    Coverage(
      generated = combos.size,
      excluded = ex.size,
      verdicted = verdicts.count(_.isDefined),
      missed = verdicts.count(_.isEmpty),
      neverMatched = Map(field -> rules.zipWithIndex
        .collect { case (r, i) if !matchedIdx.contains(i) =>
          s"${r.verdict}: ${r.citation}" }))
  }
}

package graft.refbook

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

import graft.rulebook.ExposureClasses

/** C4a — every exposure-class collection in the reporting estate is keyed
  * on the sealed vocabulary (reference
  * `tests/conformance/test_reporting_class_keys.py`).
  *
  * DISCOVERS the class collections rather than listing them: walk every
  * object compiled into the reporting packages (`graft.refbook`,
  * `graft.reporting`), pull out each homogeneous group of
  * exposure-class-like strings, and check the whole estate in one
  * assertion — anchored to [[graft.rulebook.ExposureClasses.values]],
  * never to a hand-written list of class strings (the reference's B2/B3
  * lesson: the phantom `C02_00_SA_CLASS_MAP` passed its own test because
  * the test used the same invented strings the map did).
  *
  * Why discovery and not enumeration: a map added tomorrow is checked
  * without anyone remembering to add it here. The heuristic is stated,
  * bounded, and guarded against becoming vacuous — a discovery that finds
  * nothing would pass silently, which is the same failure class the check
  * exists to prevent.
  *
  * An EMPTY class group is not a violation; the assertion is "no member
  * that is not a vocabulary value", not "no empty group". Row-key
  * vocabularies that merely reuse several class names (`retail_sme`,
  * `mortgage_sme`, `sl_slotting`, `ciu_look_through` in the C 09 / C 08
  * row maps) sit below the ratio floor and are deliberately not checked.
  */
object ClassKeyDiscovery {
  val ClassValues: Set[String] = ExposureClasses.values

  /** A SLOT (a map's keys, a map's values, a tuple position, a record
    * field) is a candidate exposure-class axis when it holds at least
    * MinHits real class values and they are at least MinRatio of it.
    * The ratio floor separates a class axis from the neighbouring
    * row-key vocabularies; calibrated (like the reference's) to stay
    * BELOW the shape the check exists to catch — a planted phantom map
    * with 2 invented keys among 17 real ones (0.89) — which
    * `test_the_check_catches_a_planted_phantom_key` asserts, not argues.
    */
  val MinHits = 2
  val MinRatio = 0.8

  /** How far structural recursion goes: everything in this estate is a
    * map, a sequence of tuples, or a sequence of small case classes. */
  val MaxDepth = 3

  /** Every top-level or nested Scala object compiled into `pkg` in the
    * MAIN source tree (the code-source that owns [[RefBook]]), by listing
    * the package directory's `*$.class` files — genuine discovery: an
    * object added tomorrow is found without registration. */
  def moduleInstances(pkg: String): Seq[(String, AnyRef)] = {
    val loc = new File(
      RefBook.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
    val dir = new File(loc, pkg.replace('.', '/'))
    Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith("$.class"))
      .map(f => pkg + "." + f.getName.stripSuffix(".class"))
      .sorted
      .flatMap { name =>
        try {
          val cls = Class.forName(name)
          val moduleField = cls.getField("MODULE$")
          Some(name -> moduleField.get(null))
        } catch { case _: Throwable => None }
      }
  }

  /** Yield `(origin, members)` — one exposure-class axis per collection
    * in one object's fields (vals AND lazy vals, via the accessor method
    * when one exists so lazy vals initialise). A collection has AT MOST
    * ONE class axis, so the best-fitting slot wins and the rest are left
    * alone — otherwise the value side of every `class -> row_key` map
    * would be checked as if it were a class axis. */
  def classGroupsIn(namespace: Seq[(String, Any)],
      origin: String): Seq[(String, Set[String])] =
    namespace.flatMap { case (attr, value) =>
      bestClassSlot(stringGroups(value)).map { case (suffix, members) =>
        (s"$origin::$attr$suffix", members)
      }
    }

  def fieldsOf(module: AnyRef): Seq[(String, Any)] = {
    val cls = module.getClass
    // Scala 2.13 compiles object vals to STATIC fields on the module
    // class, so statics are exactly what we walk (MODULE$ excluded).
    val fields = Iterator.iterate[Class[_]](cls)(_.getSuperclass)
      .takeWhile(c => c != null && c != classOf[Object])
      .flatMap(_.getDeclaredFields.toSeq).toSeq
      .filterNot(_.getName == "MODULE$")
      .filterNot(_.getName.contains("bitmap"))
    fields.flatMap { f =>
      val name = f.getName.stripSuffix(" ") // Scala private vals keep a trailing space in some encodings
      try {
        val viaAccessor =
          try {
            val m = cls.getDeclaredMethod(name)
            m.setAccessible(true)
            Some(m.invoke(module))
          } catch { case _: NoSuchMethodException => None }
        val v = viaAccessor.getOrElse { f.setAccessible(true); f.get(module) }
        if (v == null) None else Some(name -> v)
      } catch { case _: Throwable => None }
    }
  }

  def discover(pkgs: Seq[String]): Seq[(String, Set[String])] =
    pkgs.flatMap(pkg => moduleInstances(pkg).flatMap { case (name, module) =>
      classGroupsIn(fieldsOf(module), name)
    })

  // ---- structural slot extraction ----------------------------------

  private def isTuple(p: Product): Boolean =
    p.getClass.getName.startsWith("scala.Tuple")

  /** Every structural SLOT of `value` that holds strings. A map
    * contributes its key set and the slots of its values; any other
    * collection contributes the slots of its elements. Slots are kept
    * SEPARATE — a tuple position, a record field and the flattened
    * contents of a nested collection are three different vocabularies,
    * and merging them is what makes a row-key vocabulary look like a
    * broken class axis. */
  def stringGroups(value: Any): Seq[(String, Set[String])] = value match {
    case m: scala.collection.Map[_, _] =>
      val keys = m.keysIterator.collect { case s: String => s }.toSet
      val keySlot = if (keys.nonEmpty) Seq(".keys" -> keys) else Seq.empty
      keySlot ++ elementSlots(m.valuesIterator.toList, depth = 1)
        .map { case (s, g) => (".values" + s, g) }
    case it: Iterable[_] => elementSlots(it.toList, depth = 0)
    case arr: Array[_] => elementSlots(arr.toList, depth = 0)
    case _ => Seq.empty
  }

  /** Slots over a collection of same-shaped elements. Tuple positions are
    * split only at the top level: splitting an inner tuple of class
    * values positionally would let a clean position out-score, and so
    * hide, the broken union it belongs to. Record (case-class) fields are
    * split at any depth up to MaxDepth because a record field IS a
    * distinct vocabulary wherever it appears. */
  private def elementSlots(items: List[Any],
      depth: Int): Seq[(String, Set[String])] = {
    if (depth > MaxDepth) return Seq.empty
    val out = Seq.newBuilder[(String, Set[String])]
    val direct = items.collect { case s: String => s }.toSet
    if (direct.nonEmpty) out += ("" -> direct)
    val nested = items.flatMap {
      case c: Iterable[_] => c.iterator.collect { case s: String => s }
      case a: Array[_] => a.iterator.collect { case s: String => s }
      case _ => Nil
    }.toSet
    if (nested.nonEmpty) out += ("[]" -> nested)
    if (depth == 0) {
      val rows = items.collect { case p: Product if isTuple(p) => p }
      val maxArity = if (rows.isEmpty) 0 else rows.map(_.productArity).max
      for (pos <- 0 until maxArity) {
        val cells = rows.filter(_.productArity > pos).map(_.productElement(pos))
        elementSlots(cells, depth + 1).foreach { case (s, g) =>
          out += (s"[$pos]$s" -> g)
        }
      }
    }
    val records = items.collect {
      case p: Product if !isTuple(p) && !p.isInstanceOf[Iterable[_]] &&
          !p.isInstanceOf[Option[_]] => p
    }
    val fieldNames =
      records.flatMap(_.productElementNames.toList).distinct.sorted
    for (name <- fieldNames) {
      val vals = records.flatMap { r =>
        r.productElementNames.zip(r.productIterator)
          .collectFirst { case (n, v) if n == name => v }
      }
      elementSlots(vals, depth + 1).foreach { case (s, g) =>
        out += (s".$name$s" -> g)
      }
    }
    out.result()
  }

  def hitRatio(members: Set[String]): Double =
    if (members.isEmpty) 0.0
    else members.count(ClassValues).toDouble / members.size

  def isClassGroup(members: Set[String]): Boolean = {
    val hits = members.count(ClassValues)
    hits >= MinHits && hits >= MinRatio * members.size
  }

  def bestClassSlot(
      slots: Seq[(String, Set[String])]): Option[(String, Set[String])] = {
    val candidates = slots.filter { case (_, m) => isClassGroup(m) }
    if (candidates.isEmpty) None
    else Some(candidates.maxBy { case (_, m) =>
      (hitRatio(m), m.count(ClassValues))
    })
  }
}

class ReportingClassKeysSpec extends AnyFunSuite {
  import ClassKeyDiscovery._

  private val packages = Seq("graft.refbook", "graft.reporting")

  /** Anti-vacuity floors: if discovery silently stops finding collections
    * — a renamed package, a heuristic that drifts — these fail rather
    * than letting the file go green on nothing. */
  private val MinGroups = 10
  private val MinDistinctClasses = 12

  test("every reporting class collection is keyed on the sealed vocabulary") {
    val groups = discover(packages)
    val offenders = groups.collect {
      case (origin, members) if !members.subsetOf(ClassValues) =>
        s"$origin: ${(members -- ClassValues).toSeq.sorted.mkString(", ")}"
    }
    assert(offenders.isEmpty,
      "reporting collections keyed on strings outside the exposure-class " +
        "vocabulary:\n  " + offenders.sorted.mkString("\n  "))
  }

  test("the discovery is not vacuous") {
    val groups = discover(packages)
    val covered = groups.iterator.flatMap(_._2).toSet & ClassValues
    info(s"C4a discovery: ${groups.size} group(s) across " +
      s"${groups.map(_._1.split("::").head).distinct.size} object(s), " +
      s"${covered.size} distinct classes")
    groups.sortBy(_._1).foreach { case (o, m) =>
      info(f"  $o (${hitRatio(m)}%.2f, ${m.size} members)")
    }
    assert(groups.size >= MinGroups,
      s"only ${groups.size} class group(s) discovered")
    assert(covered.size >= MinDistinctClasses,
      s"only ${covered.toSeq.sorted} covered")
  }

  test("the check catches a planted phantom key") {
    // The historical defect the detector was built for: the reference's
    // C02_00_SA_CLASS_MAP as it was when two invented strings sat among
    // the real class values — keyed on names no pipeline run produces,
    // whose own test used the same invented names and so proved nothing.
    val planted = Seq("C02_00_SA_CLASS_MAP" -> Map(
      "central_government" -> "0070", // phantom — real value is central_govt_central_bank
      "rgla" -> "0080", "pse" -> "0090", "mdb" -> "0100",
      "international_organisation" -> "0110", "institution" -> "0120",
      "corporate" -> "0130", "corporate_sme" -> "0130",
      "specialised_lending" -> "0130",
      "retail" -> "0140", // phantom — real values are retail_other / retail_qrre
      "retail_qrre" -> "0140", "retail_mortgage" -> "0150",
      "residential_mortgage" -> "0150", "commercial_mortgage" -> "0150",
      "defaulted" -> "0160", "high_risk" -> "0170",
      "covered_bond" -> "0180", "equity" -> "0210", "other" -> "0211"))
    val found = classGroupsIn(planted, "planted").collect {
      case (origin, members) if !members.subsetOf(ClassValues) =>
        origin -> (members -- ClassValues).toSeq.sorted
    }
    assert(found ==
      Seq("planted::C02_00_SA_CLASS_MAP.keys" ->
        Seq("central_government", "retail")), found.toString)
  }
}

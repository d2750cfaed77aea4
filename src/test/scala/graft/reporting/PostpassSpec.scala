package graft.reporting

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The COREP post-execute passes (reference `reporting/corep/postpass.py`):
  * sign convention, null-empty-row rendering, the provisions ladder and
  * the after-all-CRM fill, each on a toy grid frame.
  */
class PostpassSpec extends SparkSpec {
  import spark.implicits._

  test("negateDeductionCols: negates, normalises -0.0 to +0.0, keeps " +
    "null, ignores absent columns") {
    val grid = Seq(
      ("0010", Some(12.5), Some(3.0)),
      ("0020", Some(0.0), None),
      ("0030", None, Some(1.0)))
      .toDF("row_ref", "c0081", "c0090")
    val out = Postpass.negateDeductionCols(grid, Set("c0081", "c0082"))
      .orderBy("row_ref").collect()
    assert(out(0).getDouble(1) === -12.5)
    val zero = out(1).getDouble(1)
    assert(zero === 0.0 &&
      java.lang.Double.doubleToRawLongBits(zero) == 0L) // +0.0, not -0.0
    assert(out(2).isNullAt(1))
    // non-target column untouched
    assert(out(0).getDouble(2) === 3.0)
  }

  test("nullEmptyRows: inert refs and zero-count rows null out, " +
    "populated and keep rows survive") {
    val grid = Seq(
      ("0010", Some(3L), Some(1.0)),  // populated
      ("0020", Some(0L), Some(0.0)),  // bound but empty subset
      ("0030", None, Some(0.0)),      // axis row that matched nothing
      ("0040", Some(5L), Some(2.0)),  // inert by catalogue
      ("0050", Some(0L), Some(4.0)))  // empty but inflow-kept
      .toDF("row_ref", "n_rows", "c0010")
    val out = Postpass.nullEmptyRows(grid, "n_rows", Seq("c0010"),
        inertRefs = Set("0040"), keep = Set("0050"))
      .orderBy("row_ref").collect()
    assert(out(0).getDouble(2) === 1.0)
    assert(out(1).isNullAt(2))
    assert(out(2).isNullAt(2))
    assert(out(3).isNullAt(2)) // inert nulls even with a count
    assert(out(4).getDouble(2) === 4.0)
  }

  test("provisionsPostfix: swaps a ~0 base to the fallback carrier, " +
    "keeps a non-degenerate base and a null base") {
    val grid = Seq(
      ("0010", Some(0.0), 7.5),
      ("0020", Some(3.25), 9.0),
      ("0030", None, 4.0))
      .toDF("row_ref", "c0055", "fb")
    val out = Postpass.provisionsPostfix(grid, "c0055", "fb")
      .orderBy("row_ref").collect()
    assert(out(0).getDouble(1) === 7.5)  // degenerate base -> carrier
    assert(out(1).getDouble(1) === 3.25) // granular base kept
    assert(out(2).isNullAt(1))           // inert row stays null
  }

  test("afterAllCrm: base plus adds minus subs on positive magnitudes, " +
    "null base keeps target null") {
    val grid = Seq(
      ("0010", Some(100.0), Some(10.0), Some(4.0), Some(0.0)),
      ("0020", None, None, None, None))
      .toDF("row_ref", "c0090", "c0101", "c0102", "c0104")
    val out = Postpass.afterAllCrm(grid, "c0104", "c0090",
        addCols = Seq("c0101"), subCols = Seq("c0102"))
      .orderBy("row_ref").collect()
    assert(out(0).getDouble(4) === 106.0)
    assert(out(1).isNullAt(4))
  }
}

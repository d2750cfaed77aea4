package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid-property pins for the kernels' degenerate-input guards (the
  * zero-EAD / expired-option arithmetic the stress battery caught):
  * the guards must change NOTHING away from the degenerate point, and
  * the degenerate point must take the documented regulatory value.
  */
class KernelGuardSpec extends SparkSpec {

  private def eval(cols: (String, org.apache.spark.sql.Column)*): Map[String, Double] = {
    val row = spark.range(1).select(cols.map { case (n, c) => c.as(n) }: _*).head()
    cols.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getDouble(i) }.toMap
  }

  test("SME supporting factor: bounds, monotony, zero-owed limit (Art. 501)") {
    val grid = Seq(0.0, 1.0, 1000.0, 2500000.0, 2500001.0, 1e7, 1e9, 1e12)
    val vals = grid.map(owed =>
      eval("f" -> IrbKernel.smeSupportingFactor(lit(owed)))("f"))
    // zero owed takes the first-band limit exactly — never NaN, never a crash
    assert(vals.head == 0.7619)
    // the blend lives in [0.7619, 0.85] and is monotone non-decreasing
    vals.foreach(v => assert(v >= 0.7619 && v <= 0.85, s"factor $v"))
    vals.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-15) }
    // at or below the threshold the factor IS the first-band rate
    assert(vals(3) == 0.7619)
    // far beyond the threshold it approaches (but never reaches) 0.85
    assert(vals.last > 0.8499 && vals.last < 0.85)
  }

  test("supervisory delta: |delta| <= 1 everywhere; degenerate options take the linear delta (Art. 279a)") {
    def delta(strike: Any, under: Any, days: Int, long: Boolean,
        opt: String): Double =
      eval("d" -> SaCcrKernel.supervisoryDelta(lit(long), lit(opt),
        lit(strike).cast("double"), lit(under).cast("double"), lit(days),
        lit(0.5)))("d")
    // Black region: bounded, correctly signed
    for (k <- Seq(50.0, 100.0, 200.0); p <- Seq(50.0, 100.0, 200.0);
        d <- Seq(30, 365, 3650)) {
      val c = delta(k, p, d, long = true, "call")
      val pt = delta(k, p, d, long = true, "put")
      assert(c >= 0.0 && c <= 1.0, s"call delta $c at k=$k p=$p d=$d")
      assert(pt >= -1.0 && pt <= 0.0, s"put delta $pt at k=$k p=$p d=$d")
    }
    // deep ITM call → ~1, deep OTM → ~0
    assert(delta(1.0, 1000.0, 365, long = true, "call") > 0.99)
    assert(delta(1000.0, 1.0, 365, long = true, "call") < 0.01)
    // degenerate rows (expired, zero/negative strike or price) fall back
    // to the linear ±1 — the pre-guard shape was a job-killing
    // DIVIDE_BY_ZERO (t=0) or log-of-zero
    for ((k, p, d) <- Seq((100.0, 100.0, 0), (0.0, 100.0, 365),
        (100.0, 0.0, 365), (-5.0, 100.0, 365))) {
      assert(delta(k, p, d, long = true, "call") == 1.0, s"($k,$p,$d)")
      assert(delta(k, p, d, long = false, "put") == -1.0, s"($k,$p,$d)")
    }
    // null strike / underlying keep the linear delta (pre-existing arm)
    assert(delta(null, 100.0, 365, long = true, "call") == 1.0)
    assert(delta(100.0, null, 365, long = false, "call") == -1.0)
    // null maturity days ALSO takes the linear delta: pre-fix the guard
    // condition itself evaluated NULL (three-valued logic), the row fell
    // into the Black branch, and the NULL delta was silently dropped by
    // the add-on sum — understating the add-on
    def deltaNullDays(long: Boolean, opt: String): Double =
      eval("d" -> SaCcrKernel.supervisoryDelta(lit(long), lit(opt),
        lit(100.0), lit(100.0), lit(null).cast("int"), lit(0.5)))("d")
    assert(deltaNullDays(long = true, "call") == 1.0)
    assert(deltaNullDays(long = false, "put") == -1.0)
  }
}

package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static vector kernels for the similarity/ANN operators — the codegen
  * replacement for the interpreted higher-order-function stacks
  * (`aggregate`/`zip_with`/`transform` lambdas evaluate PER ELEMENT in
  * interpreted mode; at the similarity corpus tier the 128-dim decimal
  * dot products and per-vector sign packs dominated every stage, the
  * same defect class the round-18 text-hash kernels removed from the
  * minhash tier).
  *
  * Every kernel replicates its HOF predecessor BIT-FOR-BIT, including
  * the engine-portable decimal arithmetic and the null semantics —
  * `VectorParitySpec` pins equality on degenerate shapes (short/empty/
  * mismatched-length vectors, null elements, zero vectors), and the
  * q64/q65/q71/q74/q119/q173 DuckDB oracles re-verify end to end, so
  * the swap is a pure execution-strategy change:
  *
  *  - decimal dot / squared distance: each per-element double product is
  *    cast to DECIMAL(38,14) exactly as Spark's `Cast` does (string
  *    round-trip through DECIMAL128, then HALF_UP to scale 14), folded
  *    with the exact per-step (38,13) rounding Spark's decimal Add
  *    applies inside the aggregate tree, final value converted to
  *    double — value-identical to the `aggregate(zip_with(...))` tree
  *    it replaces;
  *  - a null element or a length mismatch yields NULL (zip_with pads
  *    the shorter array with null; null poisons the decimal fold);
  *  - sign packs mirror the `aggregate(sequence(lo, hi), acc*2+bit)`
  *    fold: 1-based component indexing, out-of-range or null component
  *    packs bit 0 (the `try_element_at >= 0` three-valued `when`).
  */
object VectorKernels {

  private val Mc128 = MathContext.DECIMAL128

  /** Spark `Cast(double -> DECIMAL(38,14))` replica: scala BigDecimal's
    * Double.toString round-trip at DECIMAL128, then HALF_UP to scale 14.
    * ANSI mode errors on NaN/Infinity; so does this. */
  private def toDec14(d: Double): JBigDecimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      throw new ArithmeticException(
        s"cannot cast $d to DECIMAL(38,14) (ANSI)")
    new JBigDecimal(java.lang.Double.toString(d), Mc128)
      .setScale(14, RoundingMode.HALF_UP)
  }

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** The HOF fold's per-step merge: Spark's decimal Add on
    * (38,14)+(38,14) caps the result at (38,13) — HALF_UP on the 14th
    * decimal at EVERY accumulation step (allowPrecisionLoss default) —
    * and the fold's `.cast(38,14)` only restores the scale losslessly.
    * The kernel replicates that per-step rounding exactly; VALUES are
    * therefore bit-identical to the production tree as it has always
    * computed (deterministic in array order; the ~1e-13-grain step
    * rounding is the same one the oracles' q6/dsum quantisation has
    * always absorbed). */
  private def addStep(acc: JBigDecimal, term: JBigDecimal): JBigDecimal =
    acc.add(term).setScale(13, RoundingMode.HALF_UP)

  /** Decimal dot product — bit-identical to
    * `aggregate(zip_with(a,b,·*·),0,(acc,v)=>(acc+v).cast)`; null on
    * length mismatch or any null element (the zip_with null-pad
    * semantics). */
  def dotExact(a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = addStep(acc, toDec14(elem(a, i, aFloat) * elem(b, i, bFloat)))
      i += 1
    }
    acc.doubleValue()
  }

  /** Decimal squared L2 distance; same fold and null rules. */
  def sqDistExact(a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, aFloat) - elem(b, i, bFloat)
      acc = addStep(acc, toDec14(d * d))
      i += 1
    }
    acc.doubleValue()
  }

  /** Plain IEEE double dot product, left-to-right accumulation — the
    * internal-ranking fold (`aggregate(zip_with(a*b), 0.0, +)`), same
    * order therefore bit-identical; same null rules. */
  def dotPlain(a: ArrayData, aFloat: Boolean,
      b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    acc
  }

  /** MSB-first sign pack of components lo..lo+n-1 (1-based):
    * `aggregate(sequence(lo, lo+n-1), 0L, acc*2 + (elem >= 0))` with the
    * try_element_at semantics — out-of-range or null component packs 0. */
  def signPack(v: ArrayData, vFloat: Boolean, lo: Int, n: Int): Long = {
    val len = v.numElements()
    var acc = 0L
    var j = 0
    while (j < n) {
      val idx = lo - 1 + j // 0-based
      val bit =
        if (idx >= len || idx < 0 || v.isNullAt(idx)) 0L
        else if (elem(v, idx, vFloat) >= 0) 1L
        else 0L
      acc = acc * 2 + bit
      j += 1
    }
    acc
  }

  /** Per-band packed sign keys: band b's key packs components
    * b*rows+1 .. b*rows+rows (1-based, LSB = first component). The
    * packed long is an INJECTIVE image of the former "0101…" string key
    * (bit j == char j), so bucket partitions — and therefore candidate
    * sets — are identical while the key never materialises a string. */
  def signBandKeys(v: ArrayData, vFloat: Boolean,
      bands: Int, rows: Int): ArrayData = {
    require(rows < 63, s"sign band rows ($rows) must fit a signed long")
    val len = v.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rows) {
        val idx = b * rows + j // 0-based component index
        val bit =
          if (idx >= len || v.isNullAt(idx)) 0L
          else if (elem(v, idx, vFloat) >= 0) 1L
          else 0L
        key |= bit << j
        j += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** `exists(v, x => x =!= 0)` replica: TRUE if any non-zero element
    * (NaN counts — it compares unequal to 0 in both engines' filters),
    * else NULL if any null element, else FALSE. */
  def hasNonzero(v: ArrayData, vFloat: Boolean): java.lang.Boolean = {
    val n = v.numElements()
    var anyNull = false
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true
      else if (elem(v, i, vFloat) != 0.0) return java.lang.Boolean.TRUE
      i += 1
    }
    if (anyNull) null else java.lang.Boolean.FALSE
  }
}

private[functions] trait VecArrayArg { self: Expression =>
  protected def vecOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  protected def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** Shared shape for the two-vector kernels: ARRAY<FLOAT|DOUBLE> ×2 →
  * nullable DOUBLE via a static kernel that may return null (length
  * mismatch / null element), so codegen goes through nullSafeCodeGen
  * with a boxed intermediate. */
abstract class BinaryVecDouble extends BinaryExpression with VecArrayArg {
  protected def kernel: String // static method name on VectorKernels
  protected def invoke(a: ArrayData, af: Boolean,
      b: ArrayData, bf: Boolean): java.lang.Double
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(left.dataType) && vecOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  private def lF = isFloatArr(left.dataType)
  private def rF = isFloatArr(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    invoke(a.asInstanceOf[ArrayData], lF, b.asInstanceOf[ArrayData], rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.VectorKernels.$kernel($a, $lF, $b, $rF);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
}

case class DotExactF(left: Expression, right: Expression) extends BinaryVecDouble {
  override def prettyName: String = "dot_exact"
  override protected def kernel: String = "dotExact"
  override protected def invoke(a: ArrayData, af: Boolean,
      b: ArrayData, bf: Boolean): java.lang.Double =
    VectorKernels.dotExact(a, af, b, bf)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotExactF = copy(left = l, right = r)
}

case class SqDistExactF(left: Expression, right: Expression) extends BinaryVecDouble {
  override def prettyName: String = "sq_dist_exact"
  override protected def kernel: String = "sqDistExact"
  override protected def invoke(a: ArrayData, af: Boolean,
      b: ArrayData, bf: Boolean): java.lang.Double =
    VectorKernels.sqDistExact(a, af, b, bf)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SqDistExactF = copy(left = l, right = r)
}

case class DotPlainF(left: Expression, right: Expression) extends BinaryVecDouble {
  override def prettyName: String = "dot_plain"
  override protected def kernel: String = "dotPlain"
  override protected def invoke(a: ArrayData, af: Boolean,
      b: ArrayData, bf: Boolean): java.lang.Double =
    VectorKernels.dotPlain(a, af, b, bf)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotPlainF = copy(left = l, right = r)
}

/** sign_pack(v, lo, n): the MSB-first packed sign fold over components
  * lo..lo+n-1 (1-based). */
case class SignPack(child: Expression, lo: Int, n: Int)
    extends UnaryExpression with VecArrayArg {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_pack"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType) && lo >= 1 && n >= 1 && n <= 63)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sign_pack requires ARRAY<FLOAT|DOUBLE>, lo >= 1, 1 <= n <= 63; " +
        s"got ${child.dataType.sql}, lo=$lo, n=$n")
  private def f = isFloatArr(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.signPack(v.asInstanceOf[ArrayData], f, lo, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.signPack($c, $f, $lo, $n)")
  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)
}

/** sign_band_keys(v, bands, rows): per-band packed sign bucket keys. */
case class SignBandKeys(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression with VecArrayArg {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_band_keys"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType) && bands >= 1 && rows >= 1 && rows < 63)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sign_band_keys requires ARRAY<FLOAT|DOUBLE>, bands >= 1, " +
        s"1 <= rows < 63; got ${child.dataType.sql}, bands=$bands, rows=$rows")
  private def f = isFloatArr(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.signBandKeys(v.asInstanceOf[ArrayData], f, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorKernels.signBandKeys($c, $f, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}

/** has_nonzero(v): the scorable-hygiene `exists(v, x => x =!= 0)`. */
case class HasNonzero(child: Expression)
    extends UnaryExpression with VecArrayArg {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "has_nonzero"
  override def checkInputDataTypes(): TypeCheckResult =
    if (vecOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"has_nonzero requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
  private def f = isFloatArr(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorKernels.hasNonzero(v.asInstanceOf[ArrayData], f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Boolean $r = graft.functions.VectorKernels.hasNonzero($c, $f);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.booleanValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): HasNonzero =
    copy(child = newChild)
}

/** Column-API entry points for the vector kernels. */
object vecfns {
  def dot_exact(a: Column, b: Column): Column =
    GraftBridge.column(DotExactF(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def sq_dist_exact(a: Column, b: Column): Column =
    GraftBridge.column(SqDistExactF(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def dot_plain(a: Column, b: Column): Column =
    GraftBridge.column(DotPlainF(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def sign_pack(v: Column, lo: Int, n: Int): Column =
    GraftBridge.column(SignPack(GraftBridge.expression(v), lo, n))
  def sign_band_keys(v: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(SignBandKeys(GraftBridge.expression(v), bands, rows))
  def has_nonzero(v: Column): Column =
    GraftBridge.column(HasNonzero(GraftBridge.expression(v)))
}

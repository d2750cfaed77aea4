package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static text-hashing kernels for the LLM-pipeline operators. All hashes
  * are self-contained published algorithms (FNV-1a, Karp-Rabin) so results
  * are engine- and platform-stable — no dependence on Spark's internal
  * hash seeds or JVM object hashing.
  */
object TextHash {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Seeded variant — one cheap independent hash family per seed, used by
    * MinHash (h_i(x) = fnv64(x) xor-mixed with seed i).
    */
  def fnv64Seeded(s: UTF8String, seed: Int): Long = {
    var h = fnv64(s) ^ (seed * 0x9e3779b97f4a7c15L)
    // splitmix64 finaliser — decorrelates the seeds
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** k seeded MinHash minima over a shingle array in ONE tight pass:
    * the base hash is computed ONCE per shingle ([[fnv64]]), then each
    * of the k seeds applies only the cheap xor-multiply-finalise mix
    * ([[fnv64Seeded]]'s tail) — versus k full passes over the array.
    * This is the codegen replacement for the k× `transform`/`array_min`
    * higher-order-function stack, whose per-element interpreted eval
    * dominated the minhash tier at corpus scale (measured at the
    * GRAFT_STRESS_CORPUS tier: the signature pass was ~80% of a 156 s
    * stage at 3M docs). Null shingles are skipped; an all-null/empty
    * array yields Long.MaxValue minima (deterministic, and such docs
    * simply co-bucket — the exact verify tier disposes of them).
    */
  def minhashK(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv64(shingles.getUTF8String(i))
        var s = 0
        while (s < k) {
          var h = base ^ (s * 0x9e3779b97f4a7c15L)
          h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
          h ^= (h >>> 27); h *= 0x94d049bb133111ebL
          h ^= (h >>> 31)
          if (h < mins(s)) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** FUSED shingle+MinHash kernel: identical output to
    * `minhashK(shingles(tokens, n), k)` WITHOUT materialising the
    * shingle strings. FNV-1a is a byte-stream hash, so the hash of the
    * space-joined n-gram "t1 t2 t3" is computable by streaming the
    * token bytes with a 0x20 separator — no UTF8String concat, no
    * GenericArrayData of n·len trigrams per doc (at the 3M-doc corpus
    * tier those allocations were the dominant cost of the signature
    * pass after the minhashK swap). Semantics replicated exactly:
    * offsets 0..max(len−n, 0) (so a short doc yields its single
    * partial shingle), `concat_ws` null-skip (a null token contributes
    * neither bytes nor separator), and duplicate shingles are harmless
    * because min() is idempotent — ShingleParitySpec pins bit-equality
    * against the materialised path. */
  def minhashShingles(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val len = tokens.numElements()
    val last = math.max(len - n, 0)
    var off = 0
    while (off <= last) {
      var h = 0xcbf29ce484222325L
      val end = math.min(off + n, len)
      var first = true
      var t = off
      while (t < end) {
        if (!tokens.isNullAt(t)) {
          if (!first) { h ^= 0x20L; h *= 0x100000001b3L }
          val s = tokens.getUTF8String(t)
          val nb = s.numBytes()
          var i = 0
          while (i < nb) {
            h ^= (s.getByte(i) & 0xffL)
            h *= 0x100000001b3L
            i += 1
          }
          first = false
        }
        t += 1
      }
      var seed = 0
      while (seed < k) {
        var m = h ^ (seed * 0x9e3779b97f4a7c15L)
        m ^= (m >>> 30); m *= 0xbf58476d1ce4e5b9L
        m ^= (m >>> 27); m *= 0x94d049bb133111ebL
        m ^= (m >>> 31)
        if (m < mins(seed)) mins(seed) = m
        seed += 1
      }
      off += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Per-band bucket hashes over a MinHash signature: the signature's
    * k minima split into `bands` contiguous rows of k/bands values,
    * each row folded to one 64-bit bucket key (FNV-style fold over the
    * longs + splitmix finalise). Equal minima rows ⇒ equal keys by
    * construction; unequal rows collide with prob ~2⁻⁶⁴ — and a
    * collision only ADDS a candidate pair, which the exact-verify tier
    * disposes of. Replaces the interpreted `transform(slice(...)) →
    * concat_ws → xxhash64(string)` chain that stringified every band
    * of every doc (8 × 3M rows at the corpus tier). */
  def bandHashes(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    // bands must tile the signature exactly: k % bands != 0 would
    // silently drop trailing components from every key, and bands > k
    // would re-hash component 0 into every surplus band — a per-doc
    // CONSTANT key that buckets the entire corpus together. Fail loudly
    // (first row) instead of silently degrading recall/scale.
    if (bands > k || k % bands != 0)
      throw new IllegalArgumentException(
        s"band_hashes: bands ($bands) must evenly divide the signature length ($k)")
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var i = b * rows
      val end = i + rows
      while (i < end) {
        val v = if (sig.isNullAt(i)) 0x7ff8beefdead0001L else sig.getLong(i)
        h ^= v
        h *= 0x100000001b3L
        h ^= (h >>> 29)
        i += 1
      }
      h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
      h ^= (h >>> 27); h *= 0x94d049bb133111ebL
      out(b) = h ^ (h >>> 31)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Count of positionally-equal components between two equal-length
    * long arrays — the MinHash agreement numerator, replacing an
    * interpreted `zip_with`+`aggregate` per candidate pair. Null
    * components never count as agreeing. */
  def agreeCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 across token
    * hashes, emit the sign bit (Charikar 2002). Null tokens are skipped.
    */
  def simhash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val P = (1L << 61) - 1 // Mersenne prime 2^61-1
  private val B = 257L

  private def mulmod(a: Long, b: Long): Long = {
    // (a*b) mod 2^61-1 via 128-bit product + Mersenne folding
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // value = hi*2^64 + lo; fold mod 2^61-1: 2^64 ≡ 8 (mod p)
    val lo61 = lo & P
    val rest = (lo >>> 61) | (hi << 3)
    var r = lo61 + rest
    while (r >= P) r -= P // rest ≤ P, so at most two subtractions
    r
  }

  /** Winnowing-style document fingerprint: Karp-Rabin polynomial hash of
    * every `window`-char substring (base 257 mod 2^61−1, O(n) rolling),
    * return the MINIMUM — a deterministic content fingerprint stable under
    * appends outside the minimising window (Schleimer/Wilkerson/Aiken's
    * winnowing, SIGMOD 2003, degenerate single-band form).
    */
  def minWindowHash(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) mod p for the rolling removal
    var bw = 1L
    var k = 0
    while (k < w - 1) { bw = mulmod(bw, B); k += 1 }
    var h = 0L
    var i = 0
    while (i < w) {
      h = (mulmod(h, B) + (bytes(i) & 0xffL)) % P
      i += 1
    }
    var min = h
    while (i < n) {
      val out = (bytes(i - w) & 0xffL)
      h = (h + P - mulmod(out, bw) % P) % P
      h = (mulmod(h, B) + (bytes(i) & 0xffL)) % P
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** simhash64(tokens): ArrayType(StringType) → LongType, codegen-native. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** minhash_k(shingles, k): ArrayType(StringType) → ArrayType(LongType),
  * codegen-native single-pass k-minima MinHash signature. */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_k"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_k requires ARRAY<STRING> and k > 0, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashK(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashK($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashK =
    copy(child = newChild)
}

/** minhash_shingles(tokens, n, k): ArrayType(StringType) →
  * ArrayType(LongType); the fused shingle+MinHash kernel. */
case class MinHashShingles(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 && k > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_shingles requires ARRAY<STRING> and n, k > 0, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhashShingles(input.asInstanceOf[ArrayData], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashShingles($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

/** band_hashes(sig, bands): ArrayType(LongType) → ArrayType(LongType);
  * per-band bucket keys over a MinHash signature. */
case class BandHashes(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if bands > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_hashes requires ARRAY<BIGINT> and bands > 0, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.bandHashes(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.bandHashes($c, $bands)")
  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

/** agree_count(a, b): positional equality count of two ARRAY<BIGINT>. */
case class AgreeCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "agree_count"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"agree_count requires two ARRAY<BIGINT>, got ${l.sql}, ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.agreeCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.agreeCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgreeCount =
    copy(left = newLeft, right = newRight)
}

/** min_window_hash(text, window): winnowing fingerprint, codegen-native. */
case class MinWindowHash(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "min_window_hash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_window_hash requires STRING, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minWindowHash(input.asInstanceOf[UTF8String], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minWindowHash($c, $window)")
  override protected def withNewChildInternal(newChild: Expression): MinWindowHash =
    copy(child = newChild)
}

/** Column-API entry points for the text-hash expressions. */
object hashfns {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
  def minhash_k(shingles: Column, k: Int): Column =
    GraftBridge.column(MinHashK(GraftBridge.expression(shingles), k))
  def minhash_shingles(tokens: Column, n: Int, k: Int): Column =
    GraftBridge.column(MinHashShingles(GraftBridge.expression(tokens), n, k))
  def band_hashes(sig: Column, bands: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), bands))
  def agree_count(a: Column, b: Column): Column =
    GraftBridge.column(AgreeCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def min_window_hash(text: Column, window: Int = 16): Column =
    GraftBridge.column(MinWindowHash(GraftBridge.expression(text), window))
}

package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-equality pins for the codegen vector kernels against the
  * interpreted higher-order-function trees they replace (the
  * ShingleParitySpec discipline, applied to the similarity stack):
  * any divergence — decimal rounding, null semantics, length-mismatch
  * padding, sign-pack bit order — must fail HERE before it can silently
  * shift a cosine or a bucket in production. Shapes cover empty/short/
  * mismatched vectors, null elements, zeros, subnormals and both float
  * and double element types.
  */
class VectorParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int): Seq[Float] =
    Seq.fill(n)((rnd.nextDouble() * 2 - 1).toFloat)

  // (id, vector) shapes — lengths deliberately mixed so the cross join
  // exercises the zip_with null-padding path
  private val shapes: Seq[(Long, Seq[Float])] = Seq(
    1L -> randVec(64),
    2L -> randVec(64),
    3L -> randVec(16),                        // short
    4L -> Seq.empty[Float],                   // empty
    5L -> Seq.fill(64)(0.0f),                 // zero vector
    6L -> (randVec(63) :+ 1e-45f),            // subnormal tail
    7L -> Seq.fill(64)(1e-8f),                // tiny positives
    8L -> randVec(128),
    9L -> randVec(3))

  private def vecs = shapes.toDF("vid", "v")
  // every ordered pair, including mismatched lengths
  private def pairs = vecs.select(col("vid").as("ida"), col("v").as("va"))
    .crossJoin(vecs.select(col("vid").as("idb"), col("v").as("vb")))

  // a vector with a NULL element (SQL-constructed; Scala Seq can't)
  private def withNullElem(df: org.apache.spark.sql.DataFrame, c: String) =
    df.withColumn(c,
      expr(s"transform($c, (x, i) -> if(i = 1, cast(null as float), x))"))

  /** the HOF replica of the plain double fold (Similarity's private
    * dotPlain) */
  private def hofDotPlain(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** the HOF replica of the sigHalf sign fold in signLshNearDup */
  private def hofSignPack(v: Column, lo: Int, n: Int): Column =
    aggregate(sequence(lit(lo), lit(lo + n - 1)), lit(0L),
      (acc, j) => acc * lit(2L) +
        when(try_element_at(v, j.cast("int")) >= 0, lit(1L))
          .otherwise(lit(0L)))

  private def assertColsEqual(df: org.apache.spark.sql.DataFrame,
      a: String, b: String, tag: String): Unit =
    for (r <- df.collect()) {
      val (x, y) = (r.getAs[Any](a), r.getAs[Any](b))
      assert(x == y || (x == null && y == null),
        s"$tag diverges on ${r.getAs[Any](0)}/${r.getAs[Any](1)}: $x vs $y")
    }

  test("dot_exact / sq_dist_exact / dot_plain == their HOF trees (float, all pair shapes)") {
    val df = pairs
      .withColumn("hof_dot", Similarity.dotExactHof(col("va"), col("vb")))
      .withColumn("k_dot", vecfns.dot_exact(col("va"), col("vb")))
      .withColumn("hof_sq", Similarity.sqDistExactHof(col("va"), col("vb")))
      .withColumn("k_sq", vecfns.sq_dist_exact(col("va"), col("vb")))
      .withColumn("hof_dp", hofDotPlain(col("va"), col("vb")))
      .withColumn("k_dp", vecfns.dot_plain(col("va"), col("vb")))
    assertColsEqual(df, "hof_dot", "k_dot", "dot_exact")
    assertColsEqual(df, "hof_sq", "k_sq", "sq_dist_exact")
    assertColsEqual(df, "hof_dp", "k_dp", "dot_plain")
  }

  test("null elements poison the kernels exactly like the HOF fold") {
    val df = withNullElem(pairs, "va")
      .withColumn("hof_dot", Similarity.dotExactHof(col("va"), col("vb")))
      .withColumn("k_dot", vecfns.dot_exact(col("va"), col("vb")))
    assertColsEqual(df, "hof_dot", "k_dot", "dot_exact(null elem)")
  }

  test("double-element arrays take the same path (q119's cast vectors)") {
    val df = pairs
      .withColumn("va", expr("transform(va, x -> cast(x as double))"))
      .withColumn("vb", expr("transform(vb, x -> cast(x as double))"))
      .withColumn("hof_dot", Similarity.dotExactHof(col("va"), col("vb")))
      .withColumn("k_dot", vecfns.dot_exact(col("va"), col("vb")))
      .withColumn("hof_sq", Similarity.sqDistExactHof(col("va"), col("vb")))
      .withColumn("k_sq", vecfns.sq_dist_exact(col("va"), col("vb")))
    assertColsEqual(df, "hof_dot", "k_dot", "dot_exact(double)")
    assertColsEqual(df, "hof_sq", "k_sq", "sq_dist_exact(double)")
  }

  test("sign_pack == the sigHalf aggregate fold (short vectors zero-pad)") {
    for (lo <- Seq(1, 33)) {
      val df = vecs
        .withColumn("hof", hofSignPack(col("v"), lo, 32))
        .withColumn("k", vecfns.sign_pack(col("v"), lo, 32))
      assertColsEqual(df, "hof", "k", s"sign_pack(lo=$lo)")
      val dfn = withNullElem(vecs, "v")
        .withColumn("hof", hofSignPack(col("v"), lo, 32))
        .withColumn("k", vecfns.sign_pack(col("v"), lo, 32))
      assertColsEqual(dfn, "hof", "k", s"sign_pack(lo=$lo, null elem)")
    }
  }

  test("sign_band_keys partitions buckets exactly like the legacy string keys") {
    // the retired string-key construction from signLshNearDup (r18 form)
    def stringKeys(bands: Int, rows: Int): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat((0 until rows).map { j =>
          when(try_element_at(col("v"),
              (b * lit(rows) + lit(j + 1)).cast("int")) >= 0,
            lit("1")).otherwise(lit("0"))
        }: _*))
    for ((bands, rows) <- Seq((4, 8), (8, 16), (4, 32))) {
      val rows0 = vecs.select(col("vid"),
        posexplode(stringKeys(bands, rows)).as(Seq("b", "sk")))
      val rows1 = vecs.select(col("vid"),
        posexplode(vecfns.sign_band_keys(col("v"), bands, rows))
          .as(Seq("b", "lk")))
      val joined = rows0.join(rows1, Seq("vid", "b")).collect()
        .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      // identical partitions: the string->long map must be a bijection
      // within every band
      val byStr = joined.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).toSet)
      assert(byStr.values.forall(_.size == 1),
        s"a string key maps to two long keys at ($bands x $rows)")
      val byLong = joined.groupBy(t => (t._1, t._3)).view.mapValues(_.map(_._2).toSet)
      assert(byLong.values.forall(_.size == 1),
        s"a long key maps to two string keys at ($bands x $rows)")
    }
  }

  test("has_nonzero == exists(v, x -> x != 0) including the any-null case") {
    val base = vecs
      .withColumn("hof", exists(col("v"), x => x =!= 0.0f))
      .withColumn("k", vecfns.has_nonzero(col("v")))
    assertColsEqual(base, "hof", "k", "has_nonzero")
    val zeros = Seq((10L, Seq(0.0f, 0.0f))).toDF("vid", "v")
    val zn = withNullElem(zeros, "v") // [0, null] -> NULL on both paths
      .withColumn("hof", exists(col("v"), x => x =!= 0.0f))
      .withColumn("k", vecfns.has_nonzero(col("v")))
    assertColsEqual(zn, "hof", "k", "has_nonzero(zero+null)")
  }
}

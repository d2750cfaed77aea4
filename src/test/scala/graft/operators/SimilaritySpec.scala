package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),   // identical -> 1
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal -> 0
      (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f))) // opposite -> -1
      .toDF("a", "b")
      .select(Similarity.cosineExact(col("a"), col("b")).as("c"))
    val cs = df.as[Double].collect()
    assert(math.abs(cs(0) - 1.0) < 1e-12)
    assert(math.abs(cs(1)) < 1e-12)
    assert(math.abs(cs(2) + 1.0) < 1e-12)
  }

  test("sign-LSH near-dup finds planted duplicate, skips opposite vector") {
    // 32-dim vectors (4 bands x 8 components): 1 and 2 are near-identical,
    // 3 is the exact opposite of 1 (cosine -1, different sign pattern),
    // 4 is orthogonal-ish noise.
    val base = Array.tabulate(32)(i => (if (i % 3 == 0) -1.0f else 1.0f) * (1.0f + i / 32.0f))
    val near = base.clone(); near(5) = near(5) * 1.01f
    val opp = base.map(x => -x)
    val noise = Array.tabulate(32)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq(
      (1L, base.toSeq), (2L, near.toSeq), (3L, opp.toSeq), (4L, noise.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.signLshNearDup(df, "vec_id", "embedding", minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"opposite vector must not pair: $pairs")
  }

  test("IVF top-k recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, probes, "vec_id", "embedding",
        k = 10, exact = false)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (assign, model) = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 8)
    val approx = Similarity.ivfTopK(assign, model, probes, "vec_id", "embedding",
        k = 10, nprobe = 4)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.map { p =>
      val hit = approx.getOrElse(p, Set.empty).intersect(exact(p)).size
      hit.toDouble / exact(p).size
    }.toSeq
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"IVF nprobe=4/8 mean recall too low: $meanRecall")
  }
}

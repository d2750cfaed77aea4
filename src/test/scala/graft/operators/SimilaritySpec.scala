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

  test("sign-quantiser IVF: Hamming-1 multi-probe reaches a one-flip neighbour, prunes far cells") {
    // probe cell = sign pattern of components 1..4. `oneFlip` differs
    // from the probe ONLY in component 1's sign (Hamming-1 cell — only
    // the multi-probe expansion can reach it); `sameCell` shares the
    // probe's cell; `farCell` differs in all four signs (Hamming 4) and
    // carries the HIGHEST cosine — it must still be pruned, proving the
    // scan is genuinely cell-restricted rather than brute force.
    val probe   = Array(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)
    val oneFlip = Array(-0.1f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f)
    val same    = Array(2.0f, 0.5f, 1.0f, 1.0f, -1.0f, 1.0f)
    val far     = Array(-1e-6f, -1e-6f, -1e-6f, -1e-6f, 5.0f, 5.0f)
    val df = Seq((0L, probe.toSeq), (1L, oneFlip.toSeq),
      (2L, same.toSeq), (3L, far.toSeq)).toDF("vec_id", "embedding")
    val res = Similarity.signIvfTopK(
        df, df.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 3)
      .select("cand_id", "rank").as[(Long, Int)].collect().toMap
    assert(res.contains(1L), s"Hamming-1 neighbour not probed: $res")
    assert(res.contains(2L), s"same-cell neighbour missing: $res")
    assert(!res.contains(3L), s"Hamming-4 cell must be pruned: $res")
  }

  test("sign-quantiser IVF plan: probe side broadcast, no cartesian product") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val res = Similarity.signIvfTopK(
      e, e.filter(col("vec_id") < 16), "vec_id", "embedding", k = 3)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      "the exploded probe-cell frame must broadcast onto the corpus")
    assert(!plan.contains("CartesianProduct"),
      "cell pruning must never degrade to a cross join")
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
    // .keys is a Set — convert BEFORE mapping or equal recalls dedup
    val recalls = exact.keys.toSeq.map { p =>
      val hit = approx.getOrElse(p, Set.empty).intersect(exact(p)).size
      hit.toDouble / exact(p).size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.5, s"IVF nprobe=4/8 mean recall too low: $meanRecall")
  }

  test("k-means IVF recall on planted clusters: >= 0.9 at nprobe=4/16, monotone in nprobe") {
    // The sf fixture embeddings are isotropic noise (within-label cosine
    // ~= across-label, so any partition passes a recall floor — the r17
    // verdict's finding). This fixture PLANTS the structure IVF exists
    // to exploit: 8 well-separated clusters (cluster c's centre has
    // signal 10 in dims 2c, 2c+1 of 16; noise sigma 0.5), so brute-force
    // top-k is intra-cluster by construction and recall@nprobe is a real
    // number. nlist=16 over 8 clusters forces k-means to SPLIT clusters
    // across cells — the regime where nprobe genuinely matters.
    val rng = new scala.util.Random(18L)
    val nPerCluster = 200
    val vecs = (0 until 8).flatMap { c =>
      (0 until nPerCluster).map { i =>
        val id = (c * nPerCluster + i).toLong
        val v = Array.tabulate(16) { j =>
          val signal = if (j == 2 * c || j == 2 * c + 1) 10.0f else 0.0f
          signal + (rng.nextGaussian() * 0.5).toFloat
        }
        (id, v.toSeq, c)
      }
    }.toDF("vec_id", "embedding", "cluster")
    val probes = vecs.filter(col("vec_id") % nPerCluster < 2) // 2 per cluster
    val truth = Similarity.bruteForceTopK(vecs, probes, "vec_id", "embedding",
        k = 10, exact = false)
      .select("probe_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // sanity: the separation really makes brute-force top-k intra-cluster
    assert(truth.forall { case (p, cs) =>
      cs.forall(_ / nPerCluster == p / nPerCluster) },
      "planted separation must make true top-k intra-cluster")
    val (assign, model) = Similarity.ivfIndex(vecs, "vec_id", "embedding",
      nlist = 16, seed = 42L)
    def recallAt(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(assign, model, probes, "vec_id",
          "embedding", k = 10, nprobe = nprobe)
        .select("probe_id", "cand_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // .keys is a Set — map on it DEDUPS equal per-probe recalls, so
      // go through Seq before averaging
      truth.keys.toSeq.map { p =>
        approx.getOrElse(p, Set.empty).intersect(truth(p)).size.toDouble /
          truth(p).size
      }.sum / truth.size
    }
    val ladder = Seq(1, 2, 4, 8).map(np => np -> recallAt(np))
    info(s"IVF planted-cluster recall ladder: ${ladder.map { case (n, r) => f"nprobe=$n -> $r%.3f" }.mkString(", ")}")
    // the falsifiable pin the r17 verdict asked for: a real recall number
    // on structure-bearing data, not a floor any partition passes
    assert(ladder.toMap.apply(4) >= 0.9,
      s"recall@nprobe=4/16 must reach 0.9 on separated clusters: $ladder")
    assert(ladder.toMap.apply(8) >= 0.95, s"recall@nprobe=8/16: $ladder")
    // candidate sets grow with nprobe, so recall is provably monotone —
    // any dip is a cell-machinery bug, not noise
    assert(ladder.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-12 },
      s"recall must be monotone in nprobe: $ladder")
  }

  test("PQ assignment: a vector equal to a centroid codes to it in every subspace") {
    // 16-dim vectors, m=4 subspaces of 4 dims; centroids = vecs 0..3.
    def vec(seed: Int): Seq[Double] =
      (0 until 16).map(i => math.sin(seed * 31 + i).abs + seed)
    val vecs = ((0 to 3).map(k => (k.toLong, vec(k))) :+
      (7L, vec(2)) :+                            // exact copy of centroid 2
      (8L, vec(1).map(_ + 0.001))).toDF("vec_id", "v") // near centroid 1
    val cents = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("k"), col("v").as("c"))
    val dists = Similarity.pqSubDistances(vecs, cents, "vec_id", "v", 4, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pq_id"), col("sub")).orderBy(col("dist"), col("k"))
    val codes = dists.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    for (sub <- 0 until 4) {
      assert(codes((7L, sub)) == 2L, s"copy of centroid 2, sub $sub")
      assert(codes((8L, sub)) == 1L, s"near centroid 1, sub $sub")
      assert(codes((3L, sub)) == 3L, s"centroid 3 codes to itself, sub $sub")
    }
  }
}

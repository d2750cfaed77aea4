package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "src0", "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "src0", "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    (3L, "src0", "the quick brown fox jumps over the lazy dog again and again tonight"), // near dup of 1
    (4L, "src0", "completely different content about spark query engines and shuffles here"),
    (5L, "src1", "another unrelated document talking about embeddings vectors and cosine"),
    (6L, "src1", "another unrelated document talking about embeddings vectors and cosine scores") // near dup of 5
  ).toDF("doc_id", "source", "text")

  test("exact dedup keeps min-id survivor per digest") {
    val (survivors, dupes) = Dedup.exact(corpus, "doc_id", md5(col("text")))
    val ids = survivors.select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L, 5L, 6L)) // 2 deduped into 1
    assert(dupes.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("minhash LSH finds planted near-duplicates, skips unrelated docs") {
    val cands = Dedup.minhashLshCandidates(corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16) // r=2: high recall at modest sim
    val pairs = cands.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"near dup pair missing from $pairs")
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((4L, 5L)),
      s"unrelated pair wrongly bucketed in $pairs")
    val est = cands.filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0, "identical docs must agree on every minhash")
  }

  test("verifier tier: LSH candidates + exact jaccard == brute force at 0.9 (q63 shape)") {
    // the q63 composition: tier-2 candidates (16 bands of 2 rows — the
    // recall-biased verifier configuration) re-verified with exact
    // 3-gram jaccard must reproduce the brute-force >= 0.9 pair set
    val sh = corpus.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val viaLsh = Dedup.minhashLshCandidates(corpus, "doc_id", "text",
        shingleN = 3, k = 32, bands = 16)
      .select("id_a", "id_b")
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("sh_a"), col("sh_b")).as("j"))
      .filter(col("j") >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaLsh == brute, s"verifier tier diverged: lsh=$viaLsh brute=$brute")
    assert(brute.contains((1L, 2L)), "fixture must contain a >=0.9 pair")
  }

  test("simhash: identical docs at distance 0, near dups close, unrelated far") {
    val cands = Dedup.simhashCandidates(corpus, "doc_id", "text", maxHamming = 20)
    val m = cands.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(m.get((1L, 2L)).contains(0), s"exact dup hamming should be 0: $m")
    m.get((1L, 3L)).foreach(d => assert(d <= 20))
    assert(!m.contains((1L, 4L)) || m((1L, 4L)) > 10,
      "unrelated docs should not be near-identical")
  }

  test("portable simhash: chunk-LSH candidates == brute-force Hamming <= 3 (q62 invariant)") {
    val sig = Dedup.portableSimhash(corpus, "doc_id", "text")
    // signature sanity: 60-bit range, exact dup pair identical
    val sigs = sig.select("sh_id", "sig").as[(Long, Long)].collect().toMap
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 60)))
    assert(sigs(1L) == sigs(2L), "identical docs must share the signature")
    // pigeonhole completeness: the chunk-LSH tier must surface exactly
    // the pairs a brute-force Hamming scan finds at d <= chunks - 1
    val lsh = Dedup.simhashCandidatesFromSig(
      sig, maxHamming = 3, chunks = 4, sigBits = 60, maxBucket = 100000)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = (for {
      (a, sa) <- sigs.toSeq; (b, sb) <- sigs.toSeq if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(lsh == brute, s"lsh $lsh != brute $brute")
  }

  test("portable simhash plan: one aggregation exchange to id grain, no lambda trees") {
    val sig = Dedup.portableSimhash(corpus, "doc_id", "text")
    sig.collect() // AQE: inspect the FINAL plan of this execution
    val plan = sig.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the 60 bit-majorities are codegen'd conditional sums inside ONE
    // groupBy — corpus-sized data crosses exactly one exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(!plan.contains("transform("),
      "bit majorities must be flat conditional sums, not lambda trees")
    // ...and the FULL candidate chain still reads the corpus ONCE: the
    // chunk-bucket self-join's second side must reuse the first side's
    // exchange (ReusedExchange), so the token-grain aggregation never
    // re-runs per join branch — the no-CSE-across-join-branches hazard
    // the minhash tier needed an explicit persist for is covered here
    // by exchange reuse (both sides shuffle the identical window child)
    val cands = Dedup.simhashCandidatesFromSig(
      sig, maxHamming = 3, chunks = 4, sigBits = 60, maxBucket = 100000)
    cands.collect()
    val cplan = cands.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("ReusedExchange".r.findAllIn(cplan).nonEmpty,
      "bucket self-join must reuse the window exchange")
    assert("conv\\(substring\\(md5".r.findAllIn(cplan).size <= 1,
      "the md5 token pass must appear once in the final plan, not per branch")
  }

  test("word-set jaccard exact values") {
    val df = Seq(
      ("a b c", "a b c"), ("a b c d", "c d e f"), ("a a b", "b b a"))
      .toDF("t1", "t2")
      .select(Dedup.jaccard(split(col("t1"), " "), split(col("t2"), " ")).as("j"))
    val js = df.as[Double].collect()
    assert(js(0) == 1.0)
    assert(js(1) == 2.0 / 6.0)
    assert(js(2) == 1.0) // distinct semantics: {a,b} vs {b,a}
  }

  test("shingles produce n-grams over token windows") {
    val sh = Seq("w1 w2 w3 w4").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(sh == Seq("w1 w2 w3", "w2 w3 w4"))
  }

  test("connected components: chains collapse transitively to the min-id survivor") {
    // 1-2, 2-3, 3-4 is a chain (1~4 never emitted as a pair) plus a
    // disjoint 2-cycle 10-11: transitivity must find {1,2,3,4} and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: numeric min survivor, not lexicographic") {
    // string order would pick "10" over "9"; numeric order must pick 9
    val pairs = Seq((10L, 9L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(9L -> 9L, 10L -> 9L))
  }

  test("connected components: driver union-find arm == distributed fixpoint arm") {
    // deterministic pseudo-random graph with chains, cycles, dup edges,
    // self-loops and singleton-free isolation — both arms must agree
    // exactly (same (id, component) map, component = min reachable id)
    val rnd = new scala.util.Random(42)
    val edges = (Seq.tabulate(400)(i => (i.toLong, (i + 1).toLong)) ++ // one long chain
      Seq.tabulate(300)(_ => { val a = rnd.nextInt(2000).toLong; (a, a + rnd.nextInt(5).toLong) }) ++
      Seq((5000L, 5000L), (7000L, 6999L))).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(edges, driverEdgeLimit = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    // and the over-guard fallback engages: a limit that the edge count
    // exceeds must route to the distributed arm and still agree
    val fallback = Dedup.connectedComponents(edges, driverEdgeLimit = 10L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fallback == dist)
  }

  test("connected components on the planted corpus match the dup groups") {
    val cands = Dedup.minhashLshCandidates(corpus, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val cc = Dedup.connectedComponents(cands).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // {1,2,3} near/exact dups -> survivor 1; {5,6} -> survivor 5; 4 alone
    assert(cc.getOrElse(2L, -1L) == 1L && cc.getOrElse(3L, -1L) == 1L)
    assert(cc.getOrElse(6L, -1L) == 5L)
    assert(!cc.contains(4L)) // no pair -> not in the component frame
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q173 SemDeDup drop rule: keep-first per duplicate pair, counts consistent") {
    val out = LlmOps.q173SemDedup.build(spark, "/root/testdata/sf0.001")
      .select("cluster", "n_vectors", "n_dup_pairs", "n_dropped", "n_kept")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "no clusters produced")
    val total = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert(out.map(_._2).sum === total,
      "cluster partition must cover every vector exactly once")
    out.foreach { case (c, nv, pairs, dropped, kept) =>
      assert(kept === nv - dropped, s"cluster $c: kept != vectors - dropped")
      assert(dropped <= pairs, s"cluster $c: each dropped vector needs a pair")
      assert(dropped < nv || nv == 0,
        s"cluster $c: the smallest id in a duplicate set is always kept")
    }
    // the sf0.001 embeddings are label-clustered: at least one semantic
    // duplicate pair must exist somewhere at the 0.3 threshold
    assert(out.map(_._3).sum > 0, "expected at least one high-cosine pair")
  }

  test("q78 packing handles null keys and duplicate doc_ids deterministically") {
    // The four-round driver-red hypothesis: a fixture with null sort
    // keys reorders the running cum_end between engines. This plants
    // exactly that — a null doc_id, a null text, a duplicate doc_id —
    // and asserts the hand-computed census under the DECLARED order
    // (null keys coalesce to '' and sort FIRST).
    val cap = 2048
    def w(n: Int): String = Seq.fill(n)("w").mkString(" ")
    // doc_id is BIGINT in the harness fixture; nulls coalesce to the -1
    // sentinel, which packs FIRST numerically
    val rows = Seq(
      // source a: null id (2 tok), 5-null-text (1 tok via
      // tokenCount('')), 5 (3 tok), 7 (2049 tok) -> cum 2, 3, 6, 2055
      ("a", Option.empty[Long], Option(w(2))),
      ("a", Option(5L), Option.empty[String]),
      ("a", Option(5L), Option(w(3))),
      ("a", Option(7L), Option(w(cap + 1))),
      // source b: null doc (2048 tok) MUST pack first: then id 9 (1 tok)
      // sits entirely in window 2 -> 0 straddlers. Nulls-last packing
      // would make the null doc straddle (1 straddler) instead.
      ("b", Option.empty[Long], Option(w(cap))),
      ("b", Option(9L), Option("solo")))
    val dir = java.nio.file.Files.createTempDirectory("pack78").toString
    rows.toDF("source", "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmOps.q78SequencePacking.build(spark, dir)
      .select("source", "n_docs", "total_tokens", "n_windows", "n_straddlers")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 4L, 2055L, 2L, 1L)),
      s"source a census wrong: ${out("a")}")
    assert(out("b") === (("b", 2L, 2049L, 2L, 0L)),
      s"source b: null doc_id must pack FIRST (got ${out("b")})")
  }

  test("q173 SemDeDup never drops a cluster's smallest surviving id") {
    // tiny planted frame: ids 0-7 are the seeds (one per cluster); 100/101
    // duplicate seed 0's direction so both land in cluster 0 and only the
    // larger of each dup pair is dropped.
    val dim = 8
    def v(scale: Float, axis: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == axis) scale else 0.001f * i)
    val rows = (0 until 8).map(i => (i.toLong, v(1.0f, i))) ++
      Seq((100L, v(0.9f, 0)), (101L, v(1.1f, 0)))
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString
    rows.toDF("vec_id", "embedding").withColumn("label", lit("t"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = LlmOps.q173SemDedup.build(spark, dir)
      .select("cluster", "n_vectors", "n_dropped", "n_kept")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // cluster 0 holds {0, 100, 101}: 0 is kept (smallest id in every pair),
    // 100 and 101 both have a smaller high-cosine neighbour -> dropped.
    val c0 = out(0L)
    assert(c0._2 === 3L && c0._3 === 2L && c0._4 === 1L,
      s"cluster 0 expected (3 vectors, 2 dropped, 1 kept), got $c0")
  }
}

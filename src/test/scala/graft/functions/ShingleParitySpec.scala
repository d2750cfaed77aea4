package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bit-equality pin for the fused shingle+MinHash kernel: the throughput
  * tier's `minhash_shingles(tokens, n, k)` must equal
  * `minhash_k(shingles(text, n), k)` on every degenerate token shape —
  * FNV-1a streams the joined bytes, so the two paths are the same hash
  * by construction, and THIS spec is what makes that claim falsifiable
  * (an off-by-one in the offset range or a missed separator byte breaks
  * a signature component here before it silently shifts candidate sets
  * in production).
  */
class ShingleParitySpec extends SparkSpec {
  import spark.implicits._

  private val shapes = Seq(
    "alpha beta gamma delta epsilon",          // plain
    "one two",                                  // shorter than n=3
    "solo",                                     // single token
    "",                                         // empty text -> [""]
    "a  b   c",                                 // space runs -> empty tokens
    " leading and trailing ",                   // boundary empties
    "café naïve résumé — ünïcødé tokens here",  // multibyte UTF-8
    "dup dup dup dup dup",                      // duplicate shingles
    (1 to 200).map(i => s"w$i").mkString(" "),  // long doc
    // NULL text: the stored path maps it to [""] (concat_ws null-skip),
    // and the fused production tier must agree — tokens(coalesce(t,''))
    // — instead of null-dropping the doc out of banding (r18 ADVICE)
    null.asInstanceOf[String])

  test("fused minhash_shingles == minhash_k over materialised shingles, all shapes") {
    for (n <- Seq(2, 3, 5); k <- Seq(8, 32)) {
      val df = shapes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .withColumn("sh", Dedup.shingles(col("text"), n))
        .select(col("doc_id"),
          hashfns.minhash_k(col("sh"), k).as("via_strings"),
          // the production tier's exact input shape (null text -> [""])
          hashfns.minhash_shingles(
            Dedup.tokens(coalesce(col("text"), lit(""))), n, k)
            .as("fused"))
      val rows = df.collect()
      for (r <- rows) {
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n k=$k doc ${r.getLong(0)}: fused kernel diverges from the string path")
      }
    }
  }

  test("production candidate tier (keepShingles=false) matches the stored-shingle tier") {
    val docs = shapes.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fused = Dedup.minhashLshCandidates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val (viaStrings, _) = Dedup.minhashLshCandidatesWithShingles(
      docs, "doc_id", "text")
    val stored = viaStrings.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    assert(fused == stored,
      s"candidate sets must match: fused $fused vs stored $stored")
  }

  test("band_hashes rejects a non-tiling band count instead of degrading keys") {
    val sig = Seq((1L, (1L to 32L).toArray)).toDF("doc_id", "sig")
    // k % bands != 0 would silently drop trailing components; bands > k
    // would fold component 0 into every surplus band (corpus-wide
    // constant keys). Both must fail loudly.
    for (bad <- Seq(5, 7, 33, 64)) {
      val e = intercept[Exception] {
        sig.select(hashfns.band_hashes(col("sig"), bad)).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("evenly divide")),
        s"bands=$bad must be rejected, got $e")
    }
    // the tiling configs still evaluate
    for (ok <- Seq(1, 2, 4, 8, 16, 32))
      assert(sig.select(hashfns.band_hashes(col("sig"), ok)).head()
        .getSeq[Long](0).size == ok)
  }
}

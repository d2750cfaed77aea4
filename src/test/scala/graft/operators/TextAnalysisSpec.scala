package graft.operators

import graft.SparkSpec
import graft.functions.{hashfns, TextHash}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count matches split semantics incl. double spaces") {
    val df = Seq("a b c", "one", "a  b").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 1, 3))
  }

  test("language id picks the max-overlap lexicon deterministically") {
    val df = Seq(
      "the fast value of a thing",       // en markers
      "der wert ist schnell und gut",    // de markers
      "xyz qqq zzz")                     // no markers -> first max (all 0) = en
      .toDF("text")
      .select(TextAnalysis.languageId(split(col("text"), " ")).as("lang"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "en"))
  }

  test("quality score bands") {
    val short = "tiny"                       // len<50 -> 0.2*0.4; meanTok=4 -> 1.0*0.4
    val df = Seq(short).toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val q = df.as[Double].head()
    assert(math.abs(q - (0.2 * 0.4 + 1.0 * 0.4 + 0.0)) < 1e-12)
  }

  test("min_window_hash: deterministic, shift-stable, content-sensitive") {
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val h1 = TextHash.minWindowHash(UTF8String.fromString(base), 16)
    val h2 = TextHash.minWindowHash(UTF8String.fromString(base), 16)
    assert(h1 == h2)
    // appending content can only lower or keep the min over windows —
    // if the minimising window survives, the fingerprint is stable
    val hApp = TextHash.minWindowHash(UTF8String.fromString(base + "zz"), 16)
    assert(hApp <= h1)
    val hDiff = TextHash.minWindowHash(UTF8String.fromString("totally different text!"), 16)
    assert(hDiff != h1)
    // expression path agrees with the kernel
    val viaExpr = Seq(base).toDF("t")
      .select(hashfns.min_window_hash(col("t"), 16)).as[Long].head()
    assert(viaExpr == h1)
  }

  test("simhash expression: identical token arrays agree; kernel matches") {
    val df = Seq("spark query engine", "spark query engine", "other words here")
      .toDF("t").select(hashfns.simhash64(split(col("t"), " ")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("multimodal feature extraction: schema, determinism, byte-derived values") {
    val media = Seq((1L, "image", "hello world payload"), (2L, "audio", ""))
      .toDF("doc_id", "media_type", "text")
      .select(col("doc_id"), col("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.extractFeatures(media, "doc_id", "media_type", "payload")
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.orderBy("media_id").collect()
    assert(rows(0).getInt(2) == 19) // byte_length of payload
    assert(rows(0).getSeq[Float](4).length == 8)
    assert(rows(1).getInt(2) == 0)  // empty payload handled
    val again = Multimodal.extractFeatures(media, "doc_id", "media_type", "payload")
      .orderBy("media_id").collect()
    assert(rows.sameElements(again), "decode stub must be deterministic")
  }

  test("frame sampling: uniform mid-stride offsets, fan-out, edge payloads") {
    // 10-frame payload (640 bytes at frameSize 64): mid-stride indices
    // floor(10*(2j+1)/8) for j=0..3 are 1, 3, 6, 8.
    val big = "x" * 640
    val media = Seq((1L, big), (2L, "short"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.sampleFrames(media, "doc_id", "payload",
        frameSize = 64, k = 4)
      .orderBy("media_id", "frame_idx").collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).map(_.getInt(1)).toSeq == Seq(1, 3, 6, 8),
      s"mid-stride indices wrong: ${byId(1L).map(_.getInt(1)).toSeq}")
    assert(byId(1L).forall(_.getInt(3) == 64))
    // single-frame doc: k samples collapse to the one distinct index
    assert(byId(2L).map(_.getInt(1)).toSeq == Seq(0))
    assert(byId(2L).head.getInt(3) == 5)
    // empty payload still yields its one zero-length frame row
    assert(byId(3L).map(r => (r.getInt(1), r.getInt(3))).toSeq == Seq((0, 0)))
  }
}

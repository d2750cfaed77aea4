package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-sum must be BIT-IDENTICAL to the single-window
  * running sum it replaces — on duplicate order keys, null partition
  * keys, and bucket boundaries — while actually fanning the work out
  * over (part, bucket) tasks. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rows =
      (0L until 400L).map(i => (i, if (i % 3 == 0) "web" else s"src${i % 5}", (i % 7) + 1)) ++
      Seq((400L, null.asInstanceOf[String], 5L), (401L, null.asInstanceOf[String], 2L),
        // duplicate order key within one source (ties must not reorder sums)
        (100L, "web", 9L), (100L, "web", 9L))
    rows.toDF("doc_id", "source", "n_tokens")
  }

  test("bucketed running sum == single-window running sum (nulls, ties, boundaries)") {
    val d = corpus
    val order = Seq(col("doc_id").asc_nulls_first, col("n_tokens").asc_nulls_first)
    val naive = d.withColumn("cum_end",
      sum(col("n_tokens")).over(Window.partitionBy(col("source"))
        .orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // width 64 -> ~7 buckets, several boundaries inside every source
    val dist = PrefixSum.bucketedRunningSum(d, Seq("source"),
      expr("coalesce(doc_id, -1) DIV 64"), order, col("n_tokens"), "cum_end")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "n_tokens", "cum_end")
        .collect().map(_.toSeq).sortBy(_.toString)
    assert(canon(naive).toSeq == canon(dist).toSeq,
      "two-level prefix sum must equal the single-window form bit-for-bit")
  }

  test("a descending or nulls-last leading order key is rejected at plan time") {
    val d = corpus
    // the offsets scan is hardwired ascending-nulls-first over buckets;
    // a mismatched leading key would yield silently WRONG sums (r18
    // ADVICE) — both divergent shapes must throw, the matching explicit
    // shape must not
    for (bad <- Seq(col("doc_id").desc, col("doc_id").asc_nulls_last)) {
      val e = intercept[IllegalArgumentException] {
        PrefixSum.bucketedRunningSum(d, Seq("source"),
          expr("coalesce(doc_id, -1) DIV 64"), Seq(bad, col("n_tokens")),
          col("n_tokens"), "cum_end")
      }
      assert(e.getMessage.contains("ascending"), e.getMessage)
    }
    PrefixSum.bucketedRunningSum(d, Seq("source"),
      expr("coalesce(doc_id, -1) DIV 64"),
      Seq(col("doc_id").asc_nulls_first), col("n_tokens"), "cum_end")
  }

  test("reserved _ps_ input columns are rejected instead of silently shadowed") {
    val d = corpus.withColumn("_ps_val", lit(1))
    val e = intercept[IllegalArgumentException] {
      PrefixSum.bucketedRunningSum(d, Seq("source"),
        expr("coalesce(doc_id, -1) DIV 64"), Seq(col("doc_id")),
        col("n_tokens"), "cum_end")
    }
    assert(e.getMessage.contains("_ps_"), e.getMessage)
  }

  test("the work actually fans out: more (part, bucket) groups than partitions") {
    val d = corpus
    val groups = d.withColumn("b", expr("coalesce(doc_id, -1) DIV 64"))
      .select("source", "b").distinct().count()
    val parts = d.select("source").distinct().count()
    assert(groups > parts,
      s"bucketing must split the dominant partition: $groups groups vs $parts parts")
  }
}

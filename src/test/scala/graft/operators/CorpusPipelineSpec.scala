package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.SparkSpec
import graft.contracts.{ColumnSpec, EdgeContract}
import graft.sources.{Loader, Sinks}

/** Capstone composition: the LLM-corpus path a user would actually run —
  * NDJSON crawl-drop ingest → text analysis → exact dedup → quality
  * filter → deterministic split → per-split census — composed as ONE
  * declarative chain over the battery's individually-oracled operators,
  * with conservation asserted at every stage boundary and the composed
  * plan's shuffle count pinned.
  *
  * Why this exists: each operator is verified alone (q180, q66-q68,
  * q60, q76, q77); composition is where row-loss and recompute bugs
  * hide (a filter pushed past a dedup, a non-deterministic survivor
  * feeding the split). The conservation identities here are the ones a
  * 100 TB pipeline audits after every nightly run.
  */
class CorpusPipelineSpec extends SparkSpec {

  test("corpus pipeline end-to-end: conservation at every stage, bounded shuffles") {
    val sf = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft_corpus_drop").toString

    // 1. the crawl drop: corpus arrives as NDJSON, ingested through the
    //    contract seal (typed, alias-free here)
    Sinks.writeNdjson(spark.read.parquet(s"$sf/documents.parquet"), tmp)
    val contract = EdgeContract("corpus", Seq(
      "doc_id" -> ColumnSpec(LongType, required = true),
      "text" -> ColumnSpec(StringType, required = true),
      "lang" -> ColumnSpec(StringType),
      "source" -> ColumnSpec(StringType),
      "n_chars" -> ColumnSpec(LongType)))
    val ingested = Loader.loadNdjson(spark, tmp, contract).df
    val nIn = ingested.count()
    assert(nIn == spark.read.parquet(s"$sf/documents.parquet").count(),
      "ingest must preserve the drop's row count")

    // 2. text analysis — pure column code, no shuffle
    val analysed = ingested.withColumns(Map(
      "lang_id" -> TextAnalysis.languageId(split(col("text"), " ")),
      "quality" -> TextAnalysis.qualityScore(col("text")),
      "n_tokens" -> TextAnalysis.tokenCount(col("text"))))

    // 3. exact dedup — deterministic min-id survivor per content digest
    val (survivors, dupGroups) = Dedup.exact(analysed, "doc_id", md5(col("text")))
    val nSurvivors = survivors.count()
    val nDistinctDigests = ingested
      .agg(countDistinct(md5(col("text")))).head().getLong(0)
    assert(nSurvivors == nDistinctDigests,
      "exactly one survivor per distinct content digest")
    val nDupRows = dupGroups.count()
    val nDupGroups = dupGroups.select("content_digest").distinct().count()
    assert(nIn - nSurvivors == nDupRows - nDupGroups,
      "rows dropped by dedup == duplicate rows beyond each group's survivor")

    // 4. quality filter — dropped rows are COUNTED, never silently shed
    val kept = survivors.filter(col("quality") >= 0.25 && col("n_tokens") >= 3)
    val nKept = kept.count()
    val nFiltered = survivors
      .filter(!(col("quality") >= 0.25 && col("n_tokens") >= 3)).count()
    assert(nKept + nFiltered == nSurvivors, "filter partition must be exact")
    assert(nKept > 0, "the sf0.001 corpus should not filter to nothing")

    // 5. deterministic split — pure function of doc_id, reproducible
    def withSplit(df: org.apache.spark.sql.DataFrame) = df.withColumn("split",
      Sampling.splitLabel(
        Sampling.stableBucket(col("doc_id").cast("string"), 100), 90, 5))
    val splitA = withSplit(kept).groupBy("split")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val splitB = withSplit(kept).groupBy("split")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(splitA == splitB, "the split must be a pure function of doc_id")
    assert(splitA.values.map(_._1).sum == nKept,
      "split partition must cover every kept document exactly once")
    assert(splitA.getOrElse("train", (0L, 0L))._1 > splitA.getOrElse("test", (0L, 0L))._1,
      "a 90/5/5 split puts most documents in train")

    // 6. per-(split, lang) census — token totals conserve through the
    //    grouping
    val census = withSplit(kept).groupBy("split", "lang_id")
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
    val censusRows = census.collect()
    assert(censusRows.map(_.getLong(2)).sum == nKept)
    assert(censusRows.map(_.getLong(3)).sum ==
      kept.agg(sum(col("n_tokens"))).head().getLong(0))

    // plan shape: the whole composed path (scan → analyse → dedup window
    // → filter → split → census) is one Catalyst plan whose only
    // shuffles are the dedup's digest window and the census groupBy — a
    // third exchange would mean a stage recomputes or repartitions for
    // nothing at 100 TB
    // after execution AdaptiveSparkPlan prints the FINAL plan followed by
    // an "== Initial Plan ==" section that duplicates every node — count
    // only the final section
    val planText = census.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = planText.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("AQEShuffleRead") &&
        !l.contains("ReusedExchange"))
    assert(exchanges <= 2,
      s"composed corpus plan carries $exchanges exchanges — expected the " +
        "dedup window and the census groupBy only:\n" + planText)
  }
}

package graft.sources

import graft.SparkSpec
import graft.contracts.{ColumnSpec, EdgeContract}
import graft.queries.SourceOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import java.nio.file.Files

/** Pins for the two shard-export arms behind q182 (SURVEY §2.1 row 9a):
  *
  *  - the EXPLICIT-BIN arm (`SourceOps.shardBinsExplicit`, the oracle /
  *    deterministic tier) must execute the q156 plan formula exactly —
  *    dense bin ids 0..n_shards-1 per source, per-bin row balance
  *    within one row;
  *  - the PRODUCTION arm (`SourceOps.shardExportRange`, the default
  *    write path since round 18) must conserve every record and bound
  *    the file estate: per-source shard counts land within the sampled
  *    range-boundary tolerance of the plan, no per-source window
  *    appears anywhere in its plan (the r17 scale-funnel stays out),
  *    and rows spread across range partitions within a balance bound.
  */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: srcA dominates by bytes (40 long docs), srcB is small
  // (10 short docs), plus one NULL-source doc (forms its own plan group)
  private def corpus = {
    val rows =
      (1L to 40L).map(i => (i, "srcA", ("alpha beta gamma delta " * 8) + i, "en")) ++
      (41L to 50L).map(i => (i, "srcB", s"short doc $i", "en")) ++
      Seq((51L, null.asInstanceOf[String], "null source doc body", "en"))
    rows.toDF("doc_id", "source", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private val target = 512L

  test("explicit-bin arm executes the q156 formula: dense bins, per-bin balance within one row") {
    val d = corpus
    val plan = SourceOps.shardPlanOf(d, target, overhead = 16L)
    val planRows = plan.collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2))).toMap
    // the skew is real: srcA plans many shards, srcB exactly one
    assert(planRows(Some("srcA"))._2 > 5, s"srcA must multi-shard: $planRows")
    assert(planRows(Some("srcB"))._2 == 1L)
    assert(planRows(None)._2 == 1L, "null source forms its own plan group")
    val obs = SourceOps.shardBinsExplicit(d, plan)
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n"))
      .collect().toSeq.groupBy(r => Option(r.getString(0)))
    for ((src, (nDocs, nShards)) <- planRows) {
      val bins = obs(src).map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(bins.keySet == (0L until nShards).toSet, s"$src: bins must be dense 0..${nShards - 1}")
      assert(bins.values.max - bins.values.min <= 1, s"$src: even row-split within one row")
      assert(bins.values.sum == nDocs, s"$src: conservation")
    }
  }

  test("production range arm: conservation exact, bounded file estate, no window in the plan") {
    val d = corpus
    val plan = SourceOps.shardPlanOf(d, target, overhead = 16L)
    val nBins = plan.agg(sum(col("n_shards"))).head().getLong(0).toInt
    val nSources = plan.count().toInt
    val nRows = d.count()
    // the r17 scale-funnel must be absent from the production write plan:
    // no Window (per-source row_number) and no per-source global sort
    val writePlan = d.repartitionByRange(math.max(nBins, 1),
      col("source"), col("doc_id")).queryExecution.optimizedPlan.toString
    assert(!writePlan.contains("Window"), s"production arm must not window:\n$writePlan")
    val out = Files.createTempDirectory("graft_shard_range").toString
    SourceOps.shardExportRange(d, nBins, out)
    // file estate: >= one shard per source, <= nBins + nSources (a range
    // partition straddling a source boundary writes one file per source)
    val shardFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).filter(_.getName.endsWith(".json.gz"))
    }
    assert(shardFiles.size >= nSources && shardFiles.size <= nBins + nSources,
      s"${shardFiles.size} files outside [$nSources, ${nBins + nSources}]")
    // placement scales with the PLAN (r18 ADVICE): the dominant source's
    // file estate must track its planned shard count — a regression that
    // ignores nBins (one file per source) passes conservation but dies
    // here. /2 absorbs range-boundary sampling slack.
    val perSourceFiles = shardFiles.groupBy(_.getParentFile.getName)
      .map { case (k, v) => k -> v.size }
    val aPlanned = plan.collect()
      .collectFirst { case r if r.getString(0) == "srcA" => r.getLong(2) }.get
    assert(aPlanned >= 8, s"fixture must keep srcA multi-shard: $aPlanned")
    assert(perSourceFiles("source=srcA") >= (aPlanned / 2).toInt,
      s"srcA produced ${perSourceFiles("source=srcA")} files vs $aPlanned planned shards")
    // size balance: range boundaries spread rows, no file hoards the corpus
    val perFile = spark.read.textFile(s"$out/*/*.json.gz")
      .select(input_file_name().as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("n")).collect().map(_.getLong(1))
    assert(perFile.max <= 2L * ((nRows + nBins - 1) / nBins) + 1,
      s"max rows/file ${perFile.max} breaches the balance bound")
    // conservation through the q182 contract seal: per-source doc count
    // and char volume identical to the input, null source included
    val contract = EdgeContract("documents_shards", Seq(
      "doc_id" -> ColumnSpec(LongType, required = true),
      "text" -> ColumnSpec(StringType, required = true),
      "lang" -> ColumnSpec(StringType),
      "n_chars" -> ColumnSpec(LongType),
      "source" -> ColumnSpec(StringType)))
    val reread = Loader.loadNdjson(spark, out, contract).df
    def conserve(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(length(coalesce(col("text"), lit(""))).cast("long")).as("sum_chars"))
    val in = conserve(d.select("doc_id", "text", "lang", "n_chars", "source"))
    val back = conserve(reread)
    assert(in.exceptAll(back).isEmpty && back.exceptAll(in).isEmpty,
      "per-source conservation must hold bit-for-bit through the gzip round-trip")
  }
}

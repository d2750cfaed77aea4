package graft.sources

import graft.SparkSpec
import graft.contracts.{ColumnSpec, EdgeContract}
import org.apache.spark.sql.types._
import java.nio.file.Files

class LoaderSpec extends SparkSpec {
  import spark.implicits._

  private val contract = EdgeContract("loans", Seq(
    "loan_reference" -> ColumnSpec(StringType, required = true),
    "drawn_amount" -> ColumnSpec(DoubleType),
    "is_defaulted" -> ColumnSpec(BooleanType, default = Some(false)),
    "value_date" -> ColumnSpec(DateType)))

  test("CSV load: header, alias translation, typed conform, boolean default") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val csv = s"$dir/loans.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "LOAN_ID , drawn_amount,value_date,junk\n" +
      "L1,100.25,2024-03-01,zzz\n" +
      "L2,not_a_number,2024-13-99,zzz\n")
    val loaded = Loader.loadCsv(spark, csv, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    assert(loaded.errors.isEmpty)
    val rows = loaded.df.orderBy("loan_reference").collect()
    assert(loaded.df.columns.toSeq ==
      Seq("loan_reference", "drawn_amount", "is_defaulted", "value_date"))
    assert(rows(0).getDouble(1) == 100.25)
    assert(rows(0).getBoolean(2) == false)          // boolean default
    assert(rows(0).getDate(3).toString == "2024-03-01")
    assert(rows(1).isNullAt(1), "invalid double -> null")
    assert(rows(1).isNullAt(3), "invalid date -> null")
  }

  test("parquet round-trip with missing required column reports DQ001") {
    val dir = Files.createTempDirectory("graft_pq").toString
    Seq((1.0, "x")).toDF("drawn_amount", "extra").write.parquet(s"$dir/t")
    val loaded = Loader.loadParquet(spark, s"$dir/t", contract)
    assert(loaded.errors.map(_.code) == Seq("DQ001"))
    assert(loaded.df.columns.contains("loan_reference"))
    assert(loaded.df.first().isNullAt(0)) // typed-null backfill
  }

  test("NDJSON load: alias translation, typed conform, malformed line, no inference pass") {
    val dir = Files.createTempDirectory("graft_ndjson").toString
    val f = s"$dir/loans.json"
    Files.writeString(java.nio.file.Paths.get(f),
      // numeric token into the all-string schema, legacy name, undeclared field
      """{"loan_id":"L1","drawn_amount":100.25,"value_date":"2024-03-01","junk":"zzz"}""" + "\n" +
      // invalid typed values -> try_cast nulls
      """{"loan_id":"L2","drawn_amount":"not_a_number","value_date":"2024-13-99"}""" + "\n" +
      // malformed JSON line -> PERMISSIVE null-fill, row survives
      """{"loan_id":"L3","drawn_amount":""" + "\n")
    val loaded = Loader.loadNdjson(spark, f, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    assert(loaded.errors.isEmpty)
    val rows = loaded.df
      .orderBy(org.apache.spark.sql.functions.col("loan_reference")
        .asc_nulls_last)
      .collect()
    assert(loaded.df.columns.toSeq ==
      Seq("loan_reference", "drawn_amount", "is_defaulted", "value_date"))
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "L1")
    assert(rows(0).getDouble(1) == 100.25)          // number token -> string -> cast
    assert(rows(0).getBoolean(2) == false)          // boolean default
    assert(rows(0).getDate(3).toString == "2024-03-01")
    assert(rows(1).isNullAt(1), "invalid double -> null")
    assert(rows(1).isNullAt(3), "invalid date -> null")
    assert(rows(2).isNullAt(0), "malformed line null-fills (sorted last), never kills the job")
  }

  test("NDJSON load missing a required field reports DQ001 (parity with parquet/CSV)") {
    val dir = Files.createTempDirectory("graft_ndjson_dq").toString
    val f = s"$dir/loans.json"
    // a corrupt drop that lost loan_reference entirely: the fixed read
    // schema would silently conform it to all-null rows — the head-probe
    // must surface the loss as DQ001, exactly as the parquet path does
    Files.writeString(java.nio.file.Paths.get(f),
      """{"drawn_amount":100.25,"value_date":"2024-03-01"}""" + "\n" +
      """{"drawn_amount":7.5,"value_date":"2024-04-01"}""" + "\n")
    val loaded = Loader.loadNdjson(spark, f, contract)
    assert(loaded.errors.map(_.code) == Seq("DQ001"))
    assert(loaded.errors.head.column == "loan_reference")
    assert(loaded.df.columns.contains("loan_reference"))
    assert(loaded.df.first().isNullAt(0)) // typed-null backfill still lands
    // the legacy alias satisfies the canonical requirement — no DQ001
    val f2 = s"$dir/loans_alias.json"
    Files.writeString(java.nio.file.Paths.get(f2),
      """{"loan_id":"L1","drawn_amount":1.0}""" + "\n")
    val viaAlias = Loader.loadNdjson(spark, f2, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    assert(viaAlias.errors.isEmpty)
    assert(viaAlias.df.first().getString(0) == "L1")
  }

  test("NDJSON head probe is per-shard: presence is layout-independent") {
    val dir = Files.createTempDirectory("graft_ndjson_probe").toString
    // shard that sorts FIRST carries no loan_reference on any record (a
    // null-omitting writer over a null-heavy shard); the shard that
    // sorts LAST carries it. A single whichever-file-lists-first head
    // probe could verdict DQ001 here depending on enumeration order —
    // the per-file probe must find the field no matter the layout.
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0000.json"),
      (1 to 50).map(i => s"""{"drawn_amount":$i.5}""").mkString("\n") + "\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-zzzz.json"),
      """{"loan_reference":"L9","drawn_amount":1.0}""" + "\n")
    val loaded = Loader.loadNdjson(spark, dir, contract)
    assert(loaded.errors.isEmpty,
      s"field present in one shard of the estate must satisfy presence: ${loaded.errors}")
    assert(loaded.df.count() == 51)
  }

  test("NDJSON head probe prunes hidden DIRECTORIES, not just hidden leaf files") {
    val dir = Files.createTempDirectory("graft_ndjson_hidden").toString
    // the visible estate genuinely lost loan_reference everywhere...
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0000.json"),
      """{"drawn_amount":1.0}""" + "\n")
    // ...but an aborted writer left temp shards that DO carry the key,
    // under hidden dirs with VISIBLE leaf names (Spark's file index
    // prunes hidden components at every level; the probe must match, or
    // the phantom keys mask a genuine whole-estate DQ001 — r18 ADVICE)
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/_temporary/0"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/_temporary/0/part-0001.json"),
      """{"loan_reference":"GHOST","drawn_amount":9.0}""" + "\n")
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/.spark-staging-1"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/.spark-staging-1/part-0002.json"),
      """{"loan_reference":"GHOST2","drawn_amount":9.0}""" + "\n")
    val loaded = Loader.loadNdjson(spark, dir, contract)
    assert(loaded.errors.map(_.code) == Seq("DQ001"),
      s"hidden-dir temp shards must not mask the estate-wide loss: ${loaded.errors}")
    assert(loaded.errors.head.column == "loan_reference")
  }

  test("NDJSON head probe null-heavy caveat: spurious DQ001 within the bound, probeRecords clears it") {
    val dir = Files.createTempDirectory("graft_ndjson_nullheavy").toString
    // the documented false-positive shape: EVERY shard's head omits the
    // required key (null-omitting writer, null-heavy column); the key
    // first appears beyond the probe bound
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-0000.json"),
      """{"drawn_amount":1.0}""" + "\n" +
      """{"drawn_amount":2.0}""" + "\n" +
      """{"drawn_amount":3.0}""" + "\n" +
      """{"loan_reference":"L4","drawn_amount":4.0}""" + "\n")
    val tight = Loader.loadNdjson(spark, dir, contract, probeRecords = 2)
    assert(tight.errors.map(_.code) == Seq("DQ001"), "within the bound the loss is indistinguishable")
    assert(tight.errors.head.message.contains("probeRecords"),
      "the error text must name the escape hatch")
    // the escape hatch: a deeper probe sees past the null-heavy head
    val deep = Loader.loadNdjson(spark, dir, contract, probeRecords = 8)
    assert(deep.errors.isEmpty)
  }

  test("streaming NDJSON ingest: shards arriving over time land through the same seal") {
    val dir = Files.createTempDirectory("graft_ndjson_stream").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/shard-000.json"),
      """{"loan_id":"S1","drawn_amount":10.5,"value_date":"2024-01-01"}""" + "\n")
    val stream = Loader.streamNdjson(spark, dir, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("ndjson_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a late-arriving shard is picked up by the file source untouched
      Files.writeString(java.nio.file.Paths.get(s"$dir/shard-001.json"),
        """{"loan_id":"S2","drawn_amount":"bad","value_date":"2024-02-02"}""" + "\n")
      q.processAllAvailable()
      val rows = spark.table("ndjson_ingest")
        .orderBy("loan_reference").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("S1", "S2"))
      assert(rows(0).getDouble(1) == 10.5)
      assert(rows(1).isNullAt(1), "invalid double -> null, per micro-batch")
      assert(rows(0).getBoolean(2) == false) // boolean default holds in-stream
      assert(rows(1).getDate(3).toString == "2024-02-02")
    } finally q.stop()
  }

  test("compressed NDJSON shards load through the same seal (gzip, deflate, bzip2)") {
    import org.apache.spark.sql.functions.col
    // one estate per codec: Spark's text source dispatches the codec by
    // file EXTENSION, so each shard tree must prove its own decode path.
    // zstd is NOT in Spark's text-source codec set (CompressionCodecs
    // lists bzip2/deflate/gzip/lz4/snappy only — zstd is parquet/orc
    // side), so the compressed-NDJSON estate is gzip-first with deflate
    // and bzip2 (pure-JVM codecs, no native lib dependency) as the
    // alternates.
    for (codec <- Seq("gzip", "deflate", "bzip2")) {
      val dir = Files.createTempDirectory(s"graft_ndjson_$codec").toString
      Seq(("L1", 10.5, "2024-01-01"), ("L2", 20.0, "2024-02-02"))
        .toDF("loan_id", "drawn_amount", "value_date")
        .repartition(1)
        .write.mode("overwrite").option("compression", codec).json(dir)
      val compressed = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(compressed.nonEmpty && compressed.forall(!_.getName.endsWith(".json")),
        s"$codec shards must carry a codec extension: ${compressed.map(_.getName).toSeq}")
      val loaded = Loader.loadNdjson(spark, dir, contract,
        aliases = Map("loan_id" -> "loan_reference"))
      assert(loaded.errors.isEmpty, s"$codec: ${loaded.errors}")
      val rows = loaded.df.orderBy(col("loan_reference")).collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("L1", "L2"), s"$codec rows")
      assert(rows(0).getDouble(1) == 10.5 && rows(1).getDouble(1) == 20.0)
      assert(rows(0).getDate(3).toString == "2024-01-01")
    }
  }

  test("streaming NDJSON ingest decodes compressed shards arriving over time") {
    import org.apache.spark.sql.functions.col
    // the web-corpus arrival pattern: gzip shards landing in a directory;
    // the file stream source dispatches the codec by extension, so the
    // SAME streamNdjson seal must decode them per micro-batch
    val dir = Files.createTempDirectory("graft_ndjson_stream_gz").toString
    def gzShard(name: String, line: String): Unit = {
      val out = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(s"$dir/$name"))
      out.write((line + "\n").getBytes("UTF-8")); out.close()
    }
    gzShard("shard-000.json.gz",
      """{"loan_id":"G1","drawn_amount":5.5,"value_date":"2024-03-03"}""")
    val stream = Loader.streamNdjson(spark, dir, contract,
      aliases = Map("loan_id" -> "loan_reference"))
    val q = stream.writeStream.format("memory").queryName("ndjson_gz_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      gzShard("shard-001.json.gz",
        """{"loan_id":"G2","drawn_amount":7.25,"value_date":"2024-04-04"}""")
      q.processAllAvailable()
      val rows = spark.table("ndjson_gz_ingest")
        .orderBy(col("loan_reference")).collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("G1", "G2"))
      assert(rows(0).getDouble(1) == 5.5 && rows(1).getDouble(1) == 7.25)
      assert(rows(1).getDate(3).toString == "2024-04-04")
    } finally q.stop()
  }

  test("audit-cache sink writes frames plus manifest") {
    val dir = Files.createTempDirectory("graft_audit").toString
    Sinks.writeAuditCache(Map(
      "a" -> spark.range(3).toDF(), "b" -> spark.range(5).toDF()), dir)
    val manifest = Files.readString(java.nio.file.Paths.get(s"$dir/manifest.json"))
    assert(manifest.contains("\"a\": 3") && manifest.contains("\"b\": 5"))
    assert(spark.read.parquet(s"$dir/a").count() == 3)
  }
}

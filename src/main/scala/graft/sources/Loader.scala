package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.contracts.{CalcError, EdgeContract}

/** Contract-enforcing loader (reference `engine/loader.py`): scan →
  * normalise column names → translate legacy aliases → lenient-seal
  * against the table's EdgeContract (cast declared dtypes invalid→null,
  * add missing optional columns as typed nulls, Boolean-only defaults,
  * drop undeclared columns, DQ001 errors for missing required columns).
  *
  * Parquet and CSV front-ends share the same conform path — format is an
  * input detail, the sealed frame is the contract.
  */
final case class LoadedTable(df: DataFrame, errors: Seq[CalcError])

object Loader {

  /** lowercase + trim — the reference's name normalisation
    * (`engine/loader.py:197-221`). */
  private def normalise(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c.trim.toLowerCase))

  /** legacy→canonical renames applied at load only
    * (`engine/loader.py:177-194`). */
  private def translateAliases(df: DataFrame, aliases: Map[String, String]): DataFrame =
    aliases.foldLeft(df) { case (d, (legacy, canonical)) =>
      if (d.columns.contains(legacy) && !d.columns.contains(canonical))
        d.withColumnRenamed(legacy, canonical)
      else d
    }

  def loadParquet(
      spark: SparkSession, path: String, contract: EdgeContract,
      aliases: Map[String, String] = Map.empty): LoadedTable = {
    val raw = spark.read.parquet(path)
    val (df, errs) = contract.seal(translateAliases(normalise(raw), aliases))
    LoadedTable(df, errs)
  }

  def loadCsv(
      spark: SparkSession, path: String, contract: EdgeContract,
      aliases: Map[String, String] = Map.empty,
      header: Boolean = true): LoadedTable = {
    // all-string read; the contract's try_cast does the typed conversion
    // with invalid→null (reference CSVLoader + enforce_schema)
    val raw = spark.read
      .option("header", header.toString)
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
    val (df, errs) = contract.seal(translateAliases(normalise(raw), aliases))
    LoadedTable(df, errs)
  }

  /** NDJSON (one JSON record per line — the web-corpus interchange
    * format) through the SAME conform path. The read schema is built
    * from the contract's declared names plus the legacy alias names,
    * every field as STRING: Spark's JSON reader stringifies any atomic
    * token into a StringType field, so this is the CSV all-string
    * discipline (try_cast recovers the types, invalid→null) AND it
    * skips schema inference — at 100 TB an inference pass would read
    * the corpus twice. Undeclared fields never leave the scan
    * (column pruning at the source), malformed lines null-fill
    * (PERMISSIVE).
    *
    * DQ001 parity with parquet/CSV: the fixed read schema makes every
    * declared column "present" to `seal`, so presence is instead judged
    * from the shard estate's OWN keys — a bounded head probe (the NDJSON
    * analogue of CSV's header peek; no full scan, no inference pass)
    * parses the field names of the first `probeRecords` records OF EVERY
    * SHARD, and a required column whose canonical name AND legacy
    * aliases all fail to appear in any probed record is reported as
    * DQ001. Probing each shard's head (rather than the first N records
    * of whichever shard the file listing yields first) makes the verdict
    * LAYOUT-INDEPENDENT: a whole-estate field loss is caught no matter
    * how the shards are ordered, and a field present in only one shard
    * of a thousand still counts as present. The probe is distributed
    * (one task per file batch) and per-file bounded (`probeRecords`
    * lines and a byte cap), so cost scales with shard COUNT, never
    * corpus size.
    *
    * KNOWN SAMPLING CAVEAT: null-omitting NDJSON writers (Spark's own
    * JSON sink drops null fields per record) make "key absent" and
    * "value null" indistinguishable — an estate where EVERY shard's
    * first `probeRecords` records all carry null in a required column
    * reads as missing and draws a spurious DQ001 (the error text names
    * the probe bound and the `probeRecords` escape hatch, so the 3 a.m.
    * operator is told the fix without reading source). Callers ingesting
    * null-heavy estates should raise `probeRecords`; the alternative —
    * an exact full count — would read the corpus twice at 100 TB,
    * which is exactly what the fixed-schema design exists to avoid. */
  def loadNdjson(
      spark: SparkSession, path: String, contract: EdgeContract,
      aliases: Map[String, String] = Map.empty,
      probeRecords: Int = 1024): LoadedTable = {
    val raw = spark.read
      .schema(ndjsonSchema(contract, aliases))
      .option("mode", "PERMISSIVE")
      .json(path)
    val present = ndjsonPresentKeys(spark, path, probeRecords)
    val missing = contract.columns.collect {
      case (name, spec) if spec.required && !present.contains(name) &&
          !aliases.exists { case (legacy, canonical) =>
            canonical == name && present.contains(legacy) } =>
        CalcError("DQ001",
          s"required column missing at edge '${contract.name}' " +
            s"(absent from the first $probeRecords NDJSON records of " +
            "every shard; if the estate's writer omits null fields and " +
            "this column is null-heavy, raise probeRecords)",
          table = contract.name, column = name)
    }
    val (df, errs) = contract.seal(ndjsonAliased(raw, aliases))
    LoadedTable(df, missing ++ errs)
  }

  /** Union of field names carried by the first `probeN` records of EVERY
    * file in an NDJSON shard estate (normalised like column names).
    * File enumeration order over a multi-shard estate is unspecified, so
    * a single `textFile(path).limit(n)` head would make the DQ001
    * verdict depend on which shard happens to list first; probing each
    * file's own head makes it a function of estate CONTENT only.
    * Bounded work: per file, at most `probeN` lines and
    * [[ProbeByteCapPerFile]] bytes are read (a shard's head, streamed —
    * compressed shards decode through the Hadoop codec for their
    * suffix); the file list fans out over tasks, so the probe
    * parallelises with shard count. Unparseable probe lines contribute
    * no keys (they are the PERMISSIVE reader's null-fill rows, not
    * evidence of schema). */
  private val ProbeByteCapPerFile: Long = 8L * 1024 * 1024

  private def ndjsonPresentKeys(
      spark: SparkSession, path: String, probeN: Int): Set[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    val roots = Option(fs.globStatus(root)).map(_.toSeq).getOrElse(Seq.empty)
    // same hidden-path discipline as Spark's file index, applied to EVERY
    // path component under the probe root, not just the leaf: an
    // in-flight or aborted writer's shards live under visible names
    // inside hidden dirs (_temporary/, .spark-staging*/), and probing
    // them would union phantom field keys across shards — masking a
    // genuine whole-estate DQ001 (_SUCCESS, .crc and temporaries never
    // carry schema evidence at any depth)
    def hidden(name: String): Boolean =
      name.startsWith("_") || name.startsWith(".")
    val files = roots.flatMap { st =>
      if (st.isDirectory) {
        val rootUri = st.getPath.toUri
        val it = fs.listFiles(st.getPath, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) buf += it.next().getPath
        buf.toSeq.filterNot { p =>
          rootUri.relativize(p.toUri).getPath.split("/").exists(hidden)
        }
      } else Seq(st.getPath).filterNot(p => hidden(p.getName))
    }.map(_.toString).sorted
    if (files.isEmpty) return Set.empty
    // Hadoop Configuration is not serializable — ship the entries and
    // rebuild per task (bounded: a few hundred conf keys)
    val confKv = hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    val byteCap = ProbeByteCapPerFile
    val slices = math.min(files.size, 64)
    spark.sparkContext.parallelize(files, slices).mapPartitions { fit =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confKv.foreach { case (k, v) => conf.set(k, v) }
      val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      fit.flatMap { f =>
        val p = new Path(f)
        val keys = scala.collection.mutable.Set.empty[String]
        try {
          val rawIn = p.getFileSystem(conf).open(p)
          val in = Option(codecs.getCodec(p))
            .map(_.createInputStream(rawIn): java.io.InputStream)
            .getOrElse(rawIn: java.io.InputStream)
          try {
            val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
              in, java.nio.charset.StandardCharsets.UTF_8))
            var lines = 0
            var bytes = 0L
            var line = rd.readLine()
            while (line != null && lines < probeN && bytes < byteCap) {
              lines += 1
              bytes += line.length + 1L
              try {
                val node = mapper.readTree(line)
                if (node != null && node.isObject)
                  node.fieldNames.asScala.foreach(k => keys += k.trim.toLowerCase)
              } catch { case _: Exception => () }
              line = rd.readLine()
            }
          } finally in.close()
        } catch { case _: java.io.IOException => () } // vanished shard: no evidence
        keys.iterator
      }
    }.collect().toSet
  }

  /** Streaming NDJSON ingest — the continuous-arrival twin of
    * [[loadNdjson]] (corpus shards landing in a directory over time),
    * through the IDENTICAL fixed-schema read + alias-coalesce + seal
    * path: the file source tails the directory, each micro-batch is
    * conformed by the same contract, and the seal's select/try_cast
    * plan is fully streaming-compatible (no action, no inference).
    * The batch loader's required-key head probe does NOT run here — the
    * directory may legitimately be empty at stream start; run
    * [[loadNdjson]] over landed shards when a DQ001 verdict is needed. */
  def streamNdjson(
      spark: SparkSession, dir: String, contract: EdgeContract,
      aliases: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.readStream
      .schema(ndjsonSchema(contract, aliases))
      .option("mode", "PERMISSIVE")
      .json(dir)
    contract.seal(ndjsonAliased(raw, aliases))._1
  }

  /** Contract names plus legacy alias names, all STRING — the fixed
    * (inference-free) NDJSON read schema. */
  private def ndjsonSchema(contract: EdgeContract,
      aliases: Map[String, String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      (contract.columns.map(_._1) ++ aliases.keys).distinct.map(
        org.apache.spark.sql.types.StructField(
          _, org.apache.spark.sql.types.StringType)))

  /** Unlike CSV (whose header tells us which names the file really
    * carries), the fixed JSON schema materialises BOTH the canonical
    * and the legacy name — the one the file lacks reads all-null. So
    * an alias here is a per-record coalesce (canonical wins when a
    * record carries both), then the legacy column is dropped. */
  private def ndjsonAliased(raw: DataFrame,
      aliases: Map[String, String]): DataFrame =
    aliases.foldLeft(normalise(raw)) {
      case (d, (legacy, canonical)) =>
        if (d.columns.contains(legacy) && d.columns.contains(canonical))
          d.withColumn(canonical,
            org.apache.spark.sql.functions.coalesce(
              d(canonical), d(legacy))).drop(legacy)
        else d
    }
}

/** Export sinks (reference `api/export.py` parquet/csv exporters +
  * `observability/audit_cache.py` per-run artifacts with manifest.json).
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** NDJSON export — one JSON record per line, the shard format every
    * downstream training-data consumer reads. */
  def writeNdjson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Audit-cache style export: each frame to parquet + a manifest.json of
    * row counts (the driver-side provenance record). */
  def writeAuditCache(frames: Map[String, DataFrame], dir: String): Unit = {
    val counts = frames.map { case (name, df) =>
      writeParquet(df, s"$dir/$name")
      name -> df.count()
    }
    val manifest = counts
      .map { case (k, v) => s"""  "$k": $v""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/manifest.json"), manifest)
  }
}

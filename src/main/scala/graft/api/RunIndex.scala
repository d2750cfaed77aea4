package graft.api

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** Calculation run index — "has this exact calculation already been
  * run?" (reference `api/run_index.py`).
  *
  * Fingerprints a calculation request as the run parameters plus a
  * stat-based signature (relative path, size, mtime ns) of every input
  * file under the data path, then indexes completed SUCCESSFUL runs by
  * fingerprint (latest wins, capped with oldest-first eviction) so
  * callers can reuse the cached run instead of re-running the pipeline.
  *
  * Reuse is conservative by construction: any input file change,
  * addition or removal produces a different fingerprint — and callers
  * compute the fingerprint BEFORE running and register it after
  * success, so an input that changes mid-run leaves a stored signature
  * that no longer matches the on-disk state at lookup time and the
  * stale run is never reused.
  *
  * With `persistPath` every registration writes through to a small
  * JSON file reloaded at the next startup (the reference's
  * `configure_persistence` shape), so the index outlives the process.
  */
final class RunIndex(
    maxEntries: Int = 64, persistPath: Option[Path] = None) {

  // fingerprint -> run id, insertion-ordered for oldest-first eviction
  private val index = new java.util.LinkedHashMap[String, String]()

  persistPath.filter(Files.exists(_)).foreach { p =>
    val text = Files.readString(p)
    // entries are constrained (hex fp, run-id), so a targeted scan
    // suffices — the same flat-JSON discipline as the REST bodies
    val entry = """"([0-9a-f]{64})"\s*:\s*"([^"]+)"""".r
    entry.findAllMatchIn(text).foreach(m => index.put(m.group(1), m.group(2)))
  }

  /** The request fingerprint: params + per-file (relpath, size,
    * mtime ns), order-independent in params and path-sorted in files. */
  def fingerprint(dataDir: String, params: Map[String, String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    def put(s: String): Unit = {
      md.update(s.getBytes("UTF-8")); md.update(0.toByte)
    }
    params.toSeq.sortBy(_._1).foreach { case (k, v) => put(k); put(v) }
    val root = Paths.get(dataDir)
    if (Files.isDirectory(root)) {
      val walk = Files.walk(root)
      try {
        walk.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .toSeq
          .sortBy(p => root.relativize(p).toString)
          .foreach { p =>
            put(root.relativize(p).toString)
            put(Files.size(p).toString)
            put(Files.getLastModifiedTime(p).to(TimeUnit.NANOSECONDS).toString)
          }
      } finally walk.close()
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Index a successful run (latest wins; cap evicts oldest). Eviction
    * only drops the index entry — run artifacts are the caller's to
    * sweep (the reference's recorded still-serving caveat). */
  def register(fp: String, runId: String): Unit = synchronized {
    index.remove(fp)
    index.put(fp, runId)
    while (index.size > maxEntries) {
      val it = index.keySet.iterator(); it.next(); it.remove()
    }
    persistPath.foreach { p =>
      val json = index.asScala
        .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
      Files.writeString(p, json)
    }
  }

  /** The reusable run for this fingerprint, if one is indexed. */
  def findReusable(fp: String): Option[String] =
    synchronized(Option(index.get(fp)))
}

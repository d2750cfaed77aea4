package graft.api

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The run-index contract: conservative-by-construction reuse — any
  * parameter or input-file change breaks the fingerprint; the cap
  * evicts oldest-first; persistence survives a restart. */
class RunIndexSpec extends AnyFunSuite {

  private def tmpData(): java.nio.file.Path = {
    val d = Files.createTempDirectory("graft-runindex")
    Files.writeString(d.resolve("a.parquet"), "aaaa")
    Files.writeString(d.resolve("b.parquet"), "bb")
    d
  }

  test("fingerprint is stable, param-sensitive and file-stat-sensitive") {
    val d = tmpData()
    val idx = new RunIndex()
    val params = Map("permissionMode" -> "irb", "framework" -> "CRR")
    val fp1 = idx.fingerprint(d.toString, params)
    assert(fp1 == idx.fingerprint(d.toString, params), "must be deterministic")
    assert(fp1 != idx.fingerprint(d.toString, params + ("framework" -> "BASEL_3_1")))
    // content growth changes size -> different fingerprint
    Files.writeString(d.resolve("a.parquet"), "aaaa-changed")
    assert(fp1 != idx.fingerprint(d.toString, params), "file change must break reuse")
    // file addition changes the walk -> different fingerprint
    val fp2 = idx.fingerprint(d.toString, params)
    Files.writeString(d.resolve("c.parquet"), "c")
    assert(fp2 != idx.fingerprint(d.toString, params), "new file must break reuse")
  }

  test("register/find with latest-wins and oldest-first eviction") {
    val idx = new RunIndex(maxEntries = 2)
    idx.register("f1", "run-1")
    idx.register("f2", "run-2")
    assert(idx.findReusable("f1").contains("run-1"))
    idx.register("f1", "run-9") // latest wins, refreshes recency
    idx.register("f3", "run-3") // evicts the oldest entry (f2)
    assert(idx.findReusable("f1").contains("run-9"))
    assert(idx.findReusable("f2").isEmpty, "oldest entry must be evicted")
    assert(idx.findReusable("f3").contains("run-3"))
  }

  test("persistence writes through and reloads at startup") {
    val p = Files.createTempDirectory("graft-runindex-p").resolve("run_index.json")
    val idx = new RunIndex(persistPath = Some(p))
    val fp = "ab" * 32 // a well-formed 64-hex fingerprint
    idx.register(fp, "run-7")
    val reloaded = new RunIndex(persistPath = Some(p))
    assert(reloaded.findReusable(fp).contains("run-7"))
  }
}

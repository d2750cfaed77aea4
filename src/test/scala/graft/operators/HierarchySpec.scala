package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  //      gp
  //     /
  //    p        isolated_root (only appears as a parent)
  //   / \
  //  c1  c2     cyc_a <-> cyc_b (cycle)
  private def edges = Seq(
    ("c1", "p"), ("c2", "p"), ("p", "gp"),
    ("x", "isolated_root"),
    ("cyc_a", "cyc_b"), ("cyc_b", "cyc_a")
  ).toDF("child", "parent")

  test("driver-side ultimate-parent resolution with depth and path") {
    val out = Hierarchy.resolveUltimateParents(edges, "child", "parent")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getSeq[String](3))).toMap
    assert(out("c1") == (("gp", 2, Seq("c1", "p", "gp"))))
    assert(out("c2")._1 == "gp")
    assert(out("p") == (("gp", 1, Seq("p", "gp"))))
    assert(out("gp") == (("gp", 0, Seq("gp")))) // root resolves to itself
    assert(out("x")._1 == "isolated_root")
    assert(out("cyc_a")._2 == -1, "cycles flagged with depth -1, not thrown")
  }

  test("distributed fixpoint resolution agrees with driver-side on the DAG part") {
    val dag = edges.filter(!col("child").startsWith("cyc"))
    val driver = Hierarchy.resolveUltimateParents(dag, "child", "parent")
      .select("child", "ultimate_parent").as[(String, String)].collect().toMap
    val fix = Hierarchy.resolveByFixpoint(dag, "child", "parent")
      .as[(String, String)].collect().toMap
    // fixpoint output covers the child side only
    driver.filter(kv => fix.contains(kv._1)).foreach { case (k, v) =>
      assert(fix(k) == v, s"fixpoint mismatch for $k")
    }
    assert(fix("c1") == "gp" && fix("p") == "gp")
  }

  test("ancestor closure emits the sorted audit list") {
    val out = Hierarchy.ancestorClosure(edges.filter(!col("child").startsWith("cyc")),
        "child", "parent")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("c1") == "p,gp")
    assert(out("gp") == "")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall side of the sketch-operator story (the q57–q62 audits pin
  * precision): every approximate operator must clear its documented
  * recall floor against its exact sibling. q85 enforces the same
  * invariant in the battery; this runs it in-suite at sf0.001 and
  * records the measured values for tuning visibility. */
class SketchRecallSpec extends AnyFunSuite with SparkTestBase {

  test("approximate operators clear their recall floors (sf0.001)") {
    val stats = QueriesLlm.sketchRecall(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(stats.size == 4)
    stats.foreach { r =>
      info(f"${r.getString(0)}%-12s recall=${r.getDouble(1)}%.4f floor=${r.getDouble(2)}%.2f")
    }
    val bad = stats.filter(r => r.getDouble(1) < r.getDouble(2))
    assert(bad.isEmpty, s"recall below floor: ${bad.mkString(", ")}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hydrate

/** Placeholder hydration vs the reference's hydrate_query
  * (Pype.py:170-177). */
class HydrateSpec extends AnyFunSuite {

  test("replaces braced placeholders with values") {
    assert(Hydrate("SELECT * FROM t WHERE d < '{cutoff}'",
      Map("cutoff" -> "1997-01-01")) ==
      "SELECT * FROM t WHERE d < '1997-01-01'")
  }

  test("replaces every occurrence of the same placeholder") {
    assert(Hydrate("{x} + {x}", Map("x" -> "1")) == "1 + 1")
  }

  test("multiple placeholders hydrate independently") {
    assert(Hydrate("{a}-{b}", Map("a" -> "1", "b" -> "2")) == "1-2")
  }

  test("un-braced occurrences of a placeholder name are never touched") {
    // the reference replaces bare str(key) anywhere, corrupting queries
    // whose column names collide with placeholder names; we don't
    assert(Hydrate("SELECT cutoff FROM t WHERE d < '{cutoff}'",
      Map("cutoff" -> "X")) == "SELECT cutoff FROM t WHERE d < 'X'")
  }

  test("placeholders absent from the map are left intact") {
    assert(Hydrate("{missing}", Map("other" -> "v")) == "{missing}")
  }

  test("empty map is identity") {
    assert(Hydrate("SELECT 1", Map.empty) == "SELECT 1")
  }
}

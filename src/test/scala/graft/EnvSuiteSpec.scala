package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.EnvSuite

/** Contract of the shared env-var suite scoping (round-12 review: Bench's
  * SPARK_GRAFT_SCALE_SUITE and StreamScale's SPARK_GRAFT_STREAM_SUITE had
  * duplicated this block). Pure JVM — exercises the csv core directly, no
  * env mutation. */
class EnvSuiteSpec extends AnyFunSuite {
  private val known = Seq("q1", "q2", "q3")
  private def scope(csv: Option[String]) =
    EnvSuite.scopeCsv(csv, known, known.contains(_: String), "[spec] TEST_SUITE")

  test("unset var keeps the caller's full default suite") {
    assert(scope(None) == known)
  }

  test("csv keeps known names in asked order, drops unknown ones") {
    assert(scope(Some("q3, q_bogus ,q1")) == Seq("q3", "q1"))
  }

  test("whitespace-and-commas-only csv scopes to the empty suite") {
    // Explicit-but-empty means "run nothing", not "fall back to all" —
    // a typo'd csv silently running the full 79-query sweep would burn
    // the driver's time box.
    assert(scope(Some(" , ,")) == Seq.empty)
  }

  test("all-unknown csv scopes to the empty suite, not the default") {
    assert(scope(Some("q_bogus,q_nope")) == Seq.empty)
  }
}

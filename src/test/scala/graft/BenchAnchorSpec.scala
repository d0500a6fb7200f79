package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Drift-anchor hygiene ([[Bench.loadRefFloor]]): a committed
  * BENCH_DETAIL.json that itself reports drifted queries must never
  * serve as the quiet reference — anchoring on a contaminated run's
  * inflated floors blinds the detector to exactly those queries. */
class BenchAnchorSpec extends AnyFunSuite {

  private def write(json: String): String = {
    val f = Files.createTempFile("bench_detail", ".json")
    Files.write(f, json.getBytes("UTF-8"))
    f.toString
  }

  test("clean detail serves floors; drifted detail is refused whole") {
    val clean = write(
      """{"metric":"detail","value":1.0,"unit":"sec",
         "queries":{"q_a":0.5,"q_b":1.5},"drifted":[],"sf":"/data/sf0.1"}""")
    assert(Bench.loadRefFloor(clean, "/data/sf0.1") ==
      Map("q_a" -> 0.5, "q_b" -> 1.5))

    val drifted = write(
      """{"metric":"detail","value":9.0,"unit":"sec",
         "queries":{"q_a":4.5,"q_b":1.5},"drifted":["q_a"],"sf":"/data/sf0.1"}""")
    assert(Bench.loadRefFloor(drifted, "/data/sf0.1").isEmpty,
      "a detail with non-empty drifted must not anchor the detector")

    // pre-upgrade details carry no drifted field — treated as clean
    val legacy = write(
      """{"metric":"detail","value":1.0,"queries":{"q_a":0.7},"sf":"/data/sf0.1"}""")
    assert(Bench.loadRefFloor(legacy, "/data/sf0.1") == Map("q_a" -> 0.7))
  }

  test("a drifted run quarantines its detail instead of overwriting the primary") {
    assert(Bench.detailTarget(driftedNonEmpty = false) == "BENCH_DETAIL.json")
    assert(Bench.detailTarget(driftedNonEmpty = true) == "BENCH_DETAIL_DIRTY.json",
      "a contaminated run must never overwrite the committed quiet detail")
  }

  test("floors only transfer within the same scale factor") {
    val other = write(
      """{"queries":{"q_a":0.5},"drifted":[],"sf":"/data/sf0.01"}""")
    assert(Bench.loadRefFloor(other, "/data/sf0.1").isEmpty)
    assert(Bench.loadRefFloor("/nonexistent/path.json", "/data/sf0.1").isEmpty)
  }
}

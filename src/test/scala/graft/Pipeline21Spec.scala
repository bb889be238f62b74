package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Pipeline21

/** Batch twenty-one: the greedy coverage fold on hand gram sets
  * (q147) — argmax, marginal arithmetic, tie-breaks, zero-marginal
  * continuation.
  */
class Pipeline21Spec extends AnyFunSuite {

  test("q147 core: greedy coverage — marginals, ties, cumulative") {
    // 1 covers {a b c d}; 3 adds e; 4 adds f; 2 adds nothing
    val cands = Seq(
      1L -> Set("a", "b", "c", "d"),
      2L -> Set("a", "b"),
      3L -> Set("c", "d", "e"),
      4L -> Set("f"))
    val out = Pipeline21.coverageSelect(cands, k = 4)
    assert(out == Seq(
      (1L, 1L, 4L, 4L), (2L, 3L, 1L, 5L), (3L, 4L, 1L, 6L),
      (4L, 2L, 0L, 6L))) // zero-marginal pick still emitted, ties by id
  }

  test("q147: equal-size opening sets tie-break to the smaller doc_id") {
    val cands = Seq(2L -> Set("x", "y"), 1L -> Set("p", "q"))
    val out = Pipeline21.coverageSelect(cands, k = 1)
    assert(out == Seq((1L, 1L, 2L, 2L)))
  }
}

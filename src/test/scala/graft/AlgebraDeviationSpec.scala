package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PostingAlgebra._
import TestSpark.{multiset, postingsDf}

/** Witness tests for the DELIBERATE deviations PostingAlgebra documents from
  * the reference's positional semantics — each test proves the reference
  * model really does differ on the crafted input, so the deviation stays
  * asserted (visible) rather than silently assumed (VERDICT r2 #7).
  */
class AlgebraDeviationSpec extends AnyFunSuite {

  test("OR tie: reference drops the larger lhs score, we keep the max") {
    // lhs has score 5 at offset 1; rhs has score 2 at offset 1. The reference
    // union drops the lhs element at the tie (query.cc:84-88), so even
    // RemoveDuplicates(max) afterwards yields 2. Our bag-union keeps 5.
    val a = Vector((1L, 5.0))
    val b = Vector((1L, 2.0))
    val ref = RefModel.dedup(RefModel.union(a, b), useMax = true)
    assert(ref == Vector((1L, 2.0))) // reference: rhs wins at the tie
    assert(multiset(dedupMax(or(postingsDf(a), postingsDf(b)))) ==
      multiset(Vector((1L, 5.0)))) // ours: max wins
  }

  test("theta on duplicate rhs: reference walks 1:1, we compare against rhs max") {
    // rhs has two postings at offset 1 (scores 1 and 9). lhs (score 5) pairs
    // 1:1 with the FIRST rhs posting in the reference (5 > 1 keeps it); we
    // compare against the rhs max (5 > 9 is false — dropped).
    val a = Vector((1L, 5.0))
    val b = Vector((1L, 1.0), (1L, 9.0))
    assert(RefModel.thetaJoin(a, b, _ > _) == Vector((1L, 5.0)))
    assert(multiset(thetaCompare(postingsDf(a), postingsDf(b), ">")).isEmpty)
  }

  test("theta on duplicate lhs: reference drops the rest of the run, we keep it") {
    // lhs has two postings at offset 2; rhs one. The reference pairs the
    // FIRST lhs element with the rhs element (0 > 0 fails), advances both,
    // and never compares the second — result empty. We compare every lhs row
    // against the rhs (max) score: (2, 2.0) survives.
    val a = Vector((2L, 0.0), (2L, 2.0))
    val b = Vector((2L, 0.0))
    assert(RefModel.thetaJoin(a, b, _ > _).isEmpty)
    assert(multiset(thetaCompare(postingsDf(a), postingsDf(b), ">")) ==
      multiset(Vector((2L, 2.0))))
  }

  test("orderBy on duplicate rhs: reference takes first score, we take max") {
    val a = Vector((1L, 0.0))
    val b = Vector((1L, 2.0), (1L, 7.0))
    assert(RefModel.orderBy(a, b) == Vector((1L, 2.0)))
    assert(multiset(orderByQuery(postingsDf(a), postingsDf(b))) ==
      multiset(Vector((1L, 7.0))))
  }
}

package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.PostingAlgebra
import graft.operators.PostingAlgebra._
import TestSpark.{multiset, postingsDf}

/** Scalacheck laws pinning PostingAlgebra against RefModel — the in-memory
  * transcription of /root/reference/src/query.cc:68-196,358-392,519-628.
  * Where PostingAlgebra documents a DELIBERATE deviation (or-tie, theta on
  * duplicate rhs, orderBy on duplicate rhs), the law asserts OUR contract and
  * a separate witness test (AlgebraDeviationSpec) proves the reference model
  * genuinely differs — an asserted deviation, not an accident.
  */
object AlgebraProps extends Properties("PostingAlgebra") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  /** Offset-sorted posting lists with duplicate offsets and small integral
    * scores (exact in Double, so multiset equality is meaningful). */
  val postings: Gen[Vector[(Long, Double)]] = for {
    n <- Gen.choose(0, 14)
    rows <- Gen.listOfN(n, for {
      off <- Gen.choose(0L, 9L)
      s <- Gen.choose(-3, 3)
    } yield (off, s.toDouble))
  } yield rows.toVector.sortBy(x => (x._1, x._2))

  /** Posting lists with at most one posting per offset. */
  val uniquePostings: Gen[Vector[(Long, Double)]] =
    postings.map(_.groupBy(_._1).map(_._2.head).toVector.sortBy(_._1))

  property("and == reference intersect (exact multiset, lhs dups kept)") =
    forAll(postings, postings) { (a, b) =>
      multiset(and(postingsDf(a), postingsDf(b))) ==
        multiset(RefModel.intersect(a, b))
    }

  property("subtract == reference subtract (exact multiset)") =
    forAll(postings, postings) { (a, b) =>
      multiset(PostingAlgebra.subtract(postingsDf(a), postingsDf(b))) ==
        multiset(RefModel.subtract(a, b))
    }

  property("or == bag union (our pinned contract)") =
    forAll(postings, postings) { (a, b) =>
      multiset(or(postingsDf(a), postingsDf(b))) == multiset(a ++ b)
    }

  property("dedupMax(or) == per-offset max of both sides") =
    forAll(postings, postings) { (a, b) =>
      val want = (a ++ b).groupBy(_._1).view
        .mapValues(_.map(_._2).max).toMap
      multiset(dedupMax(or(postingsDf(a), postingsDf(b)))) ==
        multiset(want.toVector.map { case (o, s) => (o, s) })
    }

  // Parity requires unique offsets on BOTH sides: the reference's 1:1 walk
  // consumes the rhs element on the first lhs duplicate, silently dropping
  // the rest of the lhs run (see AlgebraDeviationSpec for the witness).
  property("thetaCompare == reference 1:1 join when offsets unique") =
    forAll(uniquePostings, uniquePostings) { (a, b) =>
      multiset(thetaCompare(postingsDf(a), postingsDf(b), ">")) ==
        multiset(RefModel.thetaJoin(a, b, _ > _))
    }

  property("orderByQuery == reference OrderBy when rhs offsets unique") =
    forAll(postings, uniquePostings) { (a, b) =>
      // left join against a unique rhs emits one row per lhs ROW, exactly
      // like the reference's per-element walk — exact multiset equality.
      multiset(orderByQuery(postingsDf(a), postingsDf(b))) ==
        multiset(RefModel.orderBy(a, b))
    }

  property("dedupMax/Min == reference RemoveDuplicates") =
    forAll(postings) { a =>
      multiset(dedupMax(postingsDf(a))) == multiset(RefModel.dedup(a, useMax = true)) &&
        multiset(dedupMin(postingsDf(a))) == multiset(RefModel.dedup(a, useMax = false))
    }

  property("score filters == reference remove_if") =
    forAll(postings, Gen.choose(-3, 3), Gen.oneOf("=", ">", ">=", "<", "<=")) {
      (a, n, op) =>
        val spark = op match {
          case "=" => scoreEq(postingsDf(a), n.toDouble)
          case o => scoreCmp(postingsDf(a), o, n.toDouble)
        }
        multiset(spark) == multiset(RefModel.filterCmp(a, op, n.toDouble))
    }

  property("scoreRange swaps reversed bounds") =
    forAll(postings, Gen.choose(-3, 3), Gen.choose(-3, 3)) { (a, lo, hi) =>
      multiset(scoreRange(postingsDf(a), lo.toDouble, hi.toDouble)) ==
        multiset(RefModel.inRange(a, lo.toDouble, hi.toDouble))
    }

  property("negate == reference") = forAll(postings) { a =>
    multiset(PostingAlgebra.negate(postingsDf(a))) == multiset(RefModel.negate(a))
  }

  property("topK == sort by (score desc, off asc) then page") =
    forAll(postings, Gen.choose(0L, 8L), Gen.choose(0L, 4L)) { (a, lim, skip) =>
      // distinct scores per offset set not required: our tie order is pinned
      // (off asc), so exact sequence equality holds against the model.
      val d = RefModel.dedup(a.sortBy(x => (x._1, x._2)), useMax = true)
      val got = topK(dedupMax(postingsDf(a)), lim, skip).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toVector
      got == RefModel.topK(d, lim, skip)
    }

  property("randomSample: deterministic across partition layouts") =
    forAll(postings, Gen.choose(1, 6)) { (a, n) =>
      val df = postingsDf(a)
      val s1 = randomSample(df.repartition(1), n).collect().toVector
      val s7 = randomSample(df.repartition(7), n).collect().toVector
      s1.map(r => (r.getLong(0), r.getDouble(1))) ==
        s7.map(r => (r.getLong(0), r.getDouble(1)))
    }
}

package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.ml.Sketches

/** Scalacheck laws for the mergeable sketches, checked against plain-Scala
  * references over RANDOM multisets rather than hand-built fixtures:
  * KMV's split-merge law under an arbitrary partition of the input, HLL's
  * partition/order invariance (the exact-harmonic-sum claim), and CMS's
  * one-sided error. The references recompute the md5-derived hashes
  * independently (java.security.MessageDigest), so a drift in the column
  * expressions' hash convention fails these laws, not just the oracle. */
object SketchesProps extends Properties("Sketches") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash48(salt: String, v: String): Long =
    java.lang.Long.parseLong(md5hex(salt + v).substring(0, 12), 16)

  private val eventsGen: Gen[Vector[(String, Int)]] = for {
    n <- Gen.choose(1, 300)
    ts <- Gen.choose(1, 3)
    us <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      t <- Gen.choose(0, ts - 1)
      u <- Gen.choose(0, us - 1)
    } yield (s"t$t", u))
  } yield rows.toVector

  property("KMV == plain-Scala min-k reference, and split-merge == whole " +
    "under an arbitrary input partition") = forAll(eventsGen,
    Gen.choose(2, 5)) { (rows, mod) =>
    val df = rows.toDF("event_type", "user_id")
    val got = Sketches.kmvDistinct(df).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toMap
    // reference: distinct hashes per type, min-k, integer estimator
    val ref = rows.distinct.groupBy(_._1).map { case (t, rs) =>
      val hs = rs.map(r => hash48("kmv:", r._2.toString)).distinct.sorted
        .take(Sketches.KmvK)
      val est = if (hs.length < Sketches.KmvK) hs.length.toLong
        else (Sketches.KmvK - 1).toLong * 281474976710656L / hs.last
      t -> ((hs.length, hs.last, est))
    }
    // arbitrary split: rows partitioned by user hash mod `mod`; per-split
    // sketches merged by re-sketching the union of kept hash pairs
    val splits = (0 until mod).map(i => rows.filter(_._2 % mod == i))
      .filter(_.nonEmpty)
    val mergedKept = splits.flatMap { part =>
      part.distinct.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
        rs.map(r => hash48("kmv:", r._2.toString)).distinct.sorted
          .take(Sketches.KmvK).map(h => (t, h))
      }
    }
    val merged = mergedKept.distinct.groupBy(_._1).map { case (t, ps) =>
      val hs = ps.map(_._2).sorted.take(Sketches.KmvK)
      t -> ((hs.length, hs.last))
    }
    got == ref && ref.forall { case (t, (nk, kh, _)) =>
      merged(t) == ((nk, kh))
    }
  }

  property("HLL estimate is invariant under repartition AND under " +
    "register-level split-merge (exact harmonic sum)") =
    forAll(eventsGen, Gen.choose(2, 4)) { (rows, mod) =>
      val df = rows.toDF("event_type", "user_id")
      val whole = Sketches.hllDistinct(df).collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val re = Sketches.hllDistinct(df.repartition(7)).collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val parts = (0 until mod).map(i => rows.filter(_._2 % mod == i))
        .filter(_.nonEmpty).map(_.toDF("event_type", "user_id"))
      val regs = parts.map(Sketches.hllRegisters)
        .reduce(_ unionByName _)
        .groupBy("event_type", "reg").agg(max("mr").as("mr"))
      val merged = Sketches.hllFold(regs).collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
      whole == re && whole == merged
    }

  private val docsGen: Gen[Vector[(Long, String)]] = for {
    n <- Gen.choose(1, 30)
    vocab <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 40)
      ws <- Gen.listOfN(len, Gen.choose(0, vocab - 1))
    } yield ws.map(w => s"w$w").mkString(" "))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toVector

  property("CMS point estimates are >= the true frequency on arbitrary " +
    "token multisets") = forAll(docsGen) { rows =>
    val out = Sketches.cmsHeavyHitters(rows.toDF("doc_id", "text"), 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val truth = rows.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, os) => t -> os.length.toLong }
    out.nonEmpty && out.forall { case (tok, freq, est) =>
      freq == truth(tok) && est >= freq
    }
  }

  private val valuesGen: Gen[Vector[(String, Double)]] = for {
    n <- Gen.choose(1, 300)
    ts <- Gen.choose(1, 3)
    rows <- Gen.listOfN(n, for {
      t <- Gen.choose(0, ts - 1)
      c <- Gen.choose(1L, 60000L) // cents, 2-decimal money shape
    } yield (s"t$t", c / 100.0))
  } yield rows.toVector

  property("HDR quantile sketch == plain-Scala bucket/rank reference " +
    "exactly, on arbitrary positive 2-decimal multisets") =
    forAll(valuesGen) { rows =>
      // independent reference: the rank-k value's bucket lower bound under
      // the same bit-length law — the sketch must pick EXACTLY this bucket
      // (values in earlier buckets are all strictly below the ranked value)
      val ref = rows.groupBy(_._1).map { case (t, rs) =>
        val cents = rs.map(r => math.round(r._2 * 100)).sorted
        def est(k: Int): Long = {
          val rank = math.max(1L, (k.toLong * cents.size + 99) / 100)
          val v = cents(rank.toInt - 1)
          val m = if (v == 0) 1
            else 64 - java.lang.Long.numberOfLeadingZeros(v)
          val shift = math.max(m - (Sketches.HdrSubBits + 1), 0)
          (v >> shift) << shift
        }
        t -> ((cents.size.toLong, est(50), est(95), est(99)))
      }
      val got = Sketches.hdrReport(rows.toDF("event_type", "value"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      got == ref
    }
}

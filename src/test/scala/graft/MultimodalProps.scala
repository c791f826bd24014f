package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.Multimodal

/** Codec fuzz for the binary-PGM decoder — the Spark build's analogue of
  * the reference's codec round-trip/fuzz tier
  * (/root/reference/src/format_test.cc:53-124: random payloads must
  * round-trip; directed corruptions must fail cleanly, never crash).
  * Random valid images (any header whitespace mix) must decode to the
  * planted pixels exactly; random corruptions (bad magic, truncation,
  * oversized maxval, zero dims, missing separator) must yield None.
  */
object MultimodalProps extends Properties("Multimodal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val ws: Gen[String] = Gen.oneOf(" ", "\n", "\t", "\r", "\n\n", " \n")

  private val validImage: Gen[(Int, Int, Array[Byte], Array[Byte])] = for {
    w <- Gen.choose(1, 20)
    h <- Gen.choose(1, 20)
    maxv <- Gen.choose(1, 255)
    px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    w1 <- ws; w2 <- ws; w3 <- Gen.oneOf(" ", "\n", "\t", "\r")
  } yield {
    val header = s"P5$w1$w$w2$h${w3.head}$maxv"
    // exactly ONE whitespace byte separates maxval from pixels
    val payload = header.getBytes("ISO-8859-1") ++ Array('\n'.toByte) ++
      px.map(_.toByte).toArray
    (w, h, px.map(_.toByte).toArray, payload)
  }

  property("valid PGM round-trips: dims + pixels recovered exactly") =
    forAll(validImage) { case (w, h, px, payload) =>
      Multimodal.decodePgm(payload) match {
        case Some((gw, gh, gpx)) =>
          gw == w && gh == h &&
            gpx.toSeq == px.toSeq.map(b => b.toInt & 0xff)
        case None => false
      }
    }

  property("trailing extra bytes are tolerated; truncated pixels are not") =
    forAll(validImage, Gen.choose(1, 5)) { case ((w, h, _, payload), cut) =>
      val extra = Multimodal.decodePgm(payload ++ Array.fill(cut)(7.toByte))
      val trunc = Multimodal.decodePgm(payload.dropRight(cut))
      extra.isDefined && trunc.isEmpty
    }

  property("corruptions decode to None, never crash") =
    forAll(validImage, Gen.oneOf("magic", "maxval", "zerow", "nosep")) {
      case ((w, h, _, payload), mode) =>
        val corrupted = mode match {
          case "magic" => "P6".getBytes ++ payload.drop(2)
          case "maxval" =>
            s"P5\n$w $h 9999\n".getBytes ++ Array.fill(w * h)(1.toByte)
          case "zerow" =>
            s"P5\n0 $h 255\n".getBytes ++ Array.fill(w * h)(1.toByte)
          case "nosep" => s"P5 $w $h 255".getBytes // header ends at EOF
        }
        Multimodal.decodePgm(corrupted).isEmpty
    }

  // aHash's design claim: the bit pattern is invariant under a uniform
  // brightness shift (the threshold is the image's own mean, and the
  // compare is exact integer math, so the shift cancels algebraically)
  property("aHash invariant under uniform brightness shift") =
    forAll(for {
      n <- Gen.choose(2, 64)
      px <- Gen.listOfN(n, Gen.choose(0, 200))
      c <- Gen.choose(0, 55)
    } yield (px.toArray, c)) { case (px, c) =>
      Multimodal.aHashBits(px) == Multimodal.aHashBits(px.map(_ + c))
    }

  // clustered 63-bit hashes (a base string plus few-bit mutants) so the
  // generator actually produces pairs on BOTH sides of the k = 3 radius
  private val hashSetGen: Gen[Vector[String]] = for {
    base <- Gen.listOfN(63, Gen.oneOf('0', '1')).map(_.mkString)
    n <- Gen.choose(2, 12)
    rows <- Gen.listOfN(n, for {
      nf <- Gen.choose(0, 6)
      idx <- Gen.pick(nf, 0 until 63)
    } yield base.zipWithIndex
      .map { case (ch, i) =>
        if (idx.contains(i)) (if (ch == '0') '1' else '0') else ch }
      .mkString)
  } yield rows.toVector

  property("phash Hamming banding finds EXACTLY the distance<=3 pairs " +
    "(pigeonhole recall is total; no false positives survive the verify)") =
    forAll(hashSetGen) { hs =>
      import TestSpark.spark
      import spark.implicits._
      val df = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc_id", "ph")
      val got = Multimodal.phashNearFrom(df, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ref = (for {
        a <- hs.indices; b <- hs.indices if a < b
        d = hs(a).zip(hs(b)).count { case (x, y) => x != y }
        if d <= 3
      } yield (a.toLong, b.toLong, d.toLong)).toSet
      got == ref
    }

  property("composite hash: aHash AND dHash are brightness-shift " +
    "invariant together") =
    forAll(for {
      n <- Gen.choose(2, 64)
      px <- Gen.listOfN(n, Gen.choose(0, 200))
      c <- Gen.choose(0, 55)
    } yield (px.toArray, c)) { case (px, c) =>
      Multimodal.aHashBits(px) + Multimodal.dHashBits(px) ==
        Multimodal.aHashBits(px.map(_ + c)) +
        Multimodal.dHashBits(px.map(_ + c))
    }
}

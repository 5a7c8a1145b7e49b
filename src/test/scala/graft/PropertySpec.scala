package graft

import java.sql.Timestamp
import graft.functions.FitsHeader
import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.Ev
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.2): reference-documented contracts
  * checked over generated inputs. (Raw scalacheck runner — the
  * scalatestplus bridge is not on the classpath.) */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }

  test("FitsHeader render/parse round-trips arbitrary keyword maps") {
    val keyGen = Gen.nonEmptyListOf(Gen.alphaUpperChar).map(_.mkString.take(8))
      // reserved cards: parse STOPS at END and SKIPS comment-class keys,
      // so they cannot round-trip as ordinary keywords (rare seed flake)
      .suchThat(k => !Set("END", "COMMENT", "HISTORY").contains(k))
    val valGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(40))
    val kvGen = Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.toSeq.take(20))
    check(Prop.forAll(kvGen) { kv =>
      val parsed = FitsHeader.parse(FitsHeader.render(kv))
      kv.toMap.forall { case (k, v) => parsed.get(k).contains(v) }
    })
  }

  test("foldSessions conserves events and orders sessions") {
    val evGen = Gen.listOf(Gen.chooseNum(0L, 100000L)).map { ts =>
      ts.sorted.zipWithIndex.map { case (t, i) =>
        Ev(i.toLong, new Timestamp(t), 1L, "e", 1.0)
      }
    }
    check(Prop.forAll(evGen, Gen.chooseNum(1L, 5000L)) { (evs, gap) =>
      val (closed, open) = StreamingAnalytics.foldSessions(evs, gap, None)
      val total = closed.map(_.n).sum + open.map(_.n).sum
      val conserved = total == evs.length
      // sessions are disjoint and time-ordered; intra-session span respects gap chain
      val allSessions = closed ++ open.toSeq
      val ordered = allSessions.sortBy(_.start).sliding(2).forall {
        case Seq(a, b) => a.last < b.start && (b.start - a.last) > gap
        case _ => true
      }
      conserved && ordered
    })
  }

  test("decode-stub histogram inversion is exact for arbitrary payloads") {
    // q_media_features' oracle rests on round(hist_i * len) == count_i —
    // exact while counts < 2^23 (float division error ≤ 2^-24 relative).
    // Check over arbitrary byte payloads, including skewed ones.
    import graft.operators.MultimodalOps.{DecodeStub, MediaFile}
    val genBytes = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(1, 2000).flatMap(n =>
        Gen.chooseNum(Byte.MinValue, Byte.MaxValue).map(b => List.fill(n)(b))))
    check(Prop.forAll(genBytes) { bs =>
      val bytes = bs.toArray
      val want = new Array[Long](16)
      bytes.foreach(b => want((b & 0xFF) % 16) += 1L)
      val feats = DecodeStub.decode(MediaFile(1L, "image", bytes, Map.empty))
      val got = feats.feature.map(h =>
        math.round(h.toDouble * bytes.length))
      got.sameElements(want)
    })
  }

  test("IsoBmff.probe never throws or loops on arbitrary bytes") {
    // the box walker consumes UNTRUSTED payloads: any byte soup —
    // including soup that starts with a plausible ftyp header and
    // hostile size fields — must terminate quickly with Some or None,
    // never an exception. Also fuzz mutations of a VALID container,
    // which exercise deeper walk paths than pure noise ever reaches.
    import graft.functions.IsoBmff
    val noise = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    val ftypPrefixed = noise.map { bs =>
      val header = Array[Byte](0, 0, 0, 20, 'f', 't', 'y', 'p')
      header ++ bs.toArray
    }
    // a small valid file to mutate (mirror of the synthesized layout)
    val valid: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + 8 + 108)
      bb.putInt(20); bb.put("ftypisom".getBytes("ISO-8859-1"))
      bb.putInt(0); bb.put("isom".getBytes("ISO-8859-1"))
      bb.putInt(116); bb.put("moov".getBytes("ISO-8859-1"))
      bb.putInt(108); bb.put("mvhd".getBytes("ISO-8859-1"))
      bb.putInt(0); bb.putInt(0); bb.putInt(0)
      bb.putInt(1000); bb.putInt(777)
      bb.array()
    }
    val mutated = for {
      pos <- Gen.chooseNum(0, valid.length - 1)
      b <- Gen.chooseNum(Byte.MinValue, Byte.MaxValue)
    } yield { val c = valid.clone(); c(pos) = b; c }
    val anyInput: Gen[Array[Byte]] = Gen.oneOf(
      noise.map(_.toArray), ftypPrefixed, mutated)
    check(Prop.forAll(anyInput) { bytes =>
      IsoBmff.probe(bytes) match {
        case Some(v) => v.timescale > 0 // the only way Some is produced
        case None => true
      }
    })
    // the unmutated fixture itself parses
    assert(IsoBmff.probe(valid).exists(v =>
      v.timescale == 1000L && v.duration_ms == 777L))
  }

  test("rateHex: monotone in rate, sentinel exactly at >= 1") {
    // stratifiedSample keeps a row iff md5-prefix < rateHex(rate): the
    // threshold must be monotone (a higher rate never keeps fewer rows)
    // and the above-every-hex sentinel must appear exactly at rate >= 1
    val rGen = Gen.chooseNum(-0.5, 1.5)
    check(Prop.forAll(rGen, rGen) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val mono = graft.operators.CurationOps.rateHex(lo) <=
        graft.operators.CurationOps.rateHex(hi)
      val sentinel =
        (graft.operators.CurationOps.rateHex(hi) == "g") == (hi >= 1.0)
      mono && sentinel
    })
  }

  test("nite cutoff: every timestamp maps to exactly one nite, monotone") {
    // the shared SparkSpec session — building one here with a different
    // master would make the singleton session suite-order dependent
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tsGen = Gen.listOfN(50, Gen.chooseNum(1704067200000L, 1706745600000L))
    check(Prop.forAll(tsGen) { ms =>
      val df = ms.map(new Timestamp(_)).toDF("ts")
        .withColumn("nite", graft.functions.Derived.niteOf(col("ts")))
      val rows = df.select("ts", "nite").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1)))
      // monotone: later timestamp never maps to an earlier nite
      rows.sortBy(_._1).map(_._2).sliding(2).forall {
        case Array(a, b) => a <= b
        case _ => true
      }
    })
  }
}

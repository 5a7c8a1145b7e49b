package graft

import graft.functions.Derived
import org.apache.spark.sql.functions._

class DerivedSpec extends SparkSpec {
  import spark.implicits._

  test("niteOf: 15:00 cutoff boundary (monitor:707-715 semantics)") {
    val df = Seq(
      "2024-03-05 14:59:59", // before cutoff -> previous nite
      "2024-03-05 15:00:00", // at cutoff -> same nite
      "2024-03-05 15:00:01",
      "2024-03-06 00:30:00"  // after midnight, before cutoff -> previous day
    ).toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(Derived.niteOf($"ts")).as[String].collect()
    assert(got.sameElements(Array("20240304", "20240305", "20240305", "20240305")))
  }

  test("bandOf: first token, null-safe (monitor:752-758)") {
    val df = Seq(Some("g DECam SDSS c0001"), Some("  r  trailing"),
      Some(""), None).toDF("f")
    val got = df.select(Derived.bandOf($"f")).collect().map(r =>
      Option(r.getString(0)))
    assert(got.sameElements(Array(Some("g"), Some("r"), None, None)))
  }

  test("expnum round-trip via decamNameOf (monitor:341, 844-846)") {
    val df = Seq(123L, 99999999L).toDF("expnum")
    val got = df.select(Derived.expnumOf(Derived.decamNameOf($"expnum")))
      .as[Long].collect()
    assert(got.sameElements(Array(123L, 99999999L)))
    val miss = Seq("not_a_decam_file.txt").toDF("n")
      .select(Derived.expnumOf($"n")).collect()
    assert(miss.head.isNullAt(0))
  }

  test("filetypeOf classifier (save:36-45)") {
    val df = Seq("x.fits", "x.fits.fz", "manifest_SN001.json",
      "manifest_other.json", "junk.txt").toDF("n")
    val got = df.select(Derived.filetypeOf($"n")).collect()
      .map(r => Option(r.getString(0)))
    assert(got.sameElements(Array(Some("raw"), Some("raw"),
      Some("snmanifest"), None, None)))
  }

  test("payload pairing strips only trailing .dbb (save:318)") {
    val df = Seq("DECam_1.fits.fz.dbb", "x.dbb.keep").toDF("n")
    val got = df.select(Derived.payloadNameOf($"n")).as[String].collect()
    assert(got.sameElements(Array("DECam_1.fits.fz", "x.dbb.keep")))
  }

  test("manifestNameOf strips [ :-] from seqid (monitor:769-774)") {
    val got = Seq("2024-01-15 03:21:00").toDF("seqid")
      .select(Derived.manifestNameOf($"seqid")).as[String].collect()
    assert(got.head == "manifest_20240115032100.json")
  }
}

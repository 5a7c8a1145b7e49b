package graft

import graft.functions.FitsHeader
import org.scalatest.funsuite.AnyFunSuite

class FitsHeaderSpec extends AnyFunSuite {

  test("render/parse round-trip") {
    val kv = Seq("SIMPLE" -> "T", "DATE-OBS" -> "2024-01-15T03:21:00",
      "FILTER" -> "g DECam SDSS c0001", "RA" -> "54.21", "EXPTIME" -> "90")
    val bytes = FitsHeader.render(kv)
    assert(bytes.length % 2880 == 0)
    val parsed = FitsHeader.parse(bytes)
    assert(parsed("DATE-OBS") == "2024-01-15T03:21:00")
    assert(parsed("FILTER") == "g DECam SDSS c0001")
    assert(parsed("RA") == "54.21")
    assert(parsed.size == kv.size)
  }

  test("stops at END and ignores trailing bytes") {
    val bytes = FitsHeader.render(Seq("A" -> "1")) ++ Array.fill(160)('X'.toByte)
    assert(FitsHeader.parse(bytes) == Map("A" -> "1"))
  }

  test("quoted value with escaped quote and comment stripping") {
    val card = ("NAME    = 'O''Brien'           / observer".padTo(80, ' ') +
      "END".padTo(80, ' ')).getBytes("US-ASCII")
    assert(FitsHeader.parse(card)("NAME") == "O'Brien")
    val num = ("EXPTIME =                   90 / seconds".padTo(80, ' ') +
      "END".padTo(80, ' ')).getBytes("US-ASCII")
    assert(FitsHeader.parse(num)("EXPTIME") == "90")
  }

  test("empty and truncated input") {
    assert(FitsHeader.parse(Array.emptyByteArray).isEmpty)
    assert(FitsHeader.parse("SHORT".getBytes).isEmpty)
  }
}

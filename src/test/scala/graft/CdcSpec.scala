package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps

/** [[graft.operators.CurationOps]] CDC family — content-defined
  * chunking. Oracled rows: q_cdc_chunks/q_cdc_dedup/q_cdc_shift; this
  * pins reassembly, determinism, and the insertion-robustness claim. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: (Long, String)*) =
    CurationOps.cdcChunksOf(rows.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en")))

  test("reassembly: chunks partition the token stream in order") {
    val txt = (1 to 100).map(i => s"w$i").mkString(" ")
    val back = chunksOf((1L, txt))
      .select(col("chunk_id"), col("n_tok"))
      .collect().sortBy(_.getLong(0))
    assert(back.map(_.getInt(1)).sum == 100, "no token lost or duplicated")
    assert(back.map(_.getLong(0)).toSeq == back.indices.map(_.toLong),
      "chunk ids are dense from 0")
  }

  test("boundaries are content-anchored: a head insertion only perturbs " +
      "the first chunk region") {
    val txt = (1 to 200).map(i => s"w$i").mkString(" ")
    val orig = chunksOf((1L, txt)).select(col("chunk_fp"))
      .collect().map(_.getString(0)).toSet
    val shifted = chunksOf((1L, "ins1 ins2 ins3 " + txt))
      .select(col("chunk_fp")).collect().map(_.getString(0)).toSet
    val survived = orig.intersect(shifted).size
    assert(survived.toDouble / orig.size > 0.5,
      s"most CDC chunks must survive a head insertion: " +
        s"$survived of ${orig.size}")
  }

  test("determinism: identical input, identical chunk table") {
    val txt = (1 to 60).map(i => s"t$i").mkString(" ")
    def fps() = chunksOf((7L, txt))
      .orderBy(col("chunk_id")).collect()
      .map(r => (r.getLong(2), r.getString(4))).toSeq
    assert(fps() == fps())
  }

  test("declared shift probe: CDC survives where the fixed grid dies") {
    val rows = CurationOps.cdcShift(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val (cdcTot, cdcShared, cdcPct) = rows("cdc")
    val (fixTot, fixShared, fixPct) = rows("fixed")
    assert(cdcTot > 0 && fixTot > 0)
    assert(cdcPct > fixPct,
      s"CDC must out-survive the fixed grid: cdc=$cdcPct% fixed=$fixPct%")
    assert(cdcPct >= 50, s"bulk of CDC chunks survive: $cdcPct%")
    assert(cdcShared <= cdcTot && fixShared <= fixTot)
  }

  test("cdc dedup shares the owner-resolution semantics") {
    val out = CurationOps.cdcDedup(spark, sfDir)
    assert(out.where(col("n_dup_chunks") > col("n_chunks")).isEmpty)
    assert(out.count() > 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationOps

/** [[graft.operators.CurationOps]] privacy census — k-anonymity and
  * l-diversity over the released quasi-identifier columns. The oracled
  * rows are q_k_anonymity / q_k_generalize / q_l_diversity; this pins
  * the class-accounting identities and the generalization-ladder
  * monotonicity the remediation claim rests on. */
class PrivacySpec extends SparkSpec {

  test("k-anonymity: classes partition the corpus, flag matches size") {
    val k = CurationOps.kAnonymity(spark, sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(k.agg(sum(col("n_docs"))).head().getLong(0) == docs,
      "equivalence classes must partition the corpus exactly")
    assert(k.where(col("at_risk") =!=
      (col("n_docs") < CurationOps.KAnonK)).isEmpty)
  }

  test("generalization ladder: at-risk population monotone non-increasing") {
    val rungs = CurationOps.kGeneralize(spark, sfDir)
      .orderBy(col("width")).collect()
    assert(rungs.length == CurationOps.KAnonWidths.length)
    val atRisk = rungs.map(_.getAs[Long]("n_docs_at_risk"))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => b <= a },
      s"coarsening must not grow risk: ${atRisk.toSeq}")
    val classes = rungs.map(_.getAs[Long]("n_classes"))
    assert(classes.zip(classes.tail).forall { case (a, b) => b <= a },
      "coarsening only merges classes")
  }

  test("release risk: audits exactly the admitted population, exact ppm") {
    val rr = CurationOps.releaseRisk(spark, sfDir).collect()
    val funnel = CurationOps.curationFunnel(spark, sfDir)
      .where(col("stage") === "8_admitted")
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(rr.nonEmpty)
    rr.foreach { r =>
      val (lang, adm, risk, ppm) = (r.getAs[String]("lang"),
        r.getAs[Long]("n_admitted"), r.getAs[Long]("n_at_risk"),
        r.getAs[Long]("risk_ppm"))
      assert(adm == funnel(lang),
        s"$lang: audit population $adm != funnel admitted ${funnel(lang)}")
      assert(risk <= adm)
      assert(ppm == risk * 1000000L / adm, "ppm must be the exact share")
    }
  }

  test("l-diversity: l bounded by class size and sensitive domain") {
    val ld = CurationOps.lDiversity(spark, sfDir)
    assert(ld.where(col("l") > col("n_docs")).isEmpty)
    assert(ld.where(col("l") > 4).isEmpty,
      "sensitive domain is {email, phone, ip, none}")
    assert(ld.where(col("disclosure") =!= (col("l") === 1)).isEmpty)
    // singleton classes are always single-valued: disclosure ⊇ (n=1)
    assert(ld.where(col("n_docs") === 1 && !col("disclosure")).isEmpty)
  }
}

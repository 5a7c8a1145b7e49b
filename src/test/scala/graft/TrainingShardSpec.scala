package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** Round-9 training-shard export: balanced deterministic shards plus a
  * reconcilable manifest. */
class TrainingShardSpec extends SparkSpec {

  test("export: preservation, determinism, manifest reconciles") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = CurationOps.writeTrainingShards(spark, docs, out, 4)
      .collect().sortBy(_.getAs[Long]("shard"))
    // every doc lands in exactly one shard; totals preserved
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val back = spark.read.parquet(s"$out/docs")
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    assert(back.select("shard").distinct().count() <= 4)
    // the auditor's recompute equals the written manifest exactly
    val audit = CurationOps.auditTrainingShards(spark, out)
      .collect().sortBy(_.getAs[Long]("shard"))
    assert(audit.map(_.toSeq).toSeq == manifest.map(_.toSeq).toSeq,
      "manifest must reconcile with the shard read-back")
    // a second export of the same corpus is bit-identical (md5
    // placement — no rand, no task-order dependence)
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    val manifest2 = CurationOps.writeTrainingShards(spark, docs, out2, 4)
      .collect().sortBy(_.getAs[Long]("shard"))
    assert(manifest2.map(_.toSeq).toSeq == manifest.map(_.toSeq).toSeq)
    // hash balance: no shard is empty and none holds over half the docs
    val counts = manifest.map(_.getAs[Long]("n_docs"))
    assert(counts.forall(c => c > 0 && c < docs.count() / 2 + 1),
      s"shard skew out of envelope: ${counts.toSeq}")
  }

  test("redacted export: shards scan clean, audit reconciles") {
    import spark.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "en", "mail alice@example.com and call 555-123-4567 soon"),
      (2L, "en", "server 10.0.0.1 is fine"),
      (3L, "en", "a clean third document"),
      (4L, "en", "bob.smith@mail.co wrote this"))
      .toDF("doc_id", "lang", "text")
    val out = java.nio.file.Files.createTempDirectory("redact").toString
    val manifest = CurationOps.writeTrainingShards(spark,
      TextOps.redactedDocs(docs), out, 2)
    // every exported document re-scans clean — no residual identifiers
    val back = spark.read.parquet(s"$out/docs")
    val rescan = TextOps.piiScanCore(back).collect()
    assert(rescan.length == 4)
    assert(rescan.forall(r => !r.getAs[Boolean]("has_pii")),
      s"exported shards must carry no PII: ${rescan.mkString("; ")}")
    // placeholders landed (the clean doc is untouched)
    val texts = back.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L).contains("<EMAIL>") && texts(1L).contains("<PHONE>"))
    assert(texts(2L).contains("<IP>"))
    assert(texts(3L) == "a clean third document")
    // the audit contract holds over the redacted corpus too
    val audit = CurationOps.auditTrainingShards(spark, out)
      .collect().sortBy(_.getAs[Long]("shard")).map(_.toSeq).toSeq
    assert(audit == manifest.collect()
      .sortBy(_.getAs[Long]("shard")).map(_.toSeq).toSeq)
  }

  test("a tampered shard fails the audit") {
    import spark.implicits._
    val docs = Seq((1L, "en", "the a first doc"), (2L, "en", "the a second"),
      (3L, "en", "the a third one"), (4L, "en", "the a fourth"))
      .toDF("doc_id", "lang", "text")
    val out = java.nio.file.Files.createTempDirectory("tamper").toString
    val manifest = CurationOps.writeTrainingShards(spark, docs, out, 2)
      .collect().map(r => r.getAs[Long]("shard") -> r.toSeq).toMap
    // drop one doc from one shard's files (simulate partial data loss)
    val victim = spark.read.parquet(s"$out/docs")
      .orderBy("doc_id").select("doc_id").head().getLong(0)
    val kept = spark.read.parquet(s"$out/docs")
      .where(col("doc_id") =!= victim)
    val tampered = java.nio.file.Files.createTempDirectory("tampered").toString
    kept.write.partitionBy("shard").parquet(s"$tampered/docs")
    val audit = CurationOps.auditTrainingShards(spark, tampered)
      .collect().map(r => r.getAs[Long]("shard") -> r.toSeq).toMap
    assert(audit != manifest,
      "a missing document must change the audited fingerprint/counts")
  }
}

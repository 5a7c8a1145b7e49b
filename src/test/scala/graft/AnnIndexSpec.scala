package graft

import graft.operators.VectorOps
import org.scalatest.funsuite.AnyFunSuite

/** The ANN build/search split (VERDICT r6 #3): a [[VectorOps.writeAnnIndex]]
  * directory must serve searches identical to train-in-plan, and sampled
  * training must hold recall on clustered data. */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {

  test("from-index search is bit-identical to train-in-plan PQ") {
    val idx = java.nio.file.Files.createTempDirectory("annidx").toString
    VectorOps.writeAnnIndex(spark, sfDir, idx)
    // exact integer index relations → the parquet round-trip changes
    // nothing: same rows, same sims, same ranks
    val fromIdx = VectorOps.annPqFrom(spark, sfDir, idx)
      .collect().map(_.toSeq).toSet
    val inPlan = VectorOps.annPq(spark, sfDir).collect().map(_.toSeq).toSet
    assert(fromIdx == inPlan,
      s"from-index PQ must equal train-in-plan: ${fromIdx.diff(inPlan)} vs ${inPlan.diff(fromIdx)}")
    val refineIdx = VectorOps.annPqRefineFrom(spark, sfDir, idx)
      .collect().map(_.toSeq).toSet
    val refinePlan = VectorOps.annPqRefine(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(refineIdx == refinePlan, "from-index refine must equal in-plan")
    // and the cached search entry (the declared q_ann_pq_search) agrees
    val cached = VectorOps.annPqSearchCached(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(cached == inPlan, "cached search entry must equal q_ann_pq")
  }

  test("appendAnnIndex: appended vectors searchable without retraining") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("annapp").toString
    VectorOps.writeAnnIndex(spark, sfDir, idx)
    // clone QUERY vector 2 under a fresh id: identical embedding →
    // identical codes under the stored codebooks (deterministic encode)
    val v2 = graft.sources.Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === 2L).select(col("embedding")).head()
      .getAs[scala.collection.Seq[Float]](0).toSeq
    VectorOps.appendAnnIndex(spark,
      Seq((900002L, v2)).toDF("vec_id", "embedding"), idx, batchId = 1L)
    val (_, _, _, codes) = VectorOps.loadAnnIndex(spark, idx)
    def codesOf(id: Long) = codes.where(col("vec_id") === id).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSet
    assert(codesOf(900002L) == codesOf(2L) && codesOf(2L).nonEmpty,
      "the clone must encode to the original's codes")
    // the appended clone is the strongest possible ADC neighbor for its
    // own query — search must surface it at the per-query max sim
    def search() = VectorOps.annPqFrom(spark, sfDir, idx)
      .where(col("query_id") === 2L).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
    val res = search()
    assert(res.exists(_._1 == 900002L),
      s"appended clone missing from query 2's results: ${res.toSeq}")
    assert(res.find(_._1 == 900002L).get._2 == res.map(_._2).max,
      s"clone must carry the max ADC sim: ${res.toSeq}")
    // compaction folds the batch partitions without changing results
    val ((aB, aA), (cB, cA)) = VectorOps.compactAnnIndex(spark, idx)
    assert(aA <= aB && cA <= cB)
    assert(search().toSet == res.toSet, "compaction must not change search")
  }

  test("annIndexStaleness: missing appends and orphaned deletes counted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("annstale").toString
    VectorOps.writeAnnIndex(spark, sfDir, idx)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    // freshly built: full coverage, nothing missing or orphaned
    val fresh = VectorOps.annIndexStaleness(spark, emb, idx).head()
    assert(fresh.getAs[Long]("n_corpus") == n &&
      fresh.getAs[Long]("n_indexed") == n &&
      fresh.getAs[Long]("n_missing") == 0L &&
      fresh.getAs[Long]("n_orphaned") == 0L &&
      fresh.getAs[Long]("coverage_ppm") == 1000000L, s"fresh: $fresh")
    // corpus grows by 3 never-appended vectors and loses vector 2:
    // the report must count exactly those
    val dim = emb.select(org.apache.spark.sql.functions
      .size(col("embedding"))).first().getInt(0)
    val grown = emb.where(col("vec_id") =!= 2L)
      .select(col("vec_id"), col("embedding"))
      .union((1 to 3).map(i =>
        (800000L + i, Array.fill(dim)(0.1f * i))).toDF("vec_id", "embedding"))
    val stale = VectorOps.annIndexStaleness(spark, grown, idx).head()
    assert(stale.getAs[Long]("n_corpus") == n - 1 + 3, s"grown: $stale")
    assert(stale.getAs[Long]("n_missing") == 3L, s"missing: $stale")
    assert(stale.getAs[Long]("n_orphaned") == 1L, s"orphaned: $stale")
    // appending the new vectors clears `missing` (the steady-state fix)
    VectorOps.appendAnnIndex(spark, (1 to 3).map(i =>
      (800000L + i, Array.fill(dim)(0.1f * i))).toDF("vec_id", "embedding"),
      idx, batchId = 1L)
    val after = VectorOps.annIndexStaleness(spark, grown, idx).head()
    assert(after.getAs[Long]("n_missing") == 0L &&
      after.getAs[Long]("n_orphaned") == 1L, s"after append: $after")
  }

  test("near-dup from the persisted index equals train-in-plan IVF") {
    import graft.operators.DedupOps
    val idx = java.nio.file.Files.createTempDirectory("ndidx").toString
    val n = graft.functions.ScaleUtils.footerRowCount(
      spark, s"$sfDir/embeddings.parquet")
    val cells = DedupOps.ivfCells(n)
    // full-corpus training with the near-dup path's own cell policy →
    // identical centroids → identical pairs
    VectorOps.writeAnnIndex(spark, sfDir, idx, cells = cells)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val fromIdx = rows(DedupOps.cosineNearDupFromIndex(spark, sfDir, idx))
    val inPlan = rows(DedupOps.cosineNearDupIvfCore(spark,
      graft.sources.Tables.embeddings(spark, sfDir), cells,
      DedupOps.NearDupNProbe, DedupOps.CosineDupThreshold))
    assert(fromIdx == inPlan,
      s"from-index near-dup must equal train-in-plan: " +
        s"${fromIdx.diff(inPlan)} vs ${inPlan.diff(fromIdx)}")
  }

  /** 4 well-separated clusters + noise — the clustered structure real
    * embedding corpora have (the PQ-spec fixture shape). */
  private def clusteredDir(seed: Int): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val base = Array.tabulate(4, 64)((c, d) => if (d % 4 == c) 1.0f else 0.05f)
    val rows = (0 until 80).map { i =>
      val c = i % 4
      (i.toLong, s"l$c",
        base(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("annsample").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def recallAt5(dir: String, got: Array[org.apache.spark.sql.Row])
      : Double = {
    val truth = VectorOps.knnBruteForce(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val pairs = got
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    pairs.intersect(truth).size.toDouble / truth.size
  }

  test("sampled training holds recall on clustered data (measured envelope)") {
    val dir = clusteredDir(23)
    val fullIdx = java.nio.file.Files.createTempDirectory("annfull").toString
    val sampIdx = java.nio.file.Files.createTempDirectory("annsamp").toString
    VectorOps.writeAnnIndex(spark, dir, fullIdx)
    VectorOps.writeAnnIndex(spark, dir, sampIdx, trainFrac = 0.5)
    // the sample really is a strict, deterministic subset of the corpus
    val full = VectorOps.annPqFrom(spark, dir, fullIdx).collect()
    val samp = VectorOps.annPqFrom(spark, dir, sampIdx).collect()
    val rFull = recallAt5(dir, full)
    val rSamp = recallAt5(dir, samp)
    info(f"recall@5 vs brute force: full-trained $rFull%.2f, " +
      f"0.5-sampled $rSamp%.2f")
    // clustered data tolerates sampled training: the envelope recorded
    // in writeAnnIndex's scaladoc (measured here: full 0.76, sampled
    // 0.80 — half-corpus training costs nothing on clustered data)
    assert(rFull >= 0.7, s"full-trained recall@5 must be high, got $rFull")
    assert(rSamp >= rFull - 0.2,
      s"sampled training must stay within 0.2 of full: $rSamp vs $rFull")
    // determinism: rebuilding the sampled index reproduces the results
    val sampIdx2 = java.nio.file.Files.createTempDirectory("annsamp2").toString
    VectorOps.writeAnnIndex(spark, dir, sampIdx2, trainFrac = 0.5)
    assert(VectorOps.annPqFrom(spark, dir, sampIdx2).collect().map(_.toSeq)
      .sortBy(_.toString).toSeq == samp.map(_.toSeq).sortBy(_.toString).toSeq,
      "md5-threshold sampling is deterministic — rebuild must reproduce")
  }
}

package graft

import graft.operators.{DedupOps, VectorOps}
import org.apache.spark.sql.functions._

/** Round-10 cross-corpus reports: the source-overlap matrix (who
  * duplicates with whom), the cluster×source balance table, and
  * margin-based bitext mining. */
class CrossCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("source overlap: multiplicity pair math on planted groups") {
    // group 10: srcA×2 + srcB×1 → (A,A):1 pair, (A,B):2 pairs
    // group 20: srcB×2        → (B,B):1 pair
    // group 30: srcC×1        → no pairs anywhere (singleton source)
    val groups = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("doc_id", "rep_id")
    val prov = Seq((1L, "srcA"), (2L, "srcA"), (3L, "srcB"), (4L, "srcB"),
      (5L, "srcB"), (6L, "srcC")).toDF("doc_id", "source")
    val got = DedupOps.sourceOverlapFrom(groups, prov).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_pairs"))).toMap
    assert(got == Map(
      ("srcA", "srcA") -> (1L, 1L),
      ("srcA", "srcB") -> (1L, 2L),
      ("srcB", "srcB") -> (1L, 1L)))
  }

  test("source overlap: pair totals reconcile with group sizes on sf data") {
    // sum over the matrix = sum over groups of C(size, 2): both count
    // every unordered member pair exactly once
    val groups = DedupOps.textDedupGroups(spark, sfDir)
    val prov = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val matrixPairs = DedupOps.sourceOverlapFrom(groups, prov)
      .agg(sum(col("n_pairs"))).head.getLong(0)
    val groupPairs = groups.groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).head.getLong(0)
    assert(matrixPairs == groupPairs && matrixPairs > 0,
      s"matrix $matrixPairs vs groups $groupPairs")
  }

  test("cluster balance: shares are exact ppm of consistent totals") {
    val got = VectorOps.clusterSourceBalance(spark, sfDir)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // cl_total is the sum of its cluster's n_docs, every share is
    // n_docs·1e6 div cl_total, and shares sum to ≤ 1e6 per cluster
    // (truncation loses < |sources| ppm)
    val byCluster = rows.groupBy(_.getAs[Int]("cluster"))
    for ((cl, rs) <- byCluster) {
      val total = rs.head.getAs[Long]("cl_total")
      assert(rs.map(_.getAs[Long]("n_docs")).sum == total, s"cluster $cl")
      for (r <- rs)
        assert(r.getAs[Long]("share_ppm") ==
          r.getAs[Long]("n_docs") * 1000000L / total)
      val s = rs.map(_.getAs[Long]("share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rs.size, s"cluster $cl: $s")
    }
    // every embedded doc lands in exactly one cell
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val expected = VectorOps.kmeansAssign(spark, sfDir)
      .join(graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id")), col("vec_id") === col("doc_id"))
      .count()
    assert(nDocs == expected)
  }

  test("bitext margin: planted translation pair mined, hub rejected") {
    // 2-dim toy space. Probe 0 (en): target 100 at cosine 1.0, target
    // 101 orthogonal → margin 1.0, accepted. Probe 50 (en): two equal
    // targets at the same angle → margin 0, rejected (hub/copy case).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (50L, Array(0.0f, 1.0f)),
      (100L, Array(2.0f, 0.0f)), (101L, Array(0.0f, 3.0f)),
      (102L, Array(0.0f, 5.0f))).toDF("vec_id", "embedding")
    val langs = Seq((0L, "en"), (50L, "en"), (100L, "fr"), (101L, "fr"),
      (102L, "fr")).toDF("doc_id", "lang")
    val got = VectorOps.bitextMineFrom(spark,
        VectorOps.quantizedOf(spark, vecs), langs, "en", "fr")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 2)
    assert(got(0L).getAs[Long]("best_id") == 100L
      && got(0L).getAs[Double]("best_sim") == 1.0
      && got(0L).getAs[Double]("margin") == 1.0
      && got(0L).getAs[Boolean]("accept"))
    // probe 50: both fr targets on its own axis → sims 1.0 and 1.0,
    // tie-break best_id = 101, margin 0 → rejected despite max cosine
    assert(got(50L).getAs[Long]("best_id") == 101L
      && got(50L).getAs[Double]("margin") == 0.0
      && !got(50L).getAs[Boolean]("accept"))
  }

  test("bitext margin: probe/target languages enforced on sf data") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val langOf = docs.select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = VectorOps.bitextMine(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(langOf(r.getLong(0)) == "en")
      assert(langOf(r.getAs[Long]("best_id")) == "fr")
      assert(r.getLong(0) % VectorOps.BitextQueryMod == 0)
      assert(r.getAs[Double]("margin") >= 0.0)
    }
  }
}

package graft

import graft.operators.{ReconOps, RelationalOps, TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Reference invariants (SURVEY §5.2): the monitor's documented contract
  * "Never extra if delivered=False, but missing if delivered=True"
  * (monitor:5), set-difference disjointness, and sanity properties of the
  * EXT operators. */
class ReconInvariantsSpec extends SparkSpec {

  test("missing and extra partitions are disjoint (monitor:1022-1030)") {
    val st = ReconOps.expstate(spark, sfDir).collect()
      .map(r => r.getAs[String]("expstate") -> r.getAs[Long]("n_orders")).toMap
    // every order lands in exactly one state
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(st.values.sum == total)
    // 'extra' only from undelivered, 'missing' only from delivered —
    // encoded in the CASE; check both states actually partition
    assert(st.keySet.subsetOf(Set("ok", "missing", "extra", "not delivered")))
  }

  test("skip-marking keeps exactly one row per (user, type) unskipped (W1)") {
    val df = ReconOps.skipDuplicates(spark, sfDir)
    val kept = df.where(!col("skip")).groupBy("user_id", "event_type").count()
    assert(kept.where(col("count") =!= 1).count() == 0)
    // total conservation
    assert(df.count() ==
      spark.read.parquet(s"$sfDir/events.parquet").count())
  }

  test("top-k is a subset of the filtered set, ordered desc (T3)") {
    val rows = RelationalOps.topkErrors(spark, sfDir).collect()
    assert(rows.length == 20)
    val ts = rows.map(_.getAs[String]("ts_sec"))
    assert(ts.sameElements(ts.sorted(Ordering[String].reverse)))
  }

  test("jaccard best-match is symmetric-safe and within [0,1]") {
    val rows = TextOps.jaccardBestMatch(spark, sfDir).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("best_jac")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("best_match") != r.getAs[Long]("doc_id"))
    }
  }

  test("knn: self excluded, k rows per query, sim within [-1,1]") {
    val rows = VectorOps.knnBruteForce(spark, sfDir).collect()
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length == 5))
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") >= 5)
      val s = r.getAs[Double]("sim")
      assert(s >= -1.0 && s <= 1.0)
    }
  }
}

package graft

import graft.operators.RelationalOps

class ApproxDistinctSpec extends SparkSpec {
  test("approx_count_distinct within configured relative error") {
    val r = RelationalOps.approxDistinct(spark, sfDir).head()
    assert(r.getLong(0) > 0, "exact_parts positive")
    assert(r.getLong(1) > 0, "exact_orders positive")
    assert(r.getBoolean(2), "parts estimate within 3*rsd of exact")
    assert(r.getBoolean(3), "orders estimate within 3*rsd of exact")
  }

  test("table profile: planted nulls, mode tiebreak, exact distincts") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), "b"), (Some(3L), "a"), (Some(1L), "a"),
      (None, "a"), (Some(7L), "c")).toDF("k", "s")
    val got = RelationalOps.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6), r.getLong(7))).toMap
    // k: 5 rows, 1 null, distinct {1,3,7}; mode 3 (count 2); min "1"
    // max "7" as strings
    assert(got("k") == (5L, 1L, 3L, "1", "7", "3", 2L), s"got $got")
    // s: mode tiebreak never fires here (a wins 3-1-1); min/max lexical
    assert(got("s") == (5L, 0L, 3L, "a", "c", "a", 3L), s"got $got")
    // tiebreak: two values at count 2 -> the LOWER string wins
    val tie = Seq("x", "x", "y", "y", "z").toDF("t")
    val m = RelationalOps.profile(tie, Seq("t")).collect().head
    assert(m.getString(6) == "x" && m.getLong(7) == 2L,
      "modal tiebreak is (count desc, value asc)")
  }
}

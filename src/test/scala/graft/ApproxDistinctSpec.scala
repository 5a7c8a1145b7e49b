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
}

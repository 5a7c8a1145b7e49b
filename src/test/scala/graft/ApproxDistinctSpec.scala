package graft

import graft.operators.RelationalOps

class ApproxDistinctSpec extends SparkSpec {
  test("approx_count_distinct within configured relative error") {
    val r = RelationalOps.approxDistinct(spark, sfDir).head()
    val (exactP, approxP) = (r.getLong(0), r.getLong(1))
    val (exactO, approxO) = (r.getLong(2), r.getLong(3))
    assert(math.abs(approxP - exactP).toDouble / exactP < 0.1)
    assert(math.abs(approxO - exactO).toDouble / exactO < 0.1)
  }
}

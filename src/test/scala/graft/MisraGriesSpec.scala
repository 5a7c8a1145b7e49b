package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.MisraGriesTopK

/** The Misra-Gries TypedImperativeAggregate: buffer algebra pinned
  * by hand (update, offset-decrement eviction, the mergeable-summaries
  * merge rule, serialization round-trip), then the end-to-end contract
  * on planted-skew corpora under adversarial partitionings. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  private def est(b: MisraGriesTopK.Buffer): Map[String, Long] =
    b.estimates.map { case (t, e) => t.toString -> e }.toMap

  test("buffer update: classic MG trace with eviction, hand-stepped") {
    // k=2, stream a a a b c a:
    //   a->1, a->2, a->3, b->1 (slot free),
    //   c: full+unseen -> decrement-all (a->2, b evicted), c dropped,
    //   a->3
    val b = new MisraGriesTopK.Buffer
    Seq("a", "a", "a", "b", "c", "a").foreach(t => b.add(u(t), 2))
    assert(est(b) == Map("a" -> 3L))
    // bound: true(a)=4, est 3, n=6, n/(k+1)=2 -> undercount 1 <= 2
  }

  test("buffer update: estimates never exceed true counts") {
    val b = new MisraGriesTopK.Buffer
    val stream = Seq.tabulate(500)(i => s"t${i % 7}") ++ Seq.fill(300)("hot")
    stream.foreach(t => b.add(u(t), 3))
    val truth = stream.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    val n = stream.length
    est(b).foreach { case (t, e) =>
      assert(e <= truth(t), s"$t overestimated: $e > ${truth(t)}")
      assert(truth(t) - e <= n / 4, s"$t undercount beyond n/(k+1)")
    }
    // hot holds 300 > 800/4 -> guaranteed present
    assert(est(b).contains("hot"))
  }

  test("buffer merge: mergeable-summaries rule caps size and keeps bound") {
    val b1 = new MisraGriesTopK.Buffer
    val b2 = new MisraGriesTopK.Buffer
    val s1 = Seq.fill(40)("x") ++ Seq.tabulate(30)(i => s"a${i % 3}")
    val s2 = Seq.fill(35)("x") ++ Seq.tabulate(30)(i => s"b${i % 3}")
    s1.foreach(t => b1.add(u(t), 3))
    s2.foreach(t => b2.add(u(t), 3))
    b1.mergeIn(b2, 3)
    val e = est(b1)
    assert(e.size <= 3, s"merge left ${e.size} counters")
    // x: true 75 of n=135; bound n/(k+1) = 33
    assert(e.contains("x"), "merged sketch lost the heavy item")
    assert(e("x") <= 75L && 75L - e("x") <= 135L / 4)
  }

  test("buffer serialize round-trips estimates exactly") {
    val agg = MisraGriesTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(
        u("z"), org.apache.spark.sql.types.StringType), 4)
    val b = new MisraGriesTopK.Buffer
    Seq("p", "p", "q", "r", "q", "p", "s", "t").foreach(t => b.add(u(t), 4))
    val back = agg.deserialize(agg.serialize(b))
    assert(est(back) == est(b))
  }

  test("spark e2e: planted heavy key survives adversarial partitioning") {
    val mg = MisraGriesTopK.mgTopK(spark) _
    // 'hot' holds 40% of a 5000-token stream; 200 cold keys share the
    // rest. Sort so 'hot' concentrates into few partitions (the merge
    // order a uniform shuffle would never produce).
    val rows = (Seq.fill(2000)("hot") ++
      Seq.tabulate(3000)(i => s"cold${i % 200}")).sorted
    val k = 16
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("tok").repartitionByRange(parts, col("tok"))
      val sk = df.agg(mg(col("tok"), k).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.tok").as("tok"), col("e.est").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.contains("hot"), s"parts=$parts: heavy key evicted")
      assert(sk.size <= k, s"parts=$parts: sketch exceeded k")
      assert(sk("hot") <= 2000L, s"parts=$parts: overestimate")
      assert(2000L - sk("hot") <= 5000L / (k + 1),
        s"parts=$parts: undercount ${2000L - sk("hot")} beyond bound")
    }
  }

  test("spark e2e: grouped sketches stay per-group and bounded") {
    val mg = MisraGriesTopK.mgTopK(spark) _
    val rows = (1 to 3).flatMap { g =>
      Seq.fill(100 * g)(s"g$g" -> s"hh$g") ++
        Seq.tabulate(60)(i => s"g$g" -> s"c$i")
    }
    val out = rows.toDF("grp", "tok")
      .groupBy(col("grp")).agg(mg(col("tok"), 8).as("s"))
      .select(col("grp"), explode(col("s")).as("e"))
      .select(col("grp"), col("e.tok"), col("e.est"))
      .collect()
    for (g <- 1 to 3) {
      val mine = out.filter(_.getString(0) == s"g$g")
      assert(mine.length <= 8)
      // the group's heavy token (100g of 100g+60 -> far over n/9)
      assert(mine.exists(_.getString(1) == s"hh$g"), s"group g$g lost hh$g")
      // no cross-group leakage
      assert(mine.forall(r => r.getString(1).endsWith(g.toString) ||
        r.getString(1).startsWith("c")))
    }
  }

  test("declared contracts hold on the real tables") {
    val hh = graft.operators.ReconOps.heavyHitters(spark, sfDir).collect()
    assert(hh.nonEmpty, "no guaranteed-heavy event type at this sf")
    hh.foreach { r =>
      assert(r.getAs[Boolean]("in_sketch") && r.getAs[Boolean]("under_est")
        && r.getAs[Boolean]("err_ok"), s"contract broken: $r")
    }
    val sb = graft.operators.TextOps.sketchBounds(spark, sfDir).collect()
    assert(sb.nonEmpty)
    sb.foreach { r =>
      assert(r.getAs[Boolean]("all_present") && r.getAs[Boolean]("all_bounded"),
        s"sketch bound broken: $r")
    }
  }
}

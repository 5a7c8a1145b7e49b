package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.CountMinSketch

/** The count-min TypedImperativeAggregate: slice-hash kernel, the
  * determinism that lets its oracle grade raw counters, and the CM
  * invariants (row mass conservation, overestimate-only). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("buckets: four independent slices, stable, in range") {
    val b1 = CountMinSketch.buckets(UTF8String.fromString("alpha"), 4, 256)
    val b2 = CountMinSketch.buckets(UTF8String.fromString("alpha"), 4, 256)
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
    // slices differ for a typical key (independent draws)
    assert(b1.distinct.length > 1)
  }

  test("kernel matches the Spark SQL conv idiom byte-for-byte") {
    val toks = Seq("a", "dup", "qq_never_token", "Ünïcødé", "")
    val fromSql = toks.toDF("tok").select(
      (0 until 4).map(i => expr(
        s"""CAST(conv(substring(md5(cast(tok AS binary)), ${1 + 8 * i}, 8),
           |16, 10) % 256 AS INT)""".stripMargin).as(s"b$i")): _*)
      .collect().map(r => (0 until 4).map(r.getInt))
    toks.zip(fromSql).foreach { case (t, sql) =>
      val jvm = CountMinSketch.buckets(UTF8String.fromString(t), 4, 256).toSeq
      assert(jvm == sql, s"kernel/SQL divergence on '$t': $jvm vs $sql")
    }
  }

  test("sketch table is identical under any partitioning") {
    val cm = CountMinSketch.countMin(spark) _
    val rows = Seq.tabulate(4000)(i => s"t${i % 97}")
    def table(parts: Int): Seq[(Int, Long)] = rows.toDF("tok")
      .repartition(parts)
      .agg(cm(col("tok"), 4, 64).as("sk"))
      .select(posexplode(col("sk")))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sorted
    val ref = table(1)
    assert(table(8) == ref && table(32) == ref,
      "CM must be merge-order independent")
  }

  test("row mass conservation and overestimate-only") {
    val cm = CountMinSketch.countMin(spark) _
    val rows = Seq.fill(300)("hot") ++ Seq.tabulate(700)(i => s"c${i % 131}")
    val sk = rows.toDF("tok").agg(cm(col("tok"), 4, 32).as("sk"))
      .collect().head.getSeq[Long](0)
    // each row's counters absorb every update exactly once
    for (r <- 0 until 4)
      assert(sk.slice(r * 32, (r + 1) * 32).sum == rows.length.toLong,
        s"row $r lost mass")
    // est >= exact for EVERY key
    val truth = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    truth.foreach { case (t, exact) =>
      val bs = CountMinSketch.buckets(UTF8String.fromString(t), 4, 32)
      val est = (0 until 4).map(i => sk(i * 32 + bs(i))).min
      assert(est >= exact, s"$t underestimated: $est < $exact")
    }
  }

  test("join-size estimate: overestimates, exact on the collision-free case") {
    val out = graft.operators.TextOps.countMinJoinSize(spark, sfDir)
      .collect().head
    assert(out.getAs[Boolean]("over_ok"))
    assert(out.getAs[Long]("exact_size") > 0L,
      "train/held token streams must overlap")
    // inner-product bound is exact when no two distinct tokens share a
    // bucket in the min row; at vocab << width the estimate should sit
    // close above the truth (collision cross-terms only)
    assert(out.getAs[Long]("est_size") <
      out.getAs[Long]("exact_size") * 2L,
      s"estimate uselessly loose: $out")
  }

  test("declared estimate query: unseen probe included, contracts hold") {
    val out = graft.operators.TextOps.countMinEst(spark, sfDir).collect()
    assert(out.length == graft.operators.TextOps.Bm25Query.length + 1)
    out.foreach { r =>
      assert(r.getAs[Boolean]("over_ok"), s"CM underestimated: $r")
    }
    val unseen = out
      .find(_.getString(0) == graft.operators.TextOps.CmUnseenToken).get
    assert(unseen.getAs[Long]("exact_cnt") == 0L)
  }
}

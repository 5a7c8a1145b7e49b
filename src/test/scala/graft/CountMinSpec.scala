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

  test("chained digests: depths past 4 extend, never perturb, the first 4") {
    val key = UTF8String.fromString("alpha")
    val d4 = CountMinSketch.buckets(key, 4, 256).toSeq
    val d6 = CountMinSketch.buckets(key, 6, 256).toSeq
    val d12 = CountMinSketch.buckets(key, 12, 256).toSeq
    // prefix-stability: a deeper sketch's first rows are the shallow form
    assert(d6.take(4) == d4)
    assert(d12.take(6) == d6)
    assert(d12.forall(b => b >= 0 && b < 256))
    // rows 4-7 come from md5("1|" + x): independent of rows 0-3 (for a
    // typical key the two digests disagree somewhere)
    assert(d12.drop(4).toSet != d4.toSet || d12.distinct.length > 4)
  }

  test("chained rows match the bucketSql rendering byte-for-byte") {
    // the DuckDB-twin SQL (bucketSql) re-rendered through Spark's own
    // conv/md5 — rows >= 4 exercise the '1|' / '2|' prefixed digests
    val toks = Seq("a", "dup", "Ünïcødé", "")
    for (row <- Seq(0, 3, 4, 5, 8, 11)) {
      val j = row / 4; val slice = row % 4
      val dig = if (j == 0) "md5(cast(tok AS binary))"
        else s"md5(cast(concat('$j|', tok) AS binary))"
      val fromSql = toks.toDF("tok").select(expr(
        s"CAST(conv(substring($dig, ${1 + 8 * slice}, 8), 16, 10) " +
          "% 256 AS INT)").as("b")).collect().map(_.getInt(0))
      toks.zip(fromSql).foreach { case (t, sql) =>
        val jvm = CountMinSketch.buckets(UTF8String.fromString(t), 12, 256)(row)
        assert(jvm == sql, s"row $row divergence on '$t': $jvm vs $sql")
      }
    }
  }

  test("deep sketch keeps mass conservation and overestimate-only") {
    val cm = CountMinSketch.countMin(spark) _
    val rows = Seq.fill(200)("hot") ++ Seq.tabulate(500)(i => s"c${i % 89}")
    val sk = rows.toDF("tok").agg(cm(col("tok"), 6, 32).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(sk.length == 6 * 32)
    for (r <- 0 until 6)
      assert(sk.slice(r * 32, (r + 1) * 32).sum == rows.length.toLong,
        s"row $r lost mass")
    val truth = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    truth.foreach { case (t, exact) =>
      val bs = CountMinSketch.buckets(UTF8String.fromString(t), 6, 32)
      val est = (0 until 6).map(i => sk(i * 32 + bs(i))).min
      assert(est >= exact, s"$t underestimated: $est < $exact")
    }
  }

  test("depth outside [1, MaxDepth] is rejected at analysis") {
    val cm = CountMinSketch.countMin(spark) _
    val df = Seq("x").toDF("tok")
    intercept[Exception] {
      df.agg(cm(col("tok"), CountMinSketch.MaxDepth + 1, 16)).collect()
    }
    intercept[Exception] { df.agg(cm(col("tok"), 0, 16)).collect() }
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

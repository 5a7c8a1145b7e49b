package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup: the result must be EXACT (the
  * bloom can only ever over-admit candidates, never drop a real dup) and
  * the prefilter must actually prune (the whole point of the gate). */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("order-insensitive bag fingerprint: permuted/repeated tokens are dups") {
    val corpus = docs(Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon"))
    val batch = docs(Seq(
      10L -> "gamma alpha beta alpha", // same bag, permuted + repeated
      11L -> "delta epsilon",          // literal copy
      12L -> "zeta eta theta"))        // novel
    val got = DedupOps.bloomDedupCore(corpus, batch, expectedItems = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_dup")).toMap
    assert(got == Map(10L -> true, 11L -> true, 12L -> false))
  }

  test("no false negatives: every planted duplicate is flagged") {
    val corpus = docs((0L until 500L).map(i => i -> s"tok$i filler common"))
    // all 300 batch docs are copies of corpus docs
    val batch = docs((0L until 300L).map(i => (1000L + i) -> s"tok$i filler common"))
    val out = DedupOps.bloomDedupCore(corpus, batch, expectedItems = 500)
    assert(out.where(!col("is_dup")).count() == 0)
    assert(out.count() == 300)
  }

  test("bloom-pruned result is byte-identical to the plain semi-join") {
    // mixed batch: half dups, half novel — the exact reference is the
    // unbloomed membership join computed here from first principles
    val corpus = docs((0L until 400L).map(i => i -> s"w$i x y z"))
    val batch = docs((0L until 200L).map { i =>
      val txt = if (i % 3 == 0) s"w${i * 2} x y z" else s"novel$i a b c"
      (2000L + i) -> txt
    })
    val got = DedupOps.bloomDedupCore(corpus, batch, expectedItems = 400)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("is_dup")).toMap
    val corpusTexts = (0L until 400L).map(i => s"w$i x y z").toSet
    val want = (0L until 200L).map { i =>
      val txt = if (i % 3 == 0) s"w${i * 2} x y z" else s"novel$i a b c"
      (2000L + i) -> corpusTexts.contains(txt)
    }.toMap
    assert(got == want)
    assert(got.values.count(identity) > 0 && got.values.exists(v => !v))
  }

  test("the prefilter prunes: a disjoint batch mostly never reaches the join") {
    val corpus = docs((0L until 1000L).map(i => i -> s"corp$i a b"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val batch = docs((0L until 500L).map(i => (5000L + i) -> s"new$i c d"))
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val survivors = DedupOps.bloomCandidates(
      corpus.select(col("fp")), batch, expectedItems = 1000).count()
    // fpp = 1% → E[survivors] = 5 of 500; even 10σ of margin stays far
    // under 100 — if this fails, the bloom is not filtering at all
    assert(survivors < 100, s"bloom admitted $survivors of 500 novel rows")
  }

  test("native bloom sketch: bit array is partitioning-invariant, " +
      "positions match the chained-md5 idiom, membership is exact") {
    import graft.plans.{BloomFilter, CountMinSketch}
    val keys = (0 until 300).map(i => s"key$i").toDF("fp")
    def words(df: DataFrame): Seq[Long] = df
      .agg(BloomFilter.bloomAgg(spark)(col("fp"), 4096, 3))
      .head().getSeq[Long](0)
    // merge is bitwise OR — any partial-aggregation tree gives the
    // same array (the countmin determinism argument)
    val w1 = words(keys.repartition(1))
    val w7 = words(keys.repartition(7))
    assert(w1 == w7, "bit array must not depend on merge order")
    val w = w1.toArray
    // every key's positions (the shared countmin bucket derivation)
    // are set — checked against the kernel directly
    val pos = CountMinSketch.buckets(
      org.apache.spark.unsafe.types.UTF8String.fromString("key0"), 3, 4096)
    pos.foreach(p =>
      assert(((w(p >> 6) >> (p & 63)) & 1L) == 1L, s"bit $p unset"))
    // probe expression: present keys all true, absent keys mostly not
    val present = keys.withColumn("m",
      BloomFilter.bloomContains(spark)(typedLit(w), col("fp"), 3))
    assert(present.where(!col("m")).isEmpty, "no false negatives")
    val absent = (0 until 300).map(i => s"zz$i").toDF("fp")
      .withColumn("m",
        BloomFilter.bloomContains(spark)(typedLit(w), col("fp"), 3))
    val fps = absent.where(col("m")).count()
    assert(fps < 30, s"absent keys must rarely collide, got $fps of 300")
  }

  test("declared query: batch split covers exactly the mod class, exact flags") {
    val out = DedupOps.bloomDedup(spark, sfDir)
    val batchIds = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pmod(col("doc_id"), lit(DedupOps.BloomBatchMod))
        === DedupOps.BloomBatchMod - 1)
      .select(col("doc_id"))
    assert(out.count() == batchIds.count())
    assert(out.join(batchIds, Seq("doc_id"), "left_anti").count() == 0)
  }
}

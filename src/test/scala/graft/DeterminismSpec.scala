package graft

/** Shuffle-perturbation determinism (VERDICT r15 item 6): the
  * integer-exact families claim their results are insensitive to
  * partitioning — partial-agg tree shape, join order inside a stage,
  * AQE coalescing. Pin it: run each query at three different
  * `spark.sql.shuffle.partitions` settings and require the full
  * sorted result set to be IDENTICAL (not just equal-ish) — exactly
  * what the DuckDB hash compare assumes when the driver runs one
  * configuration and the production cluster another. */
class DeterminismSpec extends SparkSpec {

  /** Canonical fingerprint: every row rendered, sorted, joined. */
  private def fingerprint(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect().map(_.toString).sorted.mkString("\n")
  }

  private def pinned(name: String): Unit = {
    val parts = Seq("3", "7", "13")
    val base = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val fps = parts.map { p =>
        spark.conf.set("spark.sql.shuffle.partitions", p)
        fingerprint(name)
      }
      assert(fps.distinct.size == 1,
        s"$name diverged across shuffle.partitions=$parts")
      assert(fps.head.nonEmpty, s"$name returned no rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", base)
  }

  test("q_pagerank is partitioning-invariant") { pinned("q_pagerank") }

  test("q_release_risk is partitioning-invariant") {
    pinned("q_release_risk")
  }

  test("q_countmin_deep is partitioning-invariant") {
    pinned("q_countmin_deep")
  }

  test("q_merge_groups is partitioning-invariant") {
    pinned("q_merge_groups")
  }

  test("q_unigram_vocab is partitioning-invariant") {
    pinned("q_unigram_vocab")
  }

  test("q_authority_sample is partitioning-invariant") {
    pinned("q_authority_sample")
  }

  // --- dedup spine (VERDICT r16 item 6): min-label CC and the
  // ordered-edge triangle joins claim order-insensitivity — pin it
  // like the r16 five

  test("q_text_dedup_groups is partitioning-invariant") {
    pinned("q_text_dedup_groups")
  }

  test("q_dup_triangles is partitioning-invariant") {
    pinned("q_dup_triangles")
  }

  // --- skew auto cutover (r17): the salted scan decompositions claim
  // result-identity with the plain single-window forms at ANY
  // partitioning; the census dispatch must also be stable

  test("q_sessionize_auto_hot is partitioning-invariant") {
    pinned("q_sessionize_auto_hot")
  }

  test("q_asof_auto_hot is partitioning-invariant") {
    pinned("q_asof_auto_hot")
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextOps
import graft.sources.Tables

/** Production-size BPE training probe (VERDICT r11 item 6) — trains a
  * 16k+ merge vocabulary with the BATCHED trainer
  * ([[TextOps.bpeMergesBatched]]'s loop, `strict = false`: the
  * top-m-non-conflicting production mode) over a real corpus, and
  * reports wall-time, round (= Spark job) count, achieved batch sizes,
  * and the FERTILITY CARD computed off the trained table — the numbers
  * the README scale notes cite.
  *
  *   sbt "runMain graft.tools.BpeTrainProbe /root/testdata/sf0.1 16384 512"
  */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(16384)
    val batchCap = args.lift(2).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // --shingle: the synthetic corpus's WHITESPACE vocabulary is tiny
    // (the plain run exhausts all pairs after ~90 merges — every word
    // fully merged, fertility 100); to exercise a production-size
    // merge budget the trainer needs production-size distinct
    // structure, so this mode trains on underscore-joined 3-gram
    // "words" (27k distinct at sf0.1, ~394k merge headroom) — the
    // trainer is unit-agnostic, only the tokenization changes
    val shingleMode = args.contains("--shingle")
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, dir)
    val docs =
      if (!shingleMode) base
      else base.select(col("lang"), array_join(
        transform(TextOps.shingles3(col("text")),
          s => regexp_replace(s, " ", "_")), " ").as("text"))
    var rounds = 0
    var minBatch = Int.MaxValue
    var maxBatch = 0
    val t0 = System.nanoTime()
    val (merges, words) = TextOps.bpeLoopBatchedState(docs, nMerges,
      batchCap, strict = false, onRound = { n =>
        rounds += 1
        minBatch = math.min(minBatch, n); maxBatch = math.max(maxBatch, n)
        if (rounds % 8 == 0)
          println(f"[bpe] round $rounds%d: +$n%d merges (total so far grows)")
      })
    val trainS = (System.nanoTime() - t0) / 1e9
    println(f"[bpe] trained ${merges.size}%d merges in $trainS%.1f s over " +
      f"$rounds%d rounds (batch min $minBatch%d / max $maxBatch%d, " +
      f"cap $batchCap%d) — ~${merges.size / math.max(1, rounds)}%d " +
      "merges/round")
    // the efficiency card OFF THE TRAINED TABLE — same projection the
    // declared q_bpe_fertility runs on the 8-merge demo vocabulary
    val t1 = System.nanoTime()
    val card = TextOps.bpeFertilityOf(docs, words)
      .orderBy(org.apache.spark.sql.functions.col("lang")).collect()
    val cardS = (System.nanoTime() - t1) / 1e9
    card.foreach { r =>
      println(s"[bpe] fertility ${r.getAs[String]("lang")}: " +
        s"n_words=${r.getAs[Long]("n_words")} " +
        s"n_bpe_tokens=${r.getAs[Long]("n_bpe_tokens")} " +
        s"fertility_100=${r.getAs[Long]("fertility_100")} " +
        s"chars_per_token_100=${r.getAs[Long]("chars_per_token_100")}")
    }
    println(f"[bpe] fertility card off the trained table in $cardS%.1f s")
    spark.stop()
  }
}

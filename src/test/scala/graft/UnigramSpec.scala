package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** [[graft.operators.TextOps]] unigram-LM trainer — the oracled rows
  * are q_unigram_vocab / q_unigram_encode / q_tokenizer_compare (the
  * EM rounds unrolled in DuckDB, bit-exact); this pins the kernel
  * invariants the hash match rests on. */
class UnigramSpec extends SparkSpec {

  test("uniTrain: driver cutover equals the distributed EM rounds") {
    // the r19 small-vocabulary cutover must reproduce the distributed
    // trainer bit-for-bit: same vocab rows, same cost table — on the
    // real corpus fixture (whose words exercise the substring census,
    // both EM rounds and the char fallback)
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val (vd, cd, _) = TextOps.uniTrain(spark, docs) // driver path (small)
    val (vx, cx, _) = TextOps.uniTrainDistributed(spark,
      TextOps.uniWords(docs).localCheckpoint(true))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("piece"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(rows(vd) == rows(vx), "vocab rows must match")
    assert(cd == cx, "cost tables must match")
  }

  test("viterbi kernel: tie resolves to the longest piece, greedily") {
    val cost = Map("a" -> 10L, "b" -> 10L, "ab" -> 20L, "abab" -> 40L)
    // "abab": single-char path, 2-piece path and 1-piece path all cost
    // 40 — the encoded key must pick the 4-char piece
    assert(TextOps.uniViterbi("abab", cost) == List("abab"))
    // unknown substrings force the char fallback
    assert(TextOps.uniViterbi("ba", cost) == List("b", "a"))
    // equal-cost split: the tiebreak favors the longer piece at each
    // DP position, and the path walks backward — so the long piece
    // lands at the END of the word
    val c2 = Map("x" -> 5L, "xx" -> 8L)
    assert(TextOps.uniViterbi("xxx", c2) == List("x", "xx"))
  }

  test("encode: pieces concatenate to the word, all pieces in vocab") {
    val enc = TextOps.unigramEncode(spark, sfDir).collect()
    assert(enc.nonEmpty)
    val vocab = TextOps.unigramVocab(spark, sfDir)
      .select("piece").collect().map(_.getString(0)).toSet
    for (r <- enc) {
      val tok = r.getString(0)
      val pieces = r.getString(2).split(" ").toSeq
      assert(pieces.mkString("") == tok,
        s"segmentation of <$tok> does not recompose: $pieces")
      assert(r.getInt(3) == pieces.size)
      assert(pieces.forall(vocab), s"<$tok> used out-of-vocab pieces")
    }
  }

  test("vocab: full alphabet kept, real multi-char pieces learned") {
    val v = TextOps.unigramVocab(spark, sfDir).collect()
    val pieces = v.map(_.getString(0)).toSet
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= " ").distinct()
      .collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces), "single chars must never be pruned")
    assert(pieces.exists(_.length > 1), "EM must learn multi-char pieces")
    // costs are monotone: a more-used piece never costs more
    val byUse = v.map(r => (r.getLong(1), r.getLong(2))).toSeq
    for (Seq((u1, c1), (u2, c2)) <- byUse.sortBy(_._1).sliding(2).toSeq)
      if (u1 < u2) assert(c1 >= c2, s"cost not monotone: $byUse")
  }

  test("comparison card: both fertilities at least 1 word per token") {
    val c = TextOps.tokenizerCompare(spark, sfDir).collect()
    assert(c.length > 1)
    for (r <- c) {
      assert(r.getLong(4) >= 100, "bpe fertility >= 1 token/word")
      assert(r.getLong(5) >= 100, "unigram fertility >= 1 token/word")
    }
  }
}

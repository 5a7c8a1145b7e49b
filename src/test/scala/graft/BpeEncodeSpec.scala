package graft

import graft.operators.TextOps
import graft.sources.Tables

/** Tokenizer-APPLY path (VERDICT r9 #5): encoding a corpus with a STORED
  * merge table must agree with the trainer's own segmentation when the
  * corpus IS the training corpus, and must fall through to character
  * segmentation for tokens the merge table never saw. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("encoding the training corpus reproduces bpeSegmented exactly") {
    val docs = Tables.documents(spark, sfDir)
    val enc = TextOps.bpeEncodeWith(spark, docs, docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val seg = TextOps.bpeSegmented(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(enc.keySet == seg.keySet)
    for ((tok, e) <- enc) {
      val s = seg(tok)
      assert(e.getAs[String]("symbols") == s.getAs[String]("symbols"),
        s"segmentation drift on '$tok'")
      assert(e.getAs[Long]("cnt") == s.getAs[Long]("cnt"))
      assert(e.getAs[Int]("n_symbols") == s.getAs[Int]("n_symbols"))
    }
  }

  test("unseen tokens segment to characters; seen tokens use the merges") {
    val train = Seq((0L, "en", "abab abab abab cd")).toDF("doc_id", "lang", "text")
    val apply = Seq((1L, "en", "abab zz abab")).toDF("doc_id", "lang", "text")
    val got = TextOps.bpeEncodeWith(spark, train, apply)
      .collect().map(r => (r.getString(0),
        (r.getAs[Long]("cnt"), r.getAs[String]("symbols")))).toMap
    // 'ab' (freq 6 in training) merges first, then 'abab'
    assert(got("abab") == ((2L, "abab")),
      s"trained merges must apply to the new corpus: $got")
    // 'zz' never seen: stays at its character segmentation
    assert(got("zz") == ((1L, "z z")), s"unseen token must fall through: $got")
  }
}

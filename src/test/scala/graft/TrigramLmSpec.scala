package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TrigramLm

/** Character-trigram LM scoring: hand-computed smoothing arithmetic,
  * the fluent-vs-gibberish ordering the filter exists for, and the
  * short-document edge.
  */
class TrigramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("hand-computed add-one smoothing on a two-doc corpus") {
    // both docs = "abab": trigrams aba, bab each twice over the corpus;
    // N = 4 instances, V = 2 distinct -> every logp = ln((2+1)/(4+2))
    // = ln(1/2); each doc's mean is ln(1/2) = -0.693147 at 6 dp
    val docs = Seq((1L, "abab"), (2L, "abab")).toDF("doc_id", "text")
    val got = TrigramLm.score(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    for (r <- got) {
      assert(r.getLong(1) == 2L, "abab has 2 trigram instances")
      assert(r.getDouble(2) == -0.693147)
    }
  }

  test("gibberish scores strictly below every fluent document") {
    val fluent = (1L to 20L).map(i =>
      (i, "the cat sat on the mat and the dog sat on the log"))
    val docs = (fluent :+ (99L, "zqxjwv kpqzx jvwqk xzjqp wkvzq"))
      .toDF("doc_id", "text")
    val scores = TrigramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worstFluent = (1L to 20L).map(scores).min
    assert(scores(99L) < worstFluent,
      "rare-trigram text must score below common-trigram text")
  }

  test("documents shorter than one trigram get n_tri 0 and null score") {
    val docs = Seq((1L, "ab"), (2L, "abcd")).toDF("doc_id", "text")
    val got = TrigramLm.score(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 0L && got(0).isNullAt(2))
    // "abcd" -> abc, bcd
    assert(got(1).getLong(1) == 2L && !got(1).isNullAt(2))
  }

  test("incremental count merge equals a full rebuild") {
    val day1 = Seq((1L, "the cat sat"), (2L, "on the mat")).toDF("doc_id", "text")
    val day2 = Seq((3L, "the dog sat"), (4L, "zq xj")).toDF("doc_id", "text")
    val merged = TrigramLm.mergeCounts(
      TrigramLm.counts(day1, "doc_id", "text"), day2, "doc_id", "text")
    val rebuilt = TrigramLm.counts(day1.unionByName(day2), "doc_id", "text")
    assert(merged.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(merged).count() == 0)
  }

  test("model frame scores unseen trigrams at the smoothed default") {
    import graft.streaming.EventStreams
    val corpus = Seq((1L, "abab")).toDF("doc_id", "text")
    // model: aba, bab once each -> N=2, V=2; default = ln(1/4)
    val model = TrigramLm.modelFrame(
      TrigramLm.counts(corpus, "doc_id", "text"))
    // "xyzw" -> xyz, yzw: both unseen -> mean = ln(1/4) = -1.386294
    val got = EventStreams.lmScoreStream(
      Seq((9L, "xyzw")).toDF("doc_id", "text"), model).collect()
    assert(got.head.getLong(1) == 2L)
    assert(got.head.getDouble(2) == -1.386294)
  }

  test("a hash-sampled model reproduces full-model scores closely") {
    // the 100 TB shape: estimate the model from a deterministic 50%
    // md5 sample (ops.Sample.keep), score everyone. Trigram frequencies
    // are stable under halving, so per-doc scores track the full model
    // tightly — the divergence bound here is what licenses the
    // sampled-model deployment note in the scaladoc
    import graft.ops.Sample
    import graft.streaming.EventStreams
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val full = graft.text.TrigramLm.modelFrame(
      graft.text.TrigramLm.counts(docs, "doc_id", "text"))
    val half = graft.text.TrigramLm.modelFrame(
      graft.text.TrigramLm.counts(
        docs.filter(Sample.keep(col("doc_id"), 0.5)), "doc_id", "text"))
    val a = EventStreams.lmScoreStream(docs, full)
      .select(col("doc_id"), col("lm_score").as("s_full"))
    val b = EventStreams.lmScoreStream(docs, half)
      .select(col("doc_id"), col("lm_score").as("s_half"))
    val diffs = a.join(b, Seq("doc_id"))
      .select(abs(col("s_full") - col("s_half")).as("d"))
      .agg(max(col("d")).as("mx"), avg(col("d")).as("mean")).head()
    assert(diffs.getDouble(1) < 0.05,
      s"mean |Δscore| ${diffs.getDouble(1)} too large for a half-corpus model")
    assert(diffs.getDouble(0) < 0.30,
      s"max |Δscore| ${diffs.getDouble(0)} too large for a half-corpus model")
  }

  test("normalization feeds the model: case and whitespace collapse") {
    // "AB  AB" normalizes to "ab ab" == "ab ab" verbatim -> same score
    val docs = Seq((1L, "AB  AB"), (2L, "ab ab")).toDF("doc_id", "text")
    val got = TrigramLm.score(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == got(2L))
  }
}

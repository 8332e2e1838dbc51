package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token stats: counts, mean length, TTR") {
    val df = Seq((1L, "aa bb aa cc")).toDF("id", "text")
    val r = df.select(
      tokenCount($"text"), uniqueTokenCount($"text"),
      meanTokenLength($"text"), typeTokenRatio($"text"),
      subwordTokenEstimate($"text")).head()
    assert(r.getInt(0) === 4)
    assert(r.getInt(1) === 3)
    assert(r.getDouble(2) === 2.0) // (11 - 3) / 4
    assert(r.getDouble(3) === 0.75)
    assert(r.getLong(4) === 4L) // ceil(11/4)=3 < word count 4
  }

  test("quality: clean long text beats short/noisy text") {
    val clean = ("word" + (1 to 120).map(i => s" tok$i").mkString)
    val noisy = "a!!! b??? ### $$$ %%%"
    val df = Seq((1L, clean), (2L, noisy), (3L, "x")).toDF("id", "text")
    val scores = df.select($"id", qualityScore($"text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(scores(1L) > scores(3L))
  }

  test("langId: marker-based identification on real multilingual text") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is happy with the sun", "en"),
      (2L, "el perro corre por la calle y se esconde en los arboles", "es"),
      (3L, "der hund läuft und das ist nicht ein problem mit zu viel", "de"),
      (4L, "le chat est dans les jardins et la maison des voisins", "fr"),
      (5L, "这是一个中文句子 用于测试语言识别", "zh"),
      (6L, "zxqwv kjhgf plmnb", "und")
    ).toDF("id", "text", "expected")
    val got = df.select($"id", langId($"text").as("p"), $"expected").collect()
    got.foreach(r => assert(r.getString(1) === r.getString(2),
      s"doc ${r.getLong(0)}: predicted ${r.getString(1)}, expected ${r.getString(2)}"))
  }

  test("fingerprints: stable, normalized, shingle-min robust to case only for doc hash") {
    val df = Seq(
      (1L, "The Quick Brown Fox"),
      (2L, "the quick brown fox"), // same doc fingerprint (normalized)
      (3L, "one two") // < 3 tokens → whole-text shingle fallback
    ).toDF("id", "text")
    val r = df.select($"id", $"text", tokens($"text").as("tk"))
      .select($"id", docFingerprint($"text").as("d"),
        shinglesFromTokens($"text", $"tk").as("sh"))
      .select($"id", $"d", shingleFingerprintFromShingles($"sh").as("s"))
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getString(2))).toMap
    assert(r(1L)._1 === r(2L)._1, "doc fingerprint is case-normalized")
    assert(r(1L)._2 !== r(2L)._2, "shingle fingerprint is case-sensitive")
    assert(r(3L)._2.length === 32)
  }

  test("vocabRatio + punctRatio") {
    val df = Seq((1L, "the cat and the dog!")).toDF("id", "text")
    val r = df.select(
      vocabRatio($"text", Seq("the", "and")),
      punctRatio($"text")).head()
    // distinct hits {the, and} = 2, tokens = 5
    assert(r.getDouble(0) === 0.4)
    // non [a-z0-9 space] chars: '!' of 20 chars
    assert(math.abs(r.getDouble(1) - 1.0 / 20) < 1e-12)
  }

  test("normalizeText: case, punctuation, whitespace, degenerate inputs") {
    val df = Seq(
      (1L, "  Hello,   WORLD!! 42\tok "),
      (2L, "already clean text"),
      (3L, "§±«»"),      // nothing survives
      (4L, "")
    ).toDF("id", "text")
    val r = df.select($"id", normalizeText($"text").as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "hello world 42 ok")
    assert(r(2L) === "already clean text")
    assert(r(3L) === "")
    assert(r(4L) === "")
  }
}

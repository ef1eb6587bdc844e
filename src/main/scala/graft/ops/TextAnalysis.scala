package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language-ID, quality scoring,
  * token counting, document fingerprinting. Everything runs as codegen'd
  * builtin expressions or narrow Scala maps — no shuffle, no driver loop.
  */
object TextAnalysis {

  /** Token + character statistics (oracle-checkable arithmetic only). */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).as("n_chars"),
      (length(t) - length(regexp_replace(t, " ", "")) + 1).as("n_tokens"),
      size(split(t, " ")).as("n_tokens_split"))
  }

  /** BPE-ish subword counting: letter runs, digit runs, and single
    * non-alphanumeric marks — the standard pre-tokenizer shape.
    */
  def subwordCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(expr(s"regexp_extract_all($textCol, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
        .as("n_subwords"))

  private val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Quality metrics: length, mean word length, stopword ratio, digit and
    * punctuation ratios, and a composite score in [0,1]. Deterministic,
    * expressible in portable SQL for the oracle.
    */
  def qualityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nTokens = size(split(t, " "))
    val swList = stopwords.map(s => s"'$s'").mkString(", ")
    val nStop = expr(s"size(filter(split($textCol, ' '), w -> w IN ($swList)))")
    val nDigit = length(t) - length(regexp_replace(t, "[0-9]", ""))
    val nPunct = length(t) - length(regexp_replace(t, "[^a-zA-Z0-9 ]", ""))
    val meanWordLen = (length(t) - (nTokens - 1)).cast("double") / nTokens.cast("double")
    df.select(
        col(idCol),
        length(t).as("n_chars"),
        nTokens.as("n_tokens"),
        round(meanWordLen, 4).as("mean_word_len"),
        round(nStop.cast("double") / nTokens.cast("double"), 4).as("stopword_ratio"),
        round(nDigit.cast("double") / greatest(length(t), lit(1)).cast("double"), 4)
          .as("digit_ratio"),
        round(nPunct.cast("double") / greatest(length(t), lit(1)).cast("double"), 4)
          .as("punct_ratio"))
      // No final round: both Spark and the DuckDB oracle compute this from
      // the already-rounded inputs with identical IEEE ops, so the doubles
      // are bit-identical; a round() here would hit half-way ties that the
      // two engines break differently.
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens").cast("double") / 64.0) * 0.5
          + least(lit(1.0), col("stopword_ratio") * 5.0) * 0.3
          + (lit(1.0) - least(lit(1.0), col("digit_ratio") * 10.0)) * 0.2)
  }

  /** Language-ID profiles: characteristic high-frequency function words per
    * language (public stopword lists). Deterministic scoring: fraction of
    * tokens hitting each profile; argmax with lexicographic tie-break to
    * the profile name; fallback "und" when nothing matches.
    */
  private val langProfiles: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "en" -> Set("the", "and", "of", "is", "not", "a", "with", "to", "in"),
    "es" -> Set("el", "la", "los", "y", "es", "no", "un", "con", "que"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "un", "avec", "que"),
    "it" -> Set("il", "la", "e", "non", "un", "con", "che", "per", "sono")
  )

  /** Pure scoring function (unit-testable). Returns (lang, score).
    * The score is the RAW hit ratio (no rounding): both this and the DuckDB
    * oracle compute hits/tokens as one IEEE division, so the doubles are
    * bit-identical — a final round() would split half-way ties across
    * engines (rint is half-even, DuckDB rounds half away from zero).
    */
  def detectLanguage(text: String): (String, Double) = {
    val tokens = text.split(' ').filter(_.nonEmpty)
    if (tokens.isEmpty) return ("und", 0.0)
    var bestLang = "und"
    var bestScore = 0.0
    langProfiles.foreach { case (lang, profile) =>
      var hits = 0
      var i = 0
      while (i < tokens.length) { if (profile.contains(tokens(i))) hits += 1; i += 1 }
      val score = hits.toDouble / tokens.length
      if (score > bestScore) { bestScore = score; bestLang = lang }
    }
    (bestLang, bestScore)
  }

  /** Distributed language-ID: narrow map over the text column. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val (lang, score) = detectLanguage(text)
        (id, lang, score)
      }
      .toDF("id", "lang_pred", "lang_score")
  }

  /** Content-hash fingerprint (md5 — portable to the oracle). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("fingerprint"))

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003): rolling
    * polynomial hash over character k-grams, minimum per window, distinct —
    * a compact sketch robust to local edits. Narrow map.
    */
  def winnow(text: String, k: Int = 8, window: Int = 16): Array[Long] = {
    val n = text.length
    if (n < k) return if (n == 0) Array.empty else Array(Signatures.simhash(text))
    val hashes = kgramHashes(text, k)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    val last = hashes.length - window
    if (last < 0) return Array(hashes.min)
    // Sliding-window minimum via monotonic index deque: O(n) total instead
    // of O(n·window) — each index is pushed and popped at most once. The
    // minimum VALUE per window is unchanged, so the emitted sequence (and
    // the LinkedHashSet dedup order) is identical to the direct scan.
    val deque = new Array[Int](hashes.length)
    var head = 0
    var tail = 0 // [head, tail) holds indices with increasing hash values
    var j = 0
    while (j < hashes.length) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
      deque(tail) = j; tail += 1
      val w = j - window + 1 // window [w, j] complete once w >= 0
      if (w >= 0) {
        while (deque(head) < w) head += 1
        out += hashes(deque(head))
      }
      j += 1
    }
    out.toArray
  }

  /** Rolling polynomial k-gram hashes (base 257 mod 2^64, splitmix
    * finalize) — the winnow hash sequence, factored out so the spec can
    * run a naive window-minimum reference over the exact same hashes.
    * Requires text.length >= k.
    */
  private[graft] def kgramHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    val hashes = new Array[Long](n - k + 1)
    val base = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * base + text.charAt(i); i += 1 }
    hashes(0) = graft.synth.Rng.mix64(h)
    i = 1
    while (i + k <= n) {
      h = (h - text.charAt(i - 1) * pow) * base + text.charAt(i + k - 1)
      hashes(i) = graft.synth.Rng.mix64(h)
      i += 1
    }
    hashes
  }

  /** Distributed winnowing fingerprints: (id, array of sketch hashes). */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, window: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, winnow(text, k, window)) }
      .toDF("id", "sketch")
      .withColumn("sketch_size", size(col("sketch")))
  }
}

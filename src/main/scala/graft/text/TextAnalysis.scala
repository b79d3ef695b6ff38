package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Caching.RegisterSyntax
import graft.core.Tables

/** Text-analysis operators over `documents` — the per-document scoring
  * stages of a training-data pipeline. All pure per-row map stages
  * (no shuffle), codegen'd, with integer or single-division outputs so
  * the DuckDB oracle matches bit-exactly.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  /** Stopword profiles for the corpus languages. The heuristic is the
    * classic profile-hit count (an n-gram/profile language identifier à
    * la Cavnar-Trenkle, reduced to unigram stopwords); prediction is
    * argmax with a fixed priority order for ties.
    */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai"),
  )

  private def tokensExpr =
    "split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"
  private def oracleTokens =
    "str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')"

  // =========================================================================
  // t1 — language identification (stopword-profile heuristic)
  // =========================================================================

  val t1LangId: Q = (s, dir) => {
    val hitCols = profiles.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(tokens, t -> t in ($inList)))").as(s"${lang}_hits")
    }
    // argmax with ties resolved by profile order (alphabetical)
    val pred = profiles.map(_._1).foldRight(lit("und"): org.apache.spark.sql.Column) {
      case (lang, acc) =>
        val others = profiles.map(_._1).filter(_ != lang)
          .map(o => col(s"${lang}_hits") >= col(s"${o}_hits")).reduce(_ && _)
        when(others && col(s"${lang}_hits") > 0, lang).otherwise(acc)
    }
    Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .select(col("doc_id") +: col("lang").as("labeled_lang") +: hitCols: _*)
      .withColumn("predicted_lang", pred)
  }

  val t1LangIdSql: String = {
    val hits = profiles.map { case (lang, words) =>
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(tokens, t -> t in ($inList))) AS ${lang}_hits"
    }.mkString(",\n           ")
    // identical foldRight: first profile in order that is >= all others and > 0
    val pred = profiles.map(_._1).foldRight("'und'") { case (lang, acc) =>
      val others = profiles.map(_._1).filter(_ != lang)
        .map(o => s"${lang}_hits >= ${o}_hits").mkString(" AND ")
      s"CASE WHEN $others AND ${lang}_hits > 0 THEN '$lang' ELSE $acc END"
    }
    s"""WITH t AS (SELECT doc_id, lang AS labeled_lang, $oracleTokens AS tokens
                   FROM documents),
    h AS (SELECT doc_id, labeled_lang,
           ${hits}
          FROM t)
    SELECT *, $pred AS predicted_lang FROM h"""
  }

  // =========================================================================
  // t2 — quality scoring (length / punctuation / stopword ratios)
  // =========================================================================

  val t2QualityScore: Q = (s, dir) => {
    val en = profiles.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_measured"),
        size(col("tokens")).as("n_tokens"),
        expr("size(regexp_extract_all(text, '[!?,.]', 0))").as("n_punct"),
        expr(s"size(filter(tokens, t -> t in ($en)))").as("n_stopwords"))
      .withColumn("avg_token_len",
        (col("n_chars_measured") - (col("n_tokens") - 1)) / col("n_tokens"))
      .withColumn("quality_bucket",
        when(col("n_tokens") < 10, "too_short")
          .when(col("n_punct") * 5 > col("n_tokens"), "punct_heavy")
          .when(col("n_stopwords") * 20 < col("n_tokens"), "low_stopword")
          .otherwise("ok"))
  }

  val t2QualityScoreSql: String = {
    val en = profiles.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, $oracleTokens AS tokens FROM documents),
    m AS (SELECT doc_id,
            length(text) AS n_chars_measured,
            len(tokens) AS n_tokens,
            len(regexp_extract_all(text, '[!?,.]')) AS n_punct,
            len(list_filter(tokens, t -> t in ($en))) AS n_stopwords
          FROM t)
    SELECT *,
           (n_chars_measured - (n_tokens - 1)) / n_tokens AS avg_token_len,
           CASE WHEN n_tokens < 10 THEN 'too_short'
                WHEN n_punct * 5 > n_tokens THEN 'punct_heavy'
                WHEN n_stopwords * 20 < n_tokens THEN 'low_stopword'
                ELSE 'ok' END AS quality_bucket
    FROM m"""
  }

  // =========================================================================
  // t3 — token counting (whitespace + BPE-ish regex segmentation)
  // =========================================================================

  private val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  val t3TokenCount: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .select(
        col("doc_id"),
        size(expr(tokensExpr)).as("ws_tokens"),
        expr(s"size(regexp_extract_all(lower(text), '$bpeishPattern', 0))")
          .as("bpeish_tokens"),
        length(col("text")).as("n_chars_measured"))

  val t3TokenCountSql: String = s"""
    SELECT doc_id,
           len($oracleTokens) AS ws_tokens,
           len(regexp_extract_all(lower(text), '$bpeishPattern')) AS bpeish_tokens,
           length(text) AS n_chars_measured
    FROM documents"""

  // =========================================================================
  // t4 — document fingerprinting
  // =========================================================================

  /** Two content fingerprints: the sorted-distinct-token set hash
    * (order-insensitive, catches shuffled near-dups) and a prefix hash
    * (cheap first-pass blocker). Both md5 so the oracle agrees.
    */
  val t4Fingerprint: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .select(
        col("doc_id"),
        md5(expr("concat_ws(' ', sort_array(array_distinct(tokens)))"))
          .as("tokenset_fp"),
        md5(expr("substr(regexp_replace(lower(trim(text)), ' +', ' '), 1, 64)"))
          .as("prefix_fp"))

  val t4FingerprintSql: String = s"""
    WITH t AS (SELECT doc_id, text, $oracleTokens AS tokens FROM documents)
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS tokenset_fp,
           md5(substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), 1, 64)) AS prefix_fp
    FROM t"""

  // =========================================================================
  // t5 — PII detection + redaction
  // =========================================================================

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  /** t5 — PII scrubbing, the pass every training-data pipeline runs
    * before text leaves the trust boundary: emails and phone numbers
    * detected (counted via `regexp_extract_all`) and masked in place.
    * The synthetic corpus carries no natural PII, so the fixture text
    * is built deterministically from customer columns INSIDE the query
    * — both engines synthesize and redact identically, keeping the
    * oracle exact while the redaction path does real work on every
    * row. Pure per-row codegen'd expressions: zero shuffles at any
    * scale.
    */
  val t5PiiRedact: Q = (s, dir) =>
    graft.core.Tables.load(s, dir, "customer")
      .select(col("c_custkey"),
        concat(lit("reach "), col("c_name"), lit(" at user"), col("c_custkey"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
          lit(" re "), lower(col("c_mktsegment"))).as("raw"))
      .select(col("c_custkey"),
        (size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))) +
         size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0))))
          .cast("long").as("n_pii"),
        regexp_replace(regexp_replace(col("raw"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]").as("redacted"))

  val t5PiiRedactSql: String = s"""
    WITH raw AS (
      SELECT c_custkey,
             'reach ' || c_name || ' at user' || c_custkey ||
             '@example.com or +1-555-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' re ' || lower(c_mktsegment) AS raw
      FROM customer)
    SELECT c_custkey,
           CAST(len(regexp_extract_all(raw, '$EmailRe')) +
                len(regexp_extract_all(raw, '$PhoneRe')) AS BIGINT) AS n_pii,
           regexp_replace(regexp_replace(raw, '$EmailRe', '[EMAIL]', 'g'),
                          '$PhoneRe', '[PHONE]', 'g') AS redacted
    FROM raw"""

  // =========================================================================
  // t6 — within-document repetition stats (Gopher-style quality signal)
  // =========================================================================

  /** Per-document bigram repetition: total bigrams, the most frequent
    * bigram's count, and two parts-per-million fractions — top-bigram
    * share and duplicated-bigram share (the "rep-2gram" signals of the
    * Gopher/MassiveText quality rules, token-level). Fractions are
    * integer `div` in ppm so both engines produce identical longs.
    *
    * Two narrow aggregations: (doc, gram) counts first — partial
    * aggregation collapses repeats map-side, so a pathological
    * million-repeat spam doc ships one row per distinct gram, not one
    * per occurrence — then one row per distinct gram shuffles to the
    * per-doc stage. Documents shorter than two tokens have no bigrams
    * and drop out on both engines.
    */
  val t6Repetition: Q = (s, dir) => {
    val gc = graft.core.Tables.loadParallel(s, dir, "documents")
      .withColumn("w", expr(tokensExpr))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w)-1)," +
        " i -> concat(element_at(w, i), ' ', element_at(w, i+1)))")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    gc.groupBy("doc_id").agg(
      sum(col("c")).as("n_bigrams"),
      max(col("c")).as("top_cnt"),
      expr("(max(c)*1000000) div sum(c)").as("top_ppm"),
      expr("(sum(CASE WHEN c > 1 THEN c ELSE 0 END)*1000000) div sum(c)")
        .as("dup_ppm"))
  }

  val t6RepetitionSql: String = s"""
    WITH toks AS (
      SELECT doc_id, $oracleTokens AS w FROM documents),
    grams AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS gram
      FROM toks, unnest(range(1, len(w))) AS t(i)),
    gc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           max(c) AS top_cnt,
           (max(c)*1000000) // CAST(sum(c) AS BIGINT) AS top_ppm,
           (CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)*1000000)
             // CAST(sum(c) AS BIGINT) AS dup_ppm
    FROM gc GROUP BY doc_id"""

  // =========================================================================

  /** t7 — lexical diversity: type-token ratio (distinct words /
    * words, in basis points) and mean word length (centichars) — the
    * cheap vocabulary-richness signals a quality gate combines with
    * t2's ratios (low TTR ⇒ template/spam; extreme word length ⇒
    * boilerplate or garbage). Pure map stage over array HOFs: the
    * token array never explodes, nothing shuffles, and both outputs
    * are integer-exact ratios of integer counts.
    */
  val t7LexicalDiversity: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .withColumn("toks",
        expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_types"),
        (size(array_distinct(col("toks"))) * 10000L / size(col("toks")))
          .cast("long").as("ttr_bp"),
        (expr("aggregate(toks, 0L, (a, t) -> a + length(t))") * 100L /
          size(col("toks"))).cast("long").as("mean_wlen_centi"))

  val t7LexicalDiversitySql: String = """
    WITH t AS (
      SELECT doc_id,
             str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ') AS toks
      FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           CAST(len(list_distinct(toks)) * 10000 // len(toks) AS BIGINT) AS ttr_bp,
           CAST(CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS BIGINT)
                * 100 // len(toks) AS BIGINT) AS mean_wlen_centi
    FROM t"""

  /** t8 — rolling polynomial fingerprint (Rabin-Karp form): the char
    * stream folded through `h ← (h·131 + code) mod (2³¹−1)`, plus the
    * same polynomial over just the first 64 chars as a blocking
    * prefix. The full-document value changes on ANY edit (t4's
    * token-set fingerprint deliberately doesn't — word order and
    * repetition are invisible to it), so the pair (t4, t8) separates
    * "same vocabulary" from "same byte stream". The polynomial form
    * is what makes O(1) sliding-window updates possible in a
    * substring-search engine; here the fold is per-document, a
    * zero-shuffle codegen'd map stage, int64-exact in both engines.
    */
  val t8RollingFingerprint: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .select(col("doc_id"),
        expr("""aggregate(
            transform(sequence(1, length(text)), i -> cast(ascii(substring(text, i, 1)) as bigint)),
            0L, (a, c) -> (a * 131 + c) % 2147483647)""").as("roll_hash"),
        expr("""aggregate(
            transform(sequence(1, least(length(text), 64)), i -> cast(ascii(substring(text, i, 1)) as bigint)),
            0L, (a, c) -> (a * 131 + c) % 2147483647)""").as("prefix_hash"))

  val t8RollingFingerprintSql: String = """
    SELECT doc_id,
           CAST(list_reduce(
             [0] || list_transform(range(1, length(text) + 1),
                                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
             (a, c) -> (a * 131 + c) % 2147483647) AS BIGINT) AS roll_hash,
           CAST(list_reduce(
             [0] || list_transform(range(1, least(length(text), 64) + 1),
                                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
             (a, c) -> (a * 131 + c) % 2147483647) AS BIGINT) AS prefix_hash
    FROM documents"""

  // =========================================================================

  /** t9 — corpus bigram-LM scoring: each document's mean add-one-
    * smoothed bigram log-probability under the corpus's own counts —
    * the KenLM-style perplexity filter every web-scale quality
    * pipeline runs (low score = word salad / boilerplate the corpus
    * itself doesn't predict), self-trained so the sandbox needs no
    * model artifact.
    *
    * Determinism discipline: each bigram's
    * `ln((c12+1)/(c1+V))` rounds ONCE to integer micros, and per-doc
    * aggregation sums exact longs (order-independent — a double sum
    * of raw lns would hash differently between engines; q39's BM25
    * precedent). The mean ships as the exact (sum, n) pair plus one
    * final correctly-rounded double division.
    *
    * Scale: bigram/unigram count tables are corpus-sized aggregates
    * joined back by equi-key — each doc bigram matches exactly one
    * count row (fan-out 1, no blocking needed); V is a one-row scalar
    * broadcast (the allowlisted cross shape).
    */
  val t9LmScore: Q = (s, dir) => {
    // cached: toks feeds the bigram AND unigram branches (and the
    // cache boundary keeps the unigram explode's inferred size()>0
    // filter reading materialized arrays instead of re-tokenizing on
    // the scan side); grams feeds the count table AND the score join
    val toks = Tables.loadParallel(s, dir, "documents")
      .withColumn("w", expr(tokensExpr))
      .filter(size(col("w")) >= 2)
      .registerCache()
    val grams = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(w)-1)," +
      " i -> struct(element_at(w, i) as w1, element_at(w, i+1) as w2))")).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      .registerCache()
    val uni = toks.select(explode(col("w")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = grams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // r15 restructure (guide §2.3 "shuffle fewer bytes" + §3
    // scale-honesty): the old shape joined the GRAM STREAM to bi on
    // (w1,w2) and then AGAIN to uni on w1 — two corpus-grain
    // exchanges — and at sf0.1 the planner even BROADCAST the
    // gram-grain join result (BuildLeft), a plan that cannot exist at
    // 100 TB. The smoothed log-prob depends only on the BIGRAM TYPE,
    // so fold uni and V into the count table first (bigram-type-grain
    // join, w1-keyed) and attach the finished lp_micro to the stream
    // with ONE (w1,w2) join: the token stream is exchanged once, not
    // twice. shuffle_hash pin on that join for the same reason as
    // g3/g5/g9: the lp table is corpus-sized (bigram types), so the
    // production plan shuffles — a small-SF broadcast would hide the
    // join's true exchange. The DuckDB oracle keeps the two-join
    // per-occurrence form, re-proving the regroup cross-engine.
    val lp = bi
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), expr(
        "cast(round(1e6 * (ln(cast(c12 + 1 as double))" +
        " - ln(cast(c1 + v as double)))) as bigint)").as("lp_micro"))
    grams
      .join(lp.hint("shuffle_hash"), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           sum("lp_micro").as("sum_lp_micro"))
      .withColumn("mean_lp_micro",
        col("sum_lp_micro").cast("double") / col("n_bigrams").cast("double"))
  }

  val t9LmScoreSql: String = s"""
    WITH toks AS (
      SELECT doc_id, $oracleTokens AS w FROM documents),
    t2 AS (SELECT doc_id, w FROM toks WHERE len(w) >= 2),
    grams AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM t2, unnest(range(1, len(w))) AS t(i)),
    uni AS (SELECT w1, count(*) AS c1
            FROM (SELECT unnest(w) AS w1 FROM t2) GROUP BY 1),
    bi AS (SELECT w1, w2, count(*) AS c12 FROM grams GROUP BY 1, 2),
    vocab AS (SELECT count(*) AS v FROM uni),
    scored AS (
      SELECT doc_id,
             CAST(round(1e6 * (ln(CAST(c12 + 1 AS DOUBLE))
                               - ln(CAST(c1 + v AS DOUBLE)))) AS BIGINT) AS lp_micro
      FROM grams JOIN bi USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro,
           CAST(CAST(SUM(lp_micro) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_lp_micro
    FROM scored GROUP BY doc_id"""

  // =========================================================================
  // t10 — Gopher/MassiveText-style document quality rules
  // =========================================================================

  /** The standard repetition-free quality gate from the Gopher /
    * MassiveText pipeline (Rae et al. 2021, §A1.1 — public paper):
    * word-count bounds, mean-word-length band, symbol-to-word ratio,
    * bullet/ellipsis line shares, alphabetic-word share, and a minimum
    * number of distinct required stopwords. Pure per-row map stage, no
    * shuffle; every ratio test is integer cross-multiplication so the
    * oracle matches bit-exactly (no division, no doubles). At 100 TB
    * this runs inside the scan's whole-stage codegen and the filter
    * column prunes to (text) only.
    */
  val t10GopherRules: Q = (s, dir) => {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopArr = stops.map(w => s"'$w'").mkString(", ")
    Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .withColumn("lines", expr("split(text, '\n')"))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_words"),
        expr("aggregate(tokens, cast(0 as bigint), (a, t) -> a + length(t))")
          .as("word_chars"),
        expr("size(regexp_extract_all(text, '#', 0))").as("n_symbol"),
        expr("size(filter(tokens, t -> t rlike '[a-zA-Z]'))").as("n_alpha_words"),
        expr(s"size(filter(array($stopArr), w -> array_contains(tokens, w)))")
          .as("n_stop_distinct"),
        size(col("lines")).as("n_lines"),
        expr("size(filter(lines, l -> startswith(trim(l), '-') or startswith(trim(l), '*')))")
          .as("n_bullet"),
        expr("size(filter(lines, l -> endswith(trim(l), '...')))")
          .as("n_ellipsis_end"))
      .withColumn("kept",
        col("n_words").between(50, 100000) &&
        col("word_chars") >= col("n_words") * 3 &&
        col("word_chars") <= col("n_words") * 10 &&
        col("n_symbol") * 10 < col("n_words") &&
        col("n_bullet") * 10 < col("n_lines") * 9 &&
        col("n_ellipsis_end") * 10 < col("n_lines") * 3 &&
        col("n_alpha_words") * 5 >= col("n_words") * 4 &&
        col("n_stop_distinct") >= 2)
  }

  val t10GopherRulesSql: String = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopArr = stops.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, $oracleTokens AS tokens,
                      str_split(text, chr(10)) AS lines
               FROM documents),
    m AS (SELECT doc_id,
            len(tokens) AS n_words,
            CAST(list_sum(list_transform(tokens, t -> length(t))) AS BIGINT) AS word_chars,
            len(regexp_extract_all(text, '#')) AS n_symbol,
            len(list_filter(tokens, t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha_words,
            len(list_filter([$stopArr], w -> list_contains(tokens, w))) AS n_stop_distinct,
            len(lines) AS n_lines,
            len(list_filter(lines, l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*'))) AS n_bullet,
            len(list_filter(lines, l -> ends_with(trim(l), '...'))) AS n_ellipsis_end
          FROM t)
    SELECT *,
           (n_words BETWEEN 50 AND 100000)
           AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
           AND n_symbol * 10 < n_words
           AND n_bullet * 10 < n_lines * 9
           AND n_ellipsis_end * 10 < n_lines * 3
           AND n_alpha_words * 5 >= n_words * 4
           AND n_stop_distinct >= 2 AS kept
    FROM m"""
  }

  // =========================================================================
  // t11 — document structure statistics
  // =========================================================================

  /** Structural profile per document — the layout-quality signals a
    * curation pipeline gates on alongside t2's lexical ratios:
    * sentence count (split on terminal punctuation, empty segments
    * dropped on both engines so trailing-separator semantics can't
    * diverge), mean sentence length in integer micro-tokens, the
    * longest token (markup/URL debris shows up as 50-char "words"),
    * and the uppercase share of letters in basis points (shouting or
    * header-only fragments). Pure map stage — no shuffle at all
    * beyond the parallelism floor; every ratio is integer
    * cross-multiplied so the hash gate is exact.
    */
  val t11StructureStats: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .withColumn("sentences",
        expr("filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0)"))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        size(col("sentences")).as("n_sentences"),
        expr("""cast(size(tokens) as bigint) * 1000000
                div greatest(1, size(sentences))""").as("tokens_per_sentence_micro"),
        expr("array_max(transform(tokens, t -> length(t)))").as("max_token_len"),
        expr("""size(regexp_extract_all(text, '[A-Z]', 0)) * 10000
                div greatest(1, size(regexp_extract_all(text, '[A-Za-z]', 0)))""")
          .as("caps_bp"))

  val t11StructureStatsSql: String = s"""
    WITH t AS (
      SELECT doc_id, text, $oracleTokens AS tokens,
             list_filter(regexp_split_to_array(text, '[.!?]+'),
                         x -> length(trim(x)) > 0) AS sentences
      FROM documents)
    SELECT doc_id,
           len(tokens) AS n_tokens,
           len(sentences) AS n_sentences,
           CAST(len(tokens) AS BIGINT) * 1000000
             // greatest(1, len(sentences)) AS tokens_per_sentence_micro,
           list_max(list_transform(tokens, t -> length(t))) AS max_token_len,
           len(regexp_extract_all(text, '[A-Z]')) * 10000
             // greatest(1, len(regexp_extract_all(text, '[A-Za-z]'))) AS caps_bp
    FROM t"""

  // =========================================================================
  // t12 — Zipf-law fit over the vocabulary head
  // =========================================================================

  /** How Zipfian is the corpus? Token frequencies vs rank on a log-log
    * scale should be near-linear with slope ≈ −1 for natural language;
    * machine-generated or templated corpora bend away from it, which
    * makes the fitted slope a cheap corpus-level health metric next to
    * t9's per-document LM score.
    *
    * Fit discipline: the regression runs over the TOP-[[ZipfHead]]
    * ranks only — statistically standard (the rank tail always deviates
    * from Zipf) and what makes the arithmetic scale-proof: with rank
    * bounded, every log lives in a known range and the exact-integer
    * sufficient statistics (q86's discipline: logs rounded ONCE to
    * milli-nats as int64, exact sums, one final double division) cannot
    * overflow at any corpus size. Rank itself comes from
    * [[graft.ops.DistributedRank]] over the total order (count desc,
    * word asc) — the vocab grain never collapses to one task.
    *
    * Scale shape: one corpus-sized explode+agg to the vocab grain (the
    * same exchange every keyword query pays), one range exchange of the
    * vocab for ranking, then a ≤[[ZipfHead]]-row aggregate. */
  private val ZipfHead = 5000

  val t12Zipf: Q = (s, dir) => {
    val vocab = Tables.loadParallel(s, dir, "documents")
      .select(explode(expr(tokensExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val ranked = graft.ops.DistributedRank.withGlobalRank(
        vocab, Seq(col("c").desc, col("w").asc), "r", "n_vocab")
      .filter(col("r") <= ZipfHead)
      .select(
        expr("cast(round(1000 * ln(cast(r as double))) as bigint)").as("lx"),
        expr("cast(round(1000 * ln(cast(c as double))) as bigint)").as("ly"))
    ranked.agg(
        count(lit(1)).as("n_head"),
        sum("lx").as("sx"), sum("ly").as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      .withColumn("zipf_slope",
        (col("n_head") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n_head") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("zipf_intercept_nats",
        ((col("sy").cast("double") -
          col("zipf_slope") * col("sx").cast("double")) /
          col("n_head").cast("double")) / 1000.0)
      .select("n_head", "zipf_slope", "zipf_intercept_nats")
  }

  val t12ZipfSql: String = s"""
    WITH vocab AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest($oracleTokens) AS w FROM documents)
      GROUP BY w),
    ranked AS (
      SELECT row_number() OVER (ORDER BY c DESC, w ASC) AS r, c FROM vocab),
    logs AS (
      SELECT CAST(round(1000 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS lx,
             CAST(round(1000 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS ly
      FROM ranked WHERE r <= $ZipfHead),
    stats AS (
      SELECT COUNT(*) AS n_head,
             CAST(SUM(lx) AS BIGINT) AS sx, CAST(SUM(ly) AS BIGINT) AS sy,
             CAST(SUM(lx*ly) AS BIGINT) AS sxy, CAST(SUM(lx*lx) AS BIGINT) AS sxx
      FROM logs)
    SELECT n_head,
           CAST(n_head*sxy - sx*sy AS DOUBLE)
             / CAST(n_head*sxx - sx*sx AS DOUBLE) AS zipf_slope,
           ((CAST(sy AS DOUBLE)
               - (CAST(n_head*sxy - sx*sy AS DOUBLE)
                  / CAST(n_head*sxx - sx*sx AS DOUBLE)) * CAST(sx AS DOUBLE))
              / CAST(n_head AS DOUBLE)) / 1000.0 AS zipf_intercept_nats
    FROM stats"""

  /** t13 — per-document character-entropy quality signal: Shannon
    * entropy of the byte/char distribution, the cheap compressibility
    * proxy a pretraining filter thresholds on (boilerplate, base64
    * blobs and key-mash have entropy far from prose's ~4.1 bits; CCNet
    * and Gopher both carry a compression-ratio cousin of this rule).
    *
    * ZERO-shuffle: the whole computation — char histogram, entropy
    * fold — lives inside one codegen'd map stage via higher-order
    * functions (t8's discipline); the per-doc distinct-char alphabet
    * is bounded (~100), so the inner `filter` count is O(alphabet ×
    * len), a constant-factor map cost that scales embarrassingly at
    * 100 TB. Determinism: each `ln` is rounded ONCE to integer micros
    * (t9/t12's rule), the per-char terms are exact integers, and the
    * sum `Σ c·(L(n)−L(c))` is order-independent — the one final
    * double division happens identically in both engines.
    */
  val t13CharEntropy: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .withColumn("codes",
        expr("transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1)))"))
      .withColumn("counts",
        expr("transform(array_distinct(codes), c -> cast(size(filter(codes, x -> x = c)) as bigint))"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("counts")).cast("long").as("n_distinct_chars"),
        expr("""aggregate(counts, cast(0 as bigint),
            (a, k) -> a + k * (cast(round(1e6 * ln(cast(length(text) as double))) as bigint)
                               - cast(round(1e6 * ln(cast(k as double))) as bigint)))""")
          .as("ent_sum_micro"))
      .withColumn("entropy_micronats",
        col("ent_sum_micro").cast("double") / col("n_chars").cast("double"))
      .select("doc_id", "n_chars", "n_distinct_chars", "entropy_micronats")

  val t13CharEntropySql: String = """
    WITH t AS (
      SELECT doc_id, text,
             list_transform(range(1, length(text) + 1),
                            i -> ascii(substring(text, i, 1))) AS codes,
             CAST(length(text) AS BIGINT) AS n
      FROM documents),
    u AS (
      SELECT doc_id, n,
             list_transform(list_distinct(codes),
               c -> CAST(len(list_filter(codes, x -> x = c)) AS BIGINT)) AS counts
      FROM t),
    e AS (
      SELECT doc_id, n,
             CAST(len(counts) AS BIGINT) AS n_distinct_chars,
             CAST(list_aggregate(
               list_transform(counts, k ->
                 k * (CAST(round(1e6 * ln(CAST(n AS DOUBLE))) AS BIGINT)
                      - CAST(round(1e6 * ln(CAST(k AS DOUBLE))) AS BIGINT))),
               'sum') AS BIGINT) AS ent_sum_micro
      FROM u)
    SELECT doc_id, n AS n_chars, n_distinct_chars,
           CAST(ent_sum_micro AS DOUBLE) / CAST(n AS DOUBLE) AS entropy_micronats
    FROM e"""

  /** t14 — token burstiness (Church & Gale): the variance-to-mean
    * ratio of each term's per-document count over the WHOLE corpus
    * (zeros included). Content words are bursty (VMR ≫ 1: absent
    * almost everywhere, repeated where they appear); function words
    * are Poisson-ish (VMR ≈ 1). The signal that separates topical
    * vocabulary from glue — what a keyword extractor or stop-list
    * builder thresholds on, orthogonally to raw frequency (t12's
    * Zipf rank says how often; this says how CLUMPED).
    *
    * Exactness: VMR = (N·Σx² − (Σx)²) / (N·Σx) from int64 sufficient
    * statistics on the vocab grain — zeros enter through N only, so
    * the per-doc zero rows never materialize; ONE final IEEE division.
    * Scale shape: token explode → (doc, term) map-combined count →
    * vocab-grain aggregate; the corpus size N is a one-row broadcast
    * (q39's scalar shape). df ≥ 20 keeps the estimate stable.
    */
  val t14Burstiness: Q = (s, dir) => {
    val docs = Tables.loadParallel(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(expr("split(regexp_replace(lower(trim(text)), ' +', ' '), ' ')"))
        .as("term"))
    val perDoc = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("x"))
    val stats = perDoc.groupBy("term").agg(
      count(lit(1)).as("df"),
      sum("x").as("sx"),
      sum(expr("x * x")).as("sxx"))
      .filter(col("df") >= 20)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(broadcast(n))
      .select(col("term"), col("df"), col("sx").as("total_tf"),
        ((col("n_docs") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("n_docs") * col("sx")).cast("double")).as("vmr"))
  }

  val t14BurstinessSql: String = """
    WITH toks AS (
      SELECT doc_id,
             unnest(str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS term
      FROM documents),
    pd AS (SELECT doc_id, term, count(*) AS x FROM toks GROUP BY 1, 2),
    st AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pd GROUP BY 1 HAVING count(*) >= 20),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT term, df, sx AS total_tf,
           CAST(n_docs * sxx - sx * sx AS DOUBLE)
             / CAST(n_docs * sx AS DOUBLE) AS vmr
    FROM st CROSS JOIN n"""

  // =========================================================================
  // t15 — Heaps'-law vocabulary growth
  // =========================================================================

  /** Heaps'-law vocabulary-growth curve: cumulative distinct types vs
    * cumulative tokens at ten doc-id checkpoints, plus the pointwise
    * exponent ln(types)/ln(tokens) in ppm. The sub-linear curve
    * (β ≈ 0.4–0.6 for natural text) is the corpus-level health check
    * next to t12's Zipf slope: a β near 1 means near-disjoint
    * vocabularies (OCR noise, random ids), a β near 0 means the
    * corpus stopped contributing new types — both are sourcing
    * signals no per-doc score catches.
    *
    * The distributed trick: "types seen by checkpoint d" needs no
    * cumulative distinct — each word contributes at its FIRST doc
    * (min doc_id), so one vocab-grain aggregate + a 10-row histogram
    * + a prefix sum over the decile frame reproduces the whole curve.
    * Token mass per decile is the same shape on the doc grain.
    *
    * Scale shape: one explode + word-grain min (map-side combined),
    * one doc-grain map, each histogrammed to 10 rows by the decile
    * tag `doc_id·10 div (max_id+1)` (one-row max broadcast, q39's
    * scalar shape); the two prefix sums are partition-less windows
    * over the TEN-row joined frame — bounded by the checkpoint count,
    * never the corpus. ln is applied once per checkpoint and rounded
    * to micros (t13's rule). A decile holding zero docs emits no row
    * (cumulative values at the other checkpoints stay correct).
    */
  val t15HeapsLaw: Q = (s, dir) => {
    val docs = Tables.loadParallel(s, dir, "documents")
      .withColumn("tokens", expr(tokensExpr))
      .select(col("doc_id"), col("tokens")).registerCache()
    val maxId = docs.agg(max("doc_id").as("max_id"))
    val decile = expr("doc_id * 10 div (max_id + 1) + 1")
    val tokMass = docs.select(col("doc_id"), size(col("tokens")).cast("long").as("n_tok"))
      .crossJoin(broadcast(maxId))
      .groupBy(decile.as("decile")).agg(sum("n_tok").as("d_tokens"))
    val firstDoc = docs.select(explode(col("tokens")).as("w"), col("doc_id"))
      .groupBy("w").agg(min("doc_id").as("doc_id"))
      .crossJoin(broadcast(maxId))
      .groupBy(decile.as("decile")).agg(count(lit(1)).as("d_types"))
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    tokMass.join(firstDoc, Seq("decile"), "left")
      .withColumn("tokens_so_far", sum("d_tokens").over(w))
      .withColumn("types_so_far", sum(coalesce(col("d_types"), lit(0L))).over(w))
      .select(col("decile"), col("tokens_so_far"), col("types_so_far"),
        expr("""cast(round(1e6 * ln(cast(types_so_far as double))) as bigint) * 1000000
                div cast(round(1e6 * ln(cast(tokens_so_far as double))) as bigint)""")
          .as("heaps_ratio_ppm"))
  }

  val t15HeapsLawSql: String = s"""
    WITH d AS (
      SELECT doc_id, $oracleTokens AS tokens FROM documents),
    mx AS (SELECT max(doc_id) AS max_id FROM d),
    tok AS (
      SELECT doc_id * 10 // (max_id + 1) + 1 AS decile,
             CAST(sum(len(tokens)) AS BIGINT) AS d_tokens
      FROM d CROSS JOIN mx GROUP BY 1),
    fd AS (
      SELECT w, min(doc_id) AS doc_id
      FROM (SELECT doc_id, unnest(tokens) AS w FROM d) GROUP BY w),
    typ AS (
      SELECT doc_id * 10 // (max_id + 1) + 1 AS decile, count(*) AS d_types
      FROM fd CROSS JOIN mx GROUP BY 1),
    cum AS (
      SELECT decile,
             CAST(sum(d_tokens) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_so_far,
             CAST(sum(coalesce(d_types, 0)) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS types_so_far
      FROM tok LEFT JOIN typ USING (decile))
    SELECT decile, tokens_so_far, types_so_far,
           CAST(round(1e6 * ln(CAST(types_so_far AS DOUBLE))) AS BIGINT) * 1000000
             // CAST(round(1e6 * ln(CAST(tokens_so_far AS DOUBLE))) AS BIGINT) AS heaps_ratio_ppm
    FROM cum"""

  // =========================================================================
  // t16 — readability scores (Flesch reading ease / FK grade level)
  // =========================================================================

  /** Per-document readability — the audience-difficulty signal a
    * curriculum (c12) or quality gate (t2/t10) consumes: Flesch
    * reading ease and Flesch-Kincaid grade level in exact integer
    * milli-points. Syllables are approximated as vowel-group runs
    * (`[aeiouy]+`) over the lowercased text — the standard cheap
    * estimator; consonant-only tokens (numerals, codes) contribute 0,
    * so the total is floored at one syllable per word to keep the
    * formula in its intended range. Sentences follow t11's exact
    * convention (terminal-punctuation split, blank segments dropped).
    *
    * Both scores are linear in words/sentence and syllables/word with
    * published constants; each ratio is computed as ONE floor division
    * of milli-scaled int64 (1015·w div s, 84600·syl div w …), so the
    * result is deterministic to the last milli-point on both engines —
    * never a float in sight. FRE can legitimately go negative on
    * dense text (subtraction, not division). Pure map stage over the
    * document scan: zero shuffle at any corpus size.
    */
  val t16Readability: Q = (s, dir) =>
    Tables.loadParallel(s, dir, "documents")
      .withColumn("w", expr(s"size($tokensExpr)").cast("long"))
      .withColumn("sen", expr(
        "cast(greatest(1, size(filter(split(text, '[.!?]+'), x -> length(trim(x)) > 0))) as long)"))
      .withColumn("syl", expr(
        "greatest(cast(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) as long), w)"))
      .select(col("doc_id"), col("w").as("n_words"),
        col("sen").as("n_sentences"), col("syl").as("n_syllables"),
        expr("206835 - (1015 * w) div sen - (84600 * syl) div w").as("fre_milli"),
        expr("(390 * w) div sen + (11800 * syl) div w - 15590").as("fkgl_milli"))

  val t16ReadabilitySql: String = s"""
    WITH t AS (
      SELECT doc_id,
             CAST(len($oracleTokens) AS BIGINT) AS w,
             CAST(greatest(1, len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                              x -> length(trim(x)) > 0))) AS BIGINT) AS sen,
             greatest(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT),
                      CAST(len($oracleTokens) AS BIGINT)) AS syl
      FROM documents)
    SELECT doc_id, w AS n_words, sen AS n_sentences, syl AS n_syllables,
           206835 - (1015 * w) // sen - (84600 * syl) // w AS fre_milli,
           (390 * w) // sen + (11800 * syl) // w - 15590 AS fkgl_milli
    FROM t"""

  val queries: Map[String, Q] = Map(
    "t16_readability" -> t16Readability,
    "t15_heaps_law" -> t15HeapsLaw,
    "t14_burstiness" -> t14Burstiness,
    "t13_char_entropy" -> t13CharEntropy,
    "t12_zipf" -> t12Zipf,
    "t11_structure_stats" -> t11StructureStats,
    "t10_gopher_rules" -> t10GopherRules,
    "t9_lm_score" -> t9LmScore,
    "t8_rolling_fingerprint" -> t8RollingFingerprint,
    "t7_lexical_diversity" -> t7LexicalDiversity,
    "t1_lang_id"       -> t1LangId,
    "t2_quality_score" -> t2QualityScore,
    "t3_token_count"   -> t3TokenCount,
    "t4_fingerprint"   -> t4Fingerprint,
    "t5_pii_redact"    -> t5PiiRedact,
    "t6_repetition"    -> t6Repetition,
  )

  val oracleSql: Map[String, String] = Map(
    "t16_readability" -> t16ReadabilitySql,
    "t15_heaps_law" -> t15HeapsLawSql,
    "t14_burstiness" -> t14BurstinessSql,
    "t13_char_entropy" -> t13CharEntropySql,
    "t12_zipf" -> t12ZipfSql,
    "t11_structure_stats" -> t11StructureStatsSql,
    "t10_gopher_rules" -> t10GopherRulesSql,
    "t9_lm_score" -> t9LmScoreSql,
    "t8_rolling_fingerprint" -> t8RollingFingerprintSql,
    "t7_lexical_diversity" -> t7LexicalDiversitySql,
    "t1_lang_id"       -> t1LangIdSql,
    "t2_quality_score" -> t2QualityScoreSql,
    "t3_token_count"   -> t3TokenCountSql,
    "t4_fingerprint"   -> t4FingerprintSql,
    "t5_pii_redact"    -> t5PiiRedactSql,
    "t6_repetition"    -> t6RepetitionSql,
  )
}

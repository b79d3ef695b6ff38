package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Caching.RegisterSyntax

/** BPE merge learning — the vocabulary-training step of a tokenizer
  * pipeline (Sennrich et al. 2016 word-internal BPE), as a corpus
  * query. The reference stops at morphological tokenization
  * (`Keyword.py`); a training-data engine also needs the step that
  * LEARNS the subword vocabulary from the corpus it just cleaned.
  *
  * Shape: the ONLY corpus-sized exchange is the word-frequency
  * aggregate (explode + groupBy(word)); every merge round after that
  * runs on the word-DISTINCT grain — bounded by vocabulary size
  * (~10⁷ at 100 TB, vs 10¹¹ token occurrences), the same
  * corpus-to-vocab reduction k5/q40 pivot on. A round is: adjacent
  * symbol-pair counts weighted by word frequency (vocab-grain
  * aggregate), top-1 pair via TakeOrdered (cnt desc, pair asc —
  * pinned tie-break), and a 1-row broadcast that rewrites the symbol
  * strings. Rounds are FIXED (3) and chain lazily — no driver action,
  * g1's discipline.
  *
  * Cross-engine exactness: symbol strings are space-separated and
  * sentinel-padded (`' h e l l o '`), so applying a merge is a
  * LITERAL `replace(' l l ', ' ll ')` — both engines scan left to
  * right non-overlapping, which IS greedy BPE application semantics
  * (`' a l l l b '` → `' a ll l b '`), and the trailing-space
  * consumption prevents a merged symbol from matching inside a
  * neighbor (`' e s '` cannot match the `st` in `' t e st '`).
  * Pair counts are exact longs; ordering ties break on the pair
  * strings, binary collation in both engines.
  */
object Bpe {

  type Q = (SparkSession, String) => DataFrame

  private val Rounds = 3
  private val VocabTop = 20

  /** Adjacent-pair weighted counts of `sym` over word-frequency rows. */
  private def pairCounts(v: DataFrame): DataFrame =
    v.select(col("n"), expr("split(trim(sym), ' ')").as("sy"))
      .select(col("n"), explode(expr(
        """zip_with(slice(sy, 1, size(sy)-1), slice(sy, 2, size(sy)-1),
           (a, b) -> struct(a AS l, b AS r))""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("n").as("cnt"))

  /** (winning pair per round, final vocab state) over a (word, n)
    * frequency table whose `sym` column is the padded char string. */
  private[text] def learnMerges(v0: DataFrame): (Seq[DataFrame], DataFrame) = {
    var v = v0
    val tops = (1 to Rounds).map { _ =>
      // both tiny, both multiply-consumed: the winner feeds the merge
      // table AND every later round's rewrite; the rewritten vocab
      // feeds the next round's pair counts AND the final vocab tail —
      // uncached, round i re-derives rounds 1..i-1
      val top = pairCounts(v).orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
        .registerCache()
      // LEFT join against the 1-row winner: a round with no pairs left
      // (degenerate vocab) must be a no-op, not annihilate the vocab
      // the way a crossJoin against an empty frame would
      v = v.join(broadcast(top), lit(true), "left_outer")
        .withColumn("sym", when(col("l").isNull, col("sym"))
          .otherwise(expr("replace(sym, ' '||l||' '||r||' ', ' '||l||r||' ')")))
        .select("word", "n", "sym")
        .registerCache()
      top
    }
    (tops, v)
  }

  /** Word-frequency table with the padded char-string start state. */
  private def v0Of(s: SparkSession, dir: String): DataFrame =
    // tier-served word counts (the k1 argument — BPE training starts
    // from the same token stream every tf consumer reads)
    graft.text.TokenStore.served(s, dir)
      .select(col("term").as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("sym",
        concat(lit(" "), trim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" ")))
      .registerCache()

  /** v1 — the 3-round merge table plus the top-20 learned symbols by
    * weighted frequency (the vocab tail proves the replaces applied
    * corpus-wide, not just that the argmax agreed). */
  val v1BpeMerges: Q = (s, dir) => {
    val v0 = v0Of(s, dir)
    val (tops, vFinal) = learnMerges(v0)
    val merges = tops.zipWithIndex.map { case (t, i) =>
      t.select(lit("merge").as("kind"), lit((i + 1).toLong).as("bpe_round"),
        col("l").as("left_sym"), col("r").as("right_sym"), col("cnt"))
    }.reduce(_.unionByName(_))
    val vocab = vFinal
      .select(col("n"), explode(expr("split(trim(sym), ' ')")).as("s"))
      .groupBy("s").agg(sum("n").as("cnt"))
      .orderBy(col("cnt").desc, col("s")).limit(VocabTop)
      .select(lit("symbol").as("kind"), lit(3L).as("bpe_round"),
        col("s").as("left_sym"), lit(null).cast("string").as("right_sym"),
        col("cnt"))
    merges.unionByName(vocab)
  }

  /** v2 — ENCODE with the learned vocab: segment every document
    * against the trained merge table and report per-doc subword
    * stats. Segmentation happens ONCE PER DISTINCT WORD (the same
    * vocab-grain table v1 trains on), then joins back to the corpus
    * on the word key — at 100 TB that is a vocab-sized build side on
    * a keyed join, never a per-occurrence re-derivation; the per-doc
    * rollup rides hash(doc_id). `fertility_micro` is the tokens-per-
    * word ratio in integer micros (the metric a tokenizer team
    * watches when a vocab change ships). */
  val v2BpeTokenize: Q = (s, dir) => {
    val (_, vFinal) = learnMerges(v0Of(s, dir))
    val seg = vFinal.select(col("word"),
      size(expr("split(trim(sym), ' ')")).cast("long").as("n_sub"))
    graft.text.TokenStore.served(s, dir)
      .select(col("doc_id"), col("term").as("word"))
      .join(seg, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_tokens"))
      .withColumn("fertility_micro",
        expr("cast(round(1e6 * cast(n_tokens as double) / n_words) as bigint)"))
  }

  private def roundCtes(i: Int): String = s"""
    p$i AS (
      SELECT l, r, CAST(sum(n) AS BIGINT) AS cnt FROM (
        SELECT n, unnest(sy[:len(sy)-1]) AS l, unnest(sy[2:]) AS r
        FROM (SELECT n, str_split(trim(sym), ' ') AS sy FROM v${i - 1}))
      GROUP BY 1, 2),
    t$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
    v$i AS (SELECT word, n,
              CASE WHEN l IS NULL THEN sym
                   ELSE replace(sym, ' '||l||' '||r||' ', ' '||l||r||' ') END AS sym
            FROM v${i - 1} LEFT JOIN t$i ON true)"""

  val v1BpeMergesSql: String = s"""
    WITH words AS (
      SELECT word, count(*) AS n FROM (
        SELECT unnest(str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS word
        FROM documents) GROUP BY 1),
    v0 AS (SELECT word, n,
             ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS sym
           FROM words),
    ${roundCtes(1)},
    ${roundCtes(2)},
    ${roundCtes(3)},
    merges AS (
      SELECT 'merge' AS kind, CAST(1 AS BIGINT) AS bpe_round, l AS left_sym, r AS right_sym, cnt FROM t1
      UNION ALL SELECT 'merge', 2, l, r, cnt FROM t2
      UNION ALL SELECT 'merge', 3, l, r, cnt FROM t3),
    vocab AS (
      SELECT 'symbol' AS kind, CAST(3 AS BIGINT) AS bpe_round, s AS left_sym,
             CAST(NULL AS VARCHAR) AS right_sym, CAST(sum(n) AS BIGINT) AS cnt
      FROM (SELECT n, unnest(str_split(trim(sym), ' ')) AS s FROM v3)
      GROUP BY 3 ORDER BY cnt DESC, left_sym LIMIT $VocabTop)
    SELECT * FROM merges UNION ALL SELECT * FROM vocab"""

  val v2BpeTokenizeSql: String = s"""
    WITH words AS (
      SELECT word, count(*) AS n FROM (
        SELECT unnest(str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS word
        FROM documents) GROUP BY 1),
    v0 AS (SELECT word, n,
             ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' ' AS sym
           FROM words),
    ${roundCtes(1)},
    ${roundCtes(2)},
    ${roundCtes(3)},
    seg AS (SELECT word, CAST(len(str_split(trim(sym), ' ')) AS BIGINT) AS n_sub FROM v3),
    toks AS (
      SELECT doc_id,
             unnest(str_split(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), ' ')) AS word
      FROM documents)
    SELECT doc_id, count(*) AS n_words, CAST(sum(n_sub) AS BIGINT) AS n_tokens,
           CAST(round(1e6 * CAST(sum(n_sub) AS DOUBLE) / count(*)) AS BIGINT) AS fertility_micro
    FROM toks JOIN seg USING (word)
    GROUP BY doc_id"""

  val queries: Map[String, Q] =
    Map("v1_bpe_merges" -> v1BpeMerges, "v2_bpe_tokenize" -> v2BpeTokenize)
  val oracleSql: Map[String, String] =
    Map("v1_bpe_merges" -> v1BpeMergesSql, "v2_bpe_tokenize" -> v2BpeTokenizeSql)
}

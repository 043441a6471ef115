package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Text, Unigram, WordPiece}

/**
 * Subword-tokenizer operator scenarios: WordPiece greedy longest-match
 * and Unigram-LM Viterbi (the [[graft.ops.Bpe]] queries' siblings —
 * together the three subword families production pipelines tokenize
 * with). Oracles replay the EXACT segmentation algorithms in DuckDB:
 * the greedy walk and the Viterbi DP run as recursive CTEs over a fixed
 * vocabulary shared at query-build time (the FixedEnglishMerges
 * pattern), with INTEGER micro-nat scores making the Viterbi argmax
 * engine-exact. The fitted paths ([[WordPiece.fit]], [[Unigram.fit]])
 * are spec-checked (TokenizerSpec) — fit statistics are
 * corpus-dependent, so oracles pin the apply semantics instead.
 */
object TokenizerQ extends QueryGroup {

  private def sqlList(xs: Seq[String]): String =
    xs.map(p => s"'$p'").mkString("[", ",", "]")

  /** The WordPiece greedy walk as a recursive CTE: per word, one row per
    * consumed piece-step; `bl` = the longest vocab match at the cursor
    * (list_max over the match-filtered lengths = longest-match-first);
    * no match → the word collapses to the single unk token. Ends in
    * `wpagg(doc_id, toks)` — docs with no tokenizable words are restored
    * by the caller's LEFT JOIN. */
  private def wpAggCte: String = {
    val v = WordPiece.FixedEnglishVocab
    val vocabSql = sqlList(v.pieces)
    val ml = v.pieces.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    s"""w0 AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word,
      |         generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1) AS widx
      |  FROM documents),
      |words AS (SELECT doc_id, widx, word FROM w0 WHERE word <> ''),
      |wprec(doc_id, widx, word, pos, toks) AS (
      |  SELECT doc_id, widx, word, 0, CAST([] AS VARCHAR[]) FROM words
      |  UNION ALL
      |  SELECT doc_id, widx, word,
      |    CASE WHEN bl IS NULL THEN length(word) ELSE pos + bl END,
      |    CASE WHEN bl IS NULL THEN ['${v.unk}']
      |         ELSE list_append(toks, CASE WHEN pos = 0 THEN substr(word, pos + 1, bl)
      |                                     ELSE '##' || substr(word, pos + 1, bl) END) END
      |  FROM (
      |    SELECT *, list_max(list_filter(range(1, $ml + 1), L ->
      |        pos + L <= length(word) AND list_contains($vocabSql,
      |          CASE WHEN pos = 0 THEN substr(word, pos + 1, L)
      |               ELSE '##' || substr(word, pos + 1, L) END))) AS bl
      |    FROM wprec WHERE pos < length(word)) t),
      |wpfin AS (SELECT doc_id, widx, toks FROM wprec WHERE pos >= length(word)),
      |wpagg AS (SELECT doc_id, flatten(list(toks ORDER BY widx)) AS toks
      |  FROM wpfin GROUP BY doc_id)""".stripMargin
  }

  /** The Unigram-LM Viterbi DP as a recursive CTE: the forward pass
    * carries the dp/backpointer LISTS per word (one row per position,
    * integer micro-nat scores — exact argmax; `list_min` over the argmax
    * set = the smallest back-pointer, the expression's tie rule), the
    * walk pass rebuilds the segmentation from the back-pointers. Ends in
    * `ulmagg(doc_id, toks)`. */
  private def ulmAggCte: String = {
    val p = Unigram.FixedEnglishPieces
    val piecesSql = sqlList(p.pieces)
    val scoresSql = p.scores.map(s => s"CAST($s AS BIGINT)")
      .mkString("[", ",", "]")
    val ml = p.pieces.map(_.length).max
    val stepScore = s"""dp[j + 1] + $scoresSql[list_position($piecesSql,
      |          substr(word, j + 1, i + 1 - j))]""".stripMargin
    s"""w0 AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word,
      |         generate_subscripts(regexp_split_to_array(lower(text), '\\s+'), 1) AS widx
      |  FROM documents),
      |words AS (SELECT doc_id, widx, word FROM w0 WHERE word <> ''),
      |vrec(doc_id, widx, word, i, dp, bp) AS (
      |  SELECT doc_id, widx, word, 0, [CAST(0 AS BIGINT)], [0] FROM words
      |  UNION ALL
      |  SELECT doc_id, widx, word, i + 1,
      |    list_append(dp, bs),
      |    list_append(bp, coalesce(list_min(list_filter(
      |      range(greatest(0, i + 1 - $ml), i + 1), j ->
      |        $stepScore = bs)), 0))
      |  FROM (
      |    SELECT *, list_max(list_transform(
      |      range(greatest(0, i + 1 - $ml), i + 1), j ->
      |        $stepScore)) AS bs
      |    FROM vrec WHERE i < length(word)) t),
      |vfin AS (SELECT doc_id, widx, word, dp, bp FROM vrec WHERE i = length(word)),
      |vwalk(doc_id, widx, word, bp, pos, toks) AS (
      |  SELECT doc_id, widx, word, bp, length(word), CAST([] AS VARCHAR[])
      |  FROM vfin WHERE dp[length(word) + 1] IS NOT NULL
      |  UNION ALL
      |  SELECT doc_id, widx, word, bp, bp[pos + 1],
      |    list_prepend(substr(word, bp[pos + 1] + 1, pos - bp[pos + 1]), toks)
      |  FROM vwalk WHERE pos > 0),
      |vseg AS (
      |  SELECT doc_id, widx, toks FROM vwalk WHERE pos = 0
      |  UNION ALL
      |  SELECT doc_id, widx, ['${p.unk}'] FROM vfin WHERE dp[length(word) + 1] IS NULL),
      |ulmagg AS (SELECT doc_id, flatten(list(toks ORDER BY widx)) AS toks
      |  FROM vseg GROUP BY doc_id)""".stripMargin
  }

  def queries: Seq[QueryDef] = Seq(

    // WordPiece greedy longest-match tokenization (fixed vocabulary —
    // the fitted path is spec-checked). One codegen'd expression pass in
    // Spark; the oracle replays the identical greedy walk recursively.
    QueryDef("q_text_wordpiece",
      (s, dir) => WordPiece.tokenize(Tables.load(s, dir, "documents"),
          "text", "doc_id", WordPiece.FixedEnglishVocab)
        .select(col("doc_id"), col("n_wp_tokens"), col("wp_text")),
      Some(s"""WITH RECURSIVE $wpAggCte
              |SELECT d.doc_id,
              |  CAST(coalesce(len(a.toks), 0) AS BIGINT) AS n_wp_tokens,
              |  coalesce(array_to_string(a.toks, ' '), '') AS wp_text
              |FROM documents d LEFT JOIN wpagg a USING (doc_id)""".stripMargin)),

    // Unigram-LM Viterbi tokenization (fixed integer-scored pieces).
    QueryDef("q_text_unigram",
      (s, dir) => Unigram.tokenize(Tables.load(s, dir, "documents"),
          "text", "doc_id", Unigram.FixedEnglishPieces)
        .select(col("doc_id"), col("n_ulm_tokens"), col("ulm_text")),
      Some(s"""WITH RECURSIVE $ulmAggCte
              |SELECT d.doc_id,
              |  CAST(coalesce(len(a.toks), 0) AS BIGINT) AS n_ulm_tokens,
              |  coalesce(array_to_string(a.toks, ' '), '') AS ulm_text
              |FROM documents d LEFT JOIN ulmagg a USING (doc_id)""".stripMargin)),

    // Per-source WordPiece fertility (subwords/word + unk share) — the
    // vocabulary-fit diagnostic across sources, same role as
    // q_bpe_fertility for the BPE family. The unk share is the signal
    // BPE cannot produce (its replace chain never fails a word).
    QueryDef("q_wp_fertility",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val t = WordPiece.tokensCol(col("text"), WordPiece.FixedEnglishVocab)
        // the same word definition the tokenizers segment by
        val nWords = size(filter(Text.tokens(col("text")),
          w => length(w) > 0)).cast("long")
        docs.select(col("source"), nWords.as("__w"),
            size(t).cast("long").as("__t"),
            size(filter(t, x => x === WordPiece.FixedEnglishVocab.unk))
              .cast("long").as("__u"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("__w")).as("n_words"),
            sum(col("__t")).as("n_wp_tokens"),
            round(sum(col("__t")).cast("double") / sum(col("__w")), 6)
              .as("fertility"),
            round(sum(col("__u")).cast("double") / sum(col("__t")), 6)
              .as("unk_share"))
      },
      Some(s"""WITH RECURSIVE $wpAggCte,
              |f AS (SELECT d.source,
              |    CAST(len(list_filter(regexp_split_to_array(lower(d.text), '\\s+'),
              |      x -> x <> '')) AS BIGINT) AS nw,
              |    CAST(coalesce(len(a.toks), 0) AS BIGINT) AS nt,
              |    CAST(coalesce(len(list_filter(a.toks,
              |      x -> x = '${WordPiece.FixedEnglishVocab.unk}')), 0) AS BIGINT) AS nu
              |  FROM documents d LEFT JOIN wpagg a USING (doc_id))
              |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(nw) AS BIGINT) AS n_words,
              |  CAST(SUM(nt) AS BIGINT) AS n_wp_tokens,
              |  ROUND(SUM(nt) * 1.0 / SUM(nw), 6) AS fertility,
              |  ROUND(SUM(nu) * 1.0 / SUM(nt), 6) AS unk_share
              |FROM f GROUP BY source""".stripMargin)),

    // Context-window chunking budgeted by WORDPIECE counts — proves the
    // third tokenizer feeds the chunk/pack family through the same
    // tokensCol hook as BPE (q_text_chunk_bpe's sibling).
    QueryDef("q_text_chunk_wp",
      (s, dir) => Text.chunk(
        WordPiece.tokenize(Tables.load(s, dir, "documents"),
          "text", "doc_id", WordPiece.FixedEnglishVocab),
        "wp_text", "doc_id", chunkTokens = 40, overlap = 8,
        tokensCol = Some("wp_tokens")),
      Some(s"""WITH RECURSIVE $wpAggCte,
              |t AS (SELECT doc_id, toks AS ts FROM wpagg WHERE len(toks) > 0),
              |n AS (SELECT doc_id, ts,
              |  CASE WHEN len(ts) <= 40 THEN 1 ELSE (len(ts) - 40 + 31) // 32 + 1 END AS nc
              |  FROM t),
              |e AS (SELECT doc_id, ts, unnest(range(nc)) AS ci FROM n),
              |ck AS (SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
              |  CAST(len(list_slice(ts, ci*32 + 1, ci*32 + 40)) AS BIGINT) AS n_tokens,
              |  array_to_string(list_slice(ts, ci*32 + 1, ci*32 + 40), ' ') AS chunk_text
              |FROM e)
              |SELECT doc_id, chunk_idx, n_tokens, chunk_text FROM ck""".stripMargin))
  )
}

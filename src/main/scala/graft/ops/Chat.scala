package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/**
 * Conversation (instruction-data) ingestion: parse JSON turn arrays under
 * an ENFORCED schema, validate role alternation, and render the chat
 * template that SFT training consumes. The instruction-tuning counterpart
 * of the plain-text corpus ops in [[Text]] — multi-turn data arrives as
 * JSON lines of `[{"role": ..., "content": ...}, ...]` and must become
 * flat templated text plus per-conversation quality flags.
 *
 * Everything is `from_json` + array higher-order functions — one narrow
 * codegen'd projection, no shuffle, no UDF; parse failures yield null
 * turns (flagged invalid, never a job failure), the same
 * schema-on-read discipline as [[graft.sources.CorpusIo.readJsonl]].
 */
object Chat {

  /** Enforced turn schema: anything extra in the JSON is dropped, anything
    * missing is null — never inferred. */
  val TurnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parsed turns column (null on malformed JSON). */
  def parseTurns(json: Column): Column = from_json(json, TurnSchema)

  /**
   * Structural validity: parseable, non-empty, and strict user/assistant
   * alternation starting at `user` (the convention OpenAI/ShareGPT-style
   * corpora enforce before templating). Conversations may end on either
   * role — trailing-turn policy is a training-side choice.
   */
  def validTurns(turns: Column): Column = {
    val misplaced = filter(turns, (t, i) =>
      t.getField("role") =!= when(i % 2 === 0, lit("user"))
        .otherwise(lit("assistant")))
    turns.isNotNull && size(turns) > 0 && size(misplaced) === 0
  }

  /** Chat-template rendering: `<|role|>content` per turn, newline-joined.
    * `systemPrompt` (when set) is prepended as a `<|system|>` line. */
  def render(turns: Column, systemPrompt: Option[String] = None): Column = {
    val body = array_join(
      transform(turns, t =>
        concat(lit("<|"), t.getField("role"), lit("|>"), t.getField("content"))),
      "\n")
    systemPrompt match {
      case Some(sys) => concat(lit(s"<|system|>$sys\n"), body)
      case None => body
    }
  }

  /**
   * SFT loss-mask spans: for every ASSISTANT turn, the 0-based half-open
   * character span its CONTENT occupies inside the [[render]]ed
   * `chat_text` — the byte ranges the training loss is computed on (user
   * and system text is context, not target; trainers mask it). Keeping the
   * spans as offsets into the template output — instead of re-rendering
   * per-turn fragments at training time — is what lets the tokenizer run
   * ONCE over `chat_text` with char-to-token alignment.
   *
   * Offsets are pure integer arithmetic over the template: segment i
   * starts at `prefix + Σ_{j<i} len(seg_j) + i` (one `\n` separator per
   * preceding turn), and the content starts after the `<|role|>` header.
   * The prefix sums are computed INSIDE the row (`slice` + `aggregate`
   * over the per-turn length array — conversations are short, so the
   * interpreted fold is nanoseconds) — no explode-then-window shuffle;
   * the only row multiplication is the final per-assistant-turn
   * `posexplode`. Offsets count CODEPOINTS (Spark/DuckDB `length`
   * semantics), matching `substring` on both engines.
   *
   * Output: (id, turn_idx, span_start, span_end), one row per assistant
   * turn of every VALID conversation ([[validTurns]] gate).
   */
  def lossMaskSpans(df: DataFrame, jsonCol: String, idCol: String,
      systemPrompt: Option[String] = None): DataFrame = {
    val turns = parseTurns(col(jsonCol))
    // codePointCount, not String#length: Spark length() counts codepoints
    val pfx = systemPrompt.map { s =>
      val line = s"<|system|>$s\n"
      lit(line.codePointCount(0, line.length).toLong)
    }.getOrElse(lit(0L))
    val segLens = transform(turns, t =>
      (length(t.getField("role")) + length(t.getField("content")) + 4).cast("long"))
    val base = df
      .filter(validTurns(turns))
      .select(col(idCol), pfx.as("_pfx"), segLens.as("_lens"),
        posexplode(turns).as(Seq("turn_idx", "turn")))
    val priorLen = coalesce(
      aggregate(slice(col("_lens"), lit(1), col("turn_idx")), lit(0L), (a, x) => a + x),
      lit(0L))
    val segStart = col("_pfx") + priorLen + col("turn_idx")
    val contentStart = segStart + length(col("turn.role")) + lit(4)
    base
      .filter(col("turn.role") === "assistant")
      .select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
        contentStart.cast("long").as("span_start"),
        (contentStart + length(col("turn.content"))).cast("long").as("span_end"))
  }

  /**
   * TOKEN-level SFT spans: for every turn of every valid conversation,
   * the half-open token range its segment (`<|role|>content`) occupies in
   * the concatenated token sequence, plus the `is_target` flag trainers
   * turn into the loss mask. This is the deliverable trainers actually
   * consume — [[lossMaskSpans]]'s CHAR spans require char-to-token
   * alignment at training time; tokenizing per segment and prefix-summing
   * the counts (the standard SFT collator contract) removes that step.
   *
   * `tokenCount` maps a segment text column to its token count — defaults
   * to non-empty whitespace tokens; pass
   * `c => Bpe.tokenCountCol(c, merges)` for real subword budgets. Counts
   * are defined SEGMENT-WISE (each turn tokenized independently, like
   * per-turn `tokenizer(text).input_ids` concatenation); a tokenizer run
   * over the joined template may merge across boundaries — that variant
   * is exactly what [[lossMaskSpans]]'s char offsets support.
   *
   * Same row-local prefix-sum shape as [[lossMaskSpans]]: `aggregate`
   * over a `slice` of the per-turn count array, one `posexplode`, no
   * window, no shuffle.
   *
   * Output: (id, turn_idx, role, token_start, token_end, is_target), one
   * row per turn (all roles — trainers need the full segmentation);
   * `systemPrompt` tokens (when set) shift every span right.
   */
  def sftTokenSpans(df: DataFrame, jsonCol: String, idCol: String,
      systemPrompt: Option[String] = None,
      tokenCount: Column => Column = whitespaceTokenCount): DataFrame = {
    val turns = parseTurns(col(jsonCol))
    val seg = (t: Column) =>
      concat(lit("<|"), t.getField("role"), lit("|>"), t.getField("content"))
    val sysTok = systemPrompt
      .map(s => tokenCount(lit(s"<|system|>$s")).cast("long"))
      .getOrElse(lit(0L))
    val cnts = transform(turns, t => tokenCount(seg(t)).cast("long"))
    val base = df
      .filter(validTurns(turns))
      .select(col(idCol), sysTok.as("_sys"), cnts.as("_cnts"),
        posexplode(turns).as(Seq("turn_idx", "turn")))
    val prior = coalesce(
      aggregate(slice(col("_cnts"), lit(1), col("turn_idx")), lit(0L), (a, x) => a + x),
      lit(0L))
    val start = col("_sys") + prior
    base.select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
      col("turn.role").as("role"),
      start.as("token_start"),
      (start + element_at(col("_cnts"), col("turn_idx") + 1)).as("token_end"),
      (col("turn.role") === "assistant").as("is_target"))
  }

  /** Default segment tokenizer: non-empty whitespace tokens of the
    * lowercased text ([[Text.tokens]] with the blank-segment gate). */
  def whitespaceTokenCount(c: Column): Column =
    size(filter(split(lower(c), "\\s+", -1), t => length(t) > 0)).cast("long")

  /**
   * Char-span → token-span alignment: map 0-based half-open CHARACTER
   * spans over `textCol` (the [[lossMaskSpans]] output, or any char-level
   * annotation — PII hits, keyword tags) to TOKEN coordinates under a
   * given tokenizer, so char-level annotations survive subword
   * tokenization (the alignment step [[lossMaskSpans]]'s scaladoc
   * promises; pass `c => Bpe.tokenCountCol(c, merges)` for real subword
   * coordinates).
   *
   * Prefix-count construction (the classic offset-mapping fallback):
   *   token_end   = tokenCount(text[0, end))            — any token
   *                 overlapping the span's last char is included;
   *   token_start = tokenCount(text[0, start)) − 1 if `start` falls
   *                 mid-token (non-whitespace on both sides), else
   *                 tokenCount(text[0, start)).
   * The result is CONSERVATIVE: the token range always covers every
   * span character; a span edge inside a token extends to include that
   * whole token (round start down, round end up — what practical
   * aligners do). For BPE the mid-token test is still the whitespace
   * boundary (a BPE token never crosses whitespace): a span edge inside
   * a WORD aligns via the prefix's own BPE, which can shift the boundary
   * by at most one subword — document-stable and engine-replayable,
   * which is what lets the oracle hash-check the whole table.
   *
   * One narrow codegen'd projection (two substrings + two token counts
   * per row), no shuffle, no join — alignment streams.
   *
   * Output: the input row + (token_start, token_end).
   */
  def alignCharSpansToTokens(df: DataFrame, textCol: String,
      startCol: String = "span_start", endCol: String = "span_end",
      tokenCount: Column => Column = whitespaceTokenCount): DataFrame = {
    val s = col(startCol).cast("int")
    val e = col(endCol).cast("int")
    val text = col(textCol)
    // Column.substr is codepoint-based like length(); positions are 1-based
    val prefixS = text.substr(lit(1), s)
    val prefixE = text.substr(lit(1), e)
    val prevCh = text.substr(s, lit(1))       // char at index start-1
    val curCh = text.substr(s + 1, lit(1))    // char at index start
    val midToken = (s > 0) && prevCh.rlike("^\\S$") && curCh.rlike("^\\S$")
    df.withColumn("token_start",
        (tokenCount(prefixS) - when(midToken, 1L).otherwise(0L)).cast("long"))
      .withColumn("token_end", tokenCount(prefixE).cast("long"))
  }

  /**
   * Preference-pair construction for DPO/RLHF-style training: given
   * multiple scored candidate completions per prompt, emit one
   * (chosen, rejected) pair per prompt — chosen = highest score,
   * rejected = lowest, deterministic (score ties break on id; max takes
   * the LOWER id, min the HIGHER, so a 2-candidate tie still yields
   * chosen ≠ rejected). Prompts with a single candidate, or where best
   * and worst collapse to the same row, are dropped; `minMargin` prunes
   * weak-signal pairs (margin = chosen - rejected score).
   *
   * One groupBy on the prompt key (max_by/min_by over (score, id)
   * structs — map-side partial agg); no window, no self-join.
   *
   * Output: (prompt key, chosen_id, rejected_id, chosen_score,
   * rejected_score, margin).
   */
  def preferencePairs(df: DataFrame, promptCol: String, idCol: String,
      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    val sc = col(scoreCol).cast("double")
    // lexicographic struct order: score first, then id — negated id inside
    // the max makes the min id win score ties (and vice versa for min)
    val best = max(struct(sc.as("s"), (-col(idCol).cast("double")).as("negid"),
      col(idCol).as("id"))).as("__b")
    val worst = min(struct(sc.as("s"), (-col(idCol).cast("double")).as("negid"),
      col(idCol).as("id"))).as("__w")
    df.groupBy(col(promptCol))
      .agg(best, worst, count(lit(1)).as("__n"))
      .filter(col("__n") >= 2 && col("__b.id") =!= col("__w.id"))
      .withColumn("margin", round(col("__b.s") - col("__w.s"), 6))
      .filter(col("margin") >= minMargin)
      .select(col(promptCol), col("__b.id").as("chosen_id"),
        col("__w.id").as("rejected_id"),
        col("__b.s").as("chosen_score"), col("__w.s").as("rejected_score"),
        col("margin"))
  }

  /**
   * Full ingestion pass: (id, n_turns, valid, chat_text). Invalid or
   * malformed conversations keep their row (n_turns 0 for unparseable)
   * so the drop decision — and its rate — stays observable downstream.
   */
  def flatten(df: DataFrame, jsonCol: String, idCol: String,
      systemPrompt: Option[String] = None): DataFrame = {
    val turns = parseTurns(col(jsonCol))
    df.select(col(idCol),
      coalesce(size(turns), lit(0)).cast("long").as("n_turns"),
      validTurns(turns).as("valid"),
      coalesce(render(turns, systemPrompt), lit("")).as("chat_text"))
  }
}

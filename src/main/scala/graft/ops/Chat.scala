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

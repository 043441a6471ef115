package graft

import org.apache.spark.sql.functions._
import graft.ops.Chat

/** Conversation ingestion: enforced-schema parse, alternation validity,
  * template rendering, malformed-JSON quarantine semantics. */
class ChatSpec extends SparkSpec {
  import spark.implicits._

  private def flat(rows: Seq[(Long, String)], sys: Option[String] = None) =
    Chat.flatten(rows.toDF("id", "js"), "js", "id", sys)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getString(3)))).toMap

  test("valid alternating conversation flattens to the template") {
    val js = """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]"""
    val r = flat(Seq((1L, js)))(1L)
    assert(r == ((2L, true, "<|user|>hi\n<|assistant|>hello")))
  }

  test("system prompt is prepended when configured") {
    val js = """[{"role":"user","content":"hi"}]"""
    val r = flat(Seq((1L, js)), sys = Some("be helpful"))(1L)
    assert(r._3 == "<|system|>be helpful\n<|user|>hi")
  }

  test("assistant-first, repeated-role, and empty conversations are invalid") {
    val byId = flat(Seq(
      (1L, """[{"role":"assistant","content":"x"},{"role":"user","content":"y"}]"""),
      (2L, """[{"role":"user","content":"x"},{"role":"user","content":"y"}]"""),
      (3L, """[]""")))
    assert(!byId(1L)._2 && !byId(2L)._2 && !byId(3L)._2)
    assert(byId(1L)._1 == 2L && byId(3L)._1 == 0L)
  }

  test("malformed JSON keeps its row: zero turns, invalid, empty text") {
    val r = flat(Seq((9L, """{"not": "an array""")))(9L)
    assert(r == ((0L, false, "")))
  }

  test("extra JSON fields are dropped by the enforced schema") {
    val js = """[{"role":"user","content":"hi","meta":{"x":1}}]"""
    val r = flat(Seq((1L, js)))(1L)
    assert(r == ((1L, true, "<|user|>hi")))
  }

  test("loss-mask spans substring to exactly the assistant contents; user turns uncovered") {
    import spark.implicits._
    val js = """[{"role":"user","content":"what is two plus two"},""" +
      """{"role":"assistant","content":"four"},""" +
      """{"role":"user","content":"and times three?"},""" +
      """{"role":"assistant","content":"twelve, obviously"}]"""
    val df = Seq((1L, js)).toDF("id", "conv")
    val rendered = graft.ops.Chat.flatten(df, "conv", "id")
      .collect().head.getString(3)
    val spans = graft.ops.Chat.lossMaskSpans(df, "conv", "id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.map(_._1).toSeq == Seq(1L, 3L))
    val texts = spans.map { case (_, a, b) => rendered.substring(a.toInt, b.toInt) }
    assert(texts.toSeq == Seq("four", "twelve, obviously"))
    // nothing outside the spans contains assistant content markers
    val masked = spans.foldLeft(rendered) { case (s, (_, a, b)) =>
      s.substring(0, a.toInt) + "#" * (b - a).toInt + s.substring(b.toInt) }
    assert(!masked.contains("four") && !masked.contains("twelve"))
  }

  test("loss-mask spans account for a system prompt prefix") {
    import spark.implicits._
    val js = """[{"role":"user","content":"hi"},{"role":"assistant","content":"hello"}]"""
    val df = Seq((1L, js)).toDF("id", "conv")
    val sys = Some("be helpful")
    val rendered = graft.ops.Chat.flatten(df, "conv", "id", sys)
      .collect().head.getString(3)
    val Array((a, b)) = graft.ops.Chat.lossMaskSpans(df, "conv", "id", sys)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(rendered.substring(a.toInt, b.toInt) == "hello")
  }

  test("invalid conversations emit no spans") {
    import spark.implicits._
    val df = Seq(
      (1L, """[{"role":"assistant","content":"x"}]"""),
      (2L, """not json""")).toDF("id", "conv")
    assert(graft.ops.Chat.lossMaskSpans(df, "conv", "id").count() == 0L)
  }

  test("sftTokenSpans: contiguous cover, segment-wise counts, assistant targets") {
    import spark.implicits._
    val js = """[{"role":"user","content":"what is two plus two"},""" +
      """{"role":"assistant","content":"it is four"},""" +
      """{"role":"user","content":"thanks a lot"},""" +
      """{"role":"assistant","content":"welcome"}]"""
    val df = Seq((1L, js)).toDF("id", "conv")
    val rows = Chat.sftTokenSpans(df, "conv", "id", Some("be brief"))
      .orderBy("turn_idx").collect()
    assert(rows.length == 4)
    // spans tile contiguously after the system-prompt offset
    val sysTok = 2L // "<|system|>be" "brief" — header glues to first word
    assert(rows.head.getLong(3) == sysTok)
    for (i <- 1 until rows.length)
      assert(rows(i).getLong(3) == rows(i - 1).getLong(4),
        s"gap between turn ${i - 1} and $i")
    // each width equals the whitespace token count of "<|role|>content"
    val widths = rows.map(r => r.getLong(4) - r.getLong(3)).toSeq
    assert(widths == Seq(5L, 3L, 3L, 1L))
    // is_target marks exactly the assistant turns
    assert(rows.map(_.getBoolean(5)).toSeq == Seq(false, true, false, true))
    assert(rows.map(_.getString(2)).toSeq ==
      Seq("user", "assistant", "user", "assistant"))
  }

  test("sftTokenSpans under BPE counts: widths equal Bpe.encode segment lengths") {
    import spark.implicits._
    import graft.ops.Bpe
    val js = """[{"role":"user","content":"the thing hereof"},""" +
      """{"role":"assistant","content":"another then"}]"""
    val df = Seq((1L, js)).toDF("id", "conv")
    val rows = Chat.sftTokenSpans(df, "conv", "id",
        tokenCount = c => Bpe.tokenCountCol(c, Bpe.FixedEnglishMerges))
      .orderBy("turn_idx").collect()
    val segs = Seq("<|user|>the thing hereof", "<|assistant|>another then")
    val want = segs.map(s => Bpe.encode(s, Bpe.FixedEnglishMerges).length.toLong)
    assert(rows.map(r => r.getLong(4) - r.getLong(3)).toSeq == want)
    assert(rows.head.getLong(3) == 0L &&
      rows(1).getLong(3) == rows.head.getLong(4))
  }

  test("alignCharSpansToTokens: boundary spans exact, mid-token edges round outward") {
    val df = Seq(
      // span over "world": boundary-aligned -> tokens [1, 2)
      (1L, "hello world foo", 6L, 11L),
      // span [2,4) inside the first word -> rounds down to cover token 0
      (2L, "abcdef ghi", 2L, 4L),
      // span starting right after a space: prev char is whitespace -> exact
      (3L, "foo bar", 4L, 7L),
      // span from position 0
      (4L, "one two", 0L, 3L),
      // span crossing a token boundary mid-word on both edges:
      // "aa bbbb cc", [4,9) touches tokens 1 and 2 -> [1, 3)
      (5L, "aa bbbb cc", 4L, 9L)
    ).toDF("id", "text", "span_start", "span_end")
    val out = Chat.alignCharSpansToTokens(df, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((1L, 2L)))
    assert(out(2L) == ((0L, 1L)))
    assert(out(3L) == ((1L, 2L)))
    assert(out(4L) == ((0L, 1L)))
    assert(out(5L) == ((1L, 3L)))
    // conservativeness under BPE: the token range always covers the span —
    // re-rendering the covered tokens must contain every span character
    import graft.ops.Bpe
    val bpe = Chat.alignCharSpansToTokens(df, "text",
        tokenCount = c => Bpe.tokenCountCol(c, Bpe.FixedEnglishMerges))
      .collect()
    bpe.foreach { r =>
      val toks = Bpe.encode(r.getString(1), Bpe.FixedEnglishMerges)
      val (ts, te) = (r.getLong(4), r.getLong(5))
      assert(ts >= 0 && te <= toks.length && ts < te,
        s"id ${r.getLong(0)}: token range [$ts,$te) out of [0,${toks.length})")
    }
  }
}

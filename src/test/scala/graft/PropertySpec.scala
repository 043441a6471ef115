package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Dedup, Text, Urls}

/**
 * Randomized-input properties: ScalaCheck generators build one adversarial
 * batch per property (odd whitespace, empty tokens, unicode, degenerate
 * sizes), a SINGLE Spark pass evaluates the operator over the whole batch,
 * and a plain-Scala reference implementation checks every row. One job per
 * property keeps the randomized coverage at spec cost.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling: scalacheck Gen pinned to a fixed seed so CI
    * never flakes; bump the seed to re-roll the corpus deliberately. */
  private def sample[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(0xC0FFEEL + i)))

  private val wordGen: Gen[String] =
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const("the"),
      Gen.const("a1"), Gen.const("..."), Gen.const("#"))
  private val wsGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(12, wordGen)
    seps <- Gen.listOfN(12, wsGen)
    lead <- Gen.oneOf("", " ", "\t")
  } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString

  test("property: truncateMiddle matches the per-row reference on adversarial whitespace") {
    val texts = sample(textGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = Text.truncateMiddle(df, "t", "id", 3, 2).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.split("\\s+", -1).filter(_.nonEmpty).toSeq
      val n = toks.length
      val expect =
        if (n > 5) (toks.take(3) ++ Seq("...") ++ toks.takeRight(2)).mkString(" ")
        else toks.mkString(" ")
      val (txt, gn, dropped, flag) = got(i.toLong)
      assert(txt == expect, s"row $i: '$t' -> '$txt' want '$expect'")
      assert(gn == n && dropped == math.max(0, n - 5) && flag == (n > 5))
    }
  }

  test("property: hostSuffixes + blocklistFlag match the reference suffix chain") {
    val labelGen = Gen.oneOf("a", "bb", "spam", "x9", "sub")
    val hostGen = for {
      k <- Gen.choose(1, 5)
      parts <- Gen.listOfN(k, labelGen)
      up <- Gen.oneOf(identity[String] _, (s: String) => s.toUpperCase)
    } yield up(parts.mkString("."))
    val hosts = sample(hostGen, 150).distinct
    val entries = Seq("spam.a", "bb", "sub.spam")
    val df = hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val got = Urls.blocklistFlag(df, "host", entries).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(2)), r.getBoolean(3)))).toMap
    hosts.zipWithIndex.foreach { case (h, i) =>
      val parts = h.toLowerCase.split("\\.", -1).toSeq
      val chain = parts.indices.map(j => parts.drop(j).mkString("."))
      val expect = chain.find(entries.contains)
      assert(got(i.toLong) == ((expect, expect.isDefined)),
        s"host '$h': got ${got(i.toLong)}, want ($expect)")
    }
  }

  test("property: lshPlan always factorizes k and picks the closest midpoint") {
    val cases = sample(Gen.zip(Gen.choose(1, 256), Gen.choose(0.01, 0.99)), 200)
    cases.foreach { case (k, tau) =>
      val p = Dedup.lshPlan(k, tau)
      assert(p.bands * p.rowsPerBand == k, s"k=$k tau=$tau: ${p.bands}x${p.rowsPerBand}")
      assert(p.threshold > 0 && p.threshold <= 1)
      assert(p.pCollideAtTau >= 0 && p.pCollideAtTau <= 1)
      // no other factorization lands closer to tau
      val best = (1 to k).filter(k % _ == 0)
        .map(r => math.abs(math.pow(1.0 / (k / r), 1.0 / r) - tau)).min
      assert(math.abs(p.threshold - tau) <= best + 1e-12)
    }
  }

  test("property: hashSplit labels are exhaustive, deterministic, and fraction-plausible") {
    val ids = sample(Gen.choose(0L, 1000000L), 400).distinct
    val df = ids.toDF("id")
    val fracs = Seq("train" -> 0.7, "dev" -> 0.2, "test" -> 0.1)
    val out = Text.hashSplit(df, "id", fracs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.toSet.subsetOf(Set("train", "dev", "test")))
    // content-derived: a second run is identical
    val again = Text.hashSplit(df, "id", fracs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
    // plausibility, not exactness: the md5 split of ~400 ids should put
    // the majority in train and not starve test entirely at these sizes
    val n = out.size.toDouble
    assert(out.values.count(_ == "train") / n > 0.55)
    assert(out.values.count(_ == "test") > 0)
  }

  test("property: winnowFingerprints equals the per-row reference on random corpora") {
    def refWinnow(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val g = toks.length - (k - 1)
      if (g < 1) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(8), 16)
      }
      val hs = (0 until g).map(i => h(toks.slice(i, i + k).mkString(" ")))
      val we = math.min(w, g)
      (0 to g - we).map { p =>
        val win = hs.slice(p, p + we)
        val minv = win.min
        ((p + win.lastIndexOf(minv) + 1).toLong, minv) // rightmost min
      }.toSet
    }
    val texts = sample(textGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for ((k, w) <- Seq((4, 4), (2, 3), (1, 1))) {
      val got = Text.winnowFingerprints(df, "t", "id", k, w).collect()
        .groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet }
      texts.zipWithIndex.foreach { case (t, i) =>
        val want = refWinnow(t, k, w)
        assert(got.getOrElse(i.toLong, Set.empty) == want,
          s"k=$k w=$w row $i '$t': ${got.getOrElse(i.toLong, Set.empty)} != $want")
      }
    }
  }

  test("property: normText is idempotent and whitespace-insensitive") {
    val texts = sample(textGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val once = df.select(col("id"), Dedup.normText("t").as("n1"))
    val twice = once.select(col("id"), col("n1"),
      trim(regexp_replace(lower(col("n1")), "\\s+", " ")).as("n2"))
    val rows = twice.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows.values.forall { case (n1, n2) => n1 == n2 }, "normText not idempotent")
    // collapsing any run of whitespace to one space reaches the same form
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = t.toLowerCase.replaceAll("\\s+", " ").trim
      val got = rows(i.toLong)._1
      assert(got == ref, s"'$t': '$got' != '$ref'")
    }
  }

  test("property: chunkSentences matches the per-row greedy reference") {
    val sentGen: Gen[String] = for {
      n <- Gen.choose(1, 9)
      ws <- Gen.listOfN(n, Gen.alphaLowerStr.map(w => if (w.isEmpty) "x" else w.take(5)))
      t <- Gen.oneOf(".", "!", "?", "", "...", ".?")
    } yield ws.mkString(" ") + t
    val docGen: Gen[String] = for {
      ss <- Gen.listOfN(6, sentGen)
      sep <- Gen.oneOf(" ", "  ", " \n ")
    } yield ss.mkString(sep)
    def ref(text: String, budget: Int): Seq[(Long, Long, String)] = {
      // space-only trim — Spark/DuckDB `trim` semantics, NOT Java .trim
      def trimSp(s: String) =
        s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
      val sents = "[^.!?]+[.!?]*".r.findAllIn(text)
        .map(trimSp).filter(_.nonEmpty).toSeq
      def tc(s: String) = s.split("\\s+").count(_.nonEmpty)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
      var cur = ""; var tok = 0
      sents.foreach { s =>
        val n = tc(s)
        if (tok > 0 && tok + n > budget) { chunks += cur; cur = s; tok = n }
        else { cur = if (tok == 0) s else cur + " " + s; tok += n }
      }
      if (tok > 0) chunks += cur
      chunks.zipWithIndex.map { case (c, i) => (i.toLong, tc(c).toLong, c) }.toSeq
    }
    val texts = sample(docGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = Text.chunkSentences(df, "t", "id", maxTokens = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = ref(t, 8)
      want.foreach { case (ci, n, c) =>
        assert(got.get((i.toLong, ci)).contains((n, c)),
          s"row $i chunk $ci: got ${got.get((i.toLong, ci))} want ($n, '$c')")
      }
      assert(got.keys.count(_._1 == i.toLong) == want.size)
    }
  }

  test("property: repetition_stats matches the per-row reference on random multi-line texts") {
    // multi-line texts with DELIBERATE repetition: lines drawn from a
    // small pool (collisions guaranteed), single/double newlines mixed
    val lineGen: Gen[String] = Gen.oneOf(
      Gen.listOfN(4, wordGen).map(_.mkString(" ")),
      Gen.const("buy now buy now"), Gen.const("the end"), Gen.const("  "))
    val docGen: Gen[String] = for {
      lines <- Gen.listOfN(8, lineGen)
      seps <- Gen.listOfN(8, Gen.oneOf("\n", "\n\n", "\n\n\n"))
    } yield lines.zip(seps).map { case (l, s) => l + s }.mkString

    def trimWs(s: String): String = {
      val cs = " \t\n\r\f"
      var a = 0; var b = s.length
      while (a < b && cs.indexOf(s.charAt(a)) >= 0) a += 1
      while (b > a && cs.indexOf(s.charAt(b - 1)) >= 0) b -= 1
      s.substring(a, b)
    }
    def dupRef(elems: Seq[String]): (Long, Long, Long) = {
      val c = elems.groupBy(identity).view.mapValues(_.size)
      (elems.size.toLong,
        c.values.filter(_ > 1).map(_ - 1).sum.toLong,
        c.collect { case (e, n) if n > 1 => (n - 1).toLong * e.length }.sum)
    }
    def ref(text: String): Seq[Long] = {
      val lines = text.split("\n").map(trimWs).filter(_.nonEmpty).toSeq
      val paras = text.split("\n{2,}").map(trimWs).filter(_.nonEmpty).toSeq
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      def grams(n: Int) = words.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      def top(n: Int): Long = {
        val c = grams(n).groupBy(identity).view.mapValues(_.size)
        if (c.isEmpty) 0L
        else {
          val (g, k) = c.toSeq.minBy { case (g2, k2) => (-k2, g2) }
          if (k >= 2) k.toLong * g.length else 0L
        }
      }
      def dupTot(n: Int): (Long, Long) = {
        val c = grams(n).groupBy(identity).view.mapValues(_.size)
        (c.collect { case (g, k) if k > 1 => k.toLong * g.length }.sum,
          c.map { case (g, k) => k.toLong * g.length }.sum)
      }
      val (ln, ld, lc) = dupRef(lines)
      val (pn, pd, pc) = dupRef(paras)
      val dt = (5 to 10).map(dupTot)
      Seq(ln, ld, lc, pn, pd, pc, top(2), top(3), top(4)) ++
        dt.map(_._1) ++ dt.map(_._2)
    }
    val texts = sample(docGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"),
        graft.functions.RepetitionStats.stats(col("t")).as("rs"))
      .collect().map(r => r.getLong(0) ->
        r.getStruct(1).toSeq.map(_.asInstanceOf[Long])).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"row $i: '${t.take(60)}...'")
    }
  }
}

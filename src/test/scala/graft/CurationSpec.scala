package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize
import graft.ops.{ChunkBoundary, Dedup, Fuzzy, Text, Urls}

/** Invariant specs for the web-corpus curation operators (normalization,
  * markup strip, fuzzy consolidation, URL canonicalization, length
  * batching) on tiny inline data. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("nfc_normalize composes combining marks, fast-path on ASCII, null-safe") {
    val df = Seq(
      (1L, "café"),          // e + combining acute -> precomposed
      (2L, "plain ascii"),
      (3L, "é already nfc"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "s")
    val out = df.select(col("id"), NfcNormalize.nfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café")
    assert(out(2L) == "plain ascii")
    assert(out(3L) == "é already nfc")
    assert(out(4L) == null)
  }

  test("normalizeText folds controls/NBSP and collapses whitespace") {
    val df = Seq((1L, "a\tb c\ne  café  ")).toDF("doc_id", "text")
    val r = Text.normalizeText(df, "text", "doc_id").collect().head
    assert(r.getString(1) == "a b c e café")
    assert(r.getLong(2) == "a b c e café".length.toLong)
  }

  test("stripMarkup drops script wholesale, strips tags, unescapes entities") {
    val html = "<html><p class=\"x\">Hello <b>world</b></p>" +
      "<script>var a = 1 < 2;</script><!-- c -->&amp;amp; &lt;x&gt; &#39;q&#39;</html>"
    val df = Seq((1L, html)).toDF("doc_id", "text")
    val r = Text.stripMarkup(df, "text", "doc_id").collect().head
    // &amp;amp; must single-unescape to &amp; (amp done last), script TEXT gone
    assert(r.getString(1) == "Hello world &amp; <x> 'q'")
    assert(!r.getString(1).contains("var a"))
  }

  test("fuzzyPairs equals the naive quadratic join (length blocking is lossless)") {
    val names = Seq("red plate", "red plates", "hot plate", "hot ring",
      "cold ring", "old ring", "zzz", "completely different").map(Tuple1(_))
      .toDF("name")
    val blocked = Fuzzy.fuzzyPairs(names, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val vals = names.as[String].collect().distinct
    val naive = (for {
      a <- vals; b <- vals if a < b
      d = {
        // reference Levenshtein DP
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length).toLong
      } if d <= 2
    } yield (a, b, d)).toSet
    assert(blocked == naive)
    assert(blocked.nonEmpty)
  }

  test("canonicalize maps every value; clusters share the min name; singletons self-map") {
    val names = Seq("red ring", "red rings", "red ringz", "solo value").map(Tuple1(_))
      .toDF("name")
    val m = Fuzzy.canonicalize(names, "name", maxDist = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.keySet == Set("red ring", "red rings", "red ringz", "solo value"))
    assert(m("red ring") == "red ring" && m("red rings") == "red ring"
      && m("red ringz") == "red ring")
    assert(m("solo value") == "solo value")
  }

  test("url parse + canonicalize: tracking params dropped, fragment dropped, empty path -> /") {
    val df = Seq(
      (1L, "https://WWW.Example.ORG/a/b?utm_source=x&id=3&ref=z#frag"),
      (2L, "http://example.com?utm_campaign=c"),
      (3L, "https://sub.example.co/path?a=1&b=2")
    ).toDF("id", "url")
    val out = Urls.canonicalize(Urls.parse(df, "url"), "url")
      .select("id", "host", "domain", "tld", "path", "canonical_url")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5))).toMap
    assert(out(1L) == (("www.example.org", "example.org", "org", "/a/b",
      "https://www.example.org/a/b?id=3")))
    assert(out(2L) == (("example.com", "example.com", "com", "",
      "http://example.com/")))
    assert(out(3L) == (("sub.example.co", "sub.example.co", "co", "/path",
      "https://sub.example.co/path?a=1&b=2")))
  }

  test("groupOverlap: known shared shingles between sources, disjoint pair absent") {
    val df = Seq(
      (1L, "a b c d e", "s1"),
      (2L, "a b c x y", "s2"),   // shares shingle "a b c" with s1
      (3L, "p q r s t", "s3")    // disjoint from both
    ).toDF("doc_id", "text", "source")
    val m = Dedup.groupOverlap(df, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // s1: {abc,bcd,cde}, s2: {abc,bcx,cxy} -> 1 shared of 5 union
    assert(m(("s1", "s2")) == ((1L, 0.2)))
    assert(!m.contains(("s1", "s3")) && !m.contains(("s2", "s3")))
  }

  test("groupOverlapSketch estimates track the exact overlap on the documents table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = Dedup.groupOverlap(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val est = Dedup.groupOverlapSketch(docs, "text", "source", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(est.nonEmpty)
    est.foreach { case (pair, (szA, szB, estShared)) =>
      val exactShared = exact.getOrElse(pair, 0L)
      val union = szA + szB - exactShared
      // inclusion-exclusion error is bounded by the HLL union error (~1%
      // at lgK=14); allow 5% of the union to be safe on small sets
      assert(math.abs(estShared - exactShared) <= math.max(5L, union / 20),
        s"$pair: est $estShared vs exact $exactShared (union $union)")
    }
  }

  test("group-preserving split: every domain lands in exactly one split") {
    val df = Seq(
      (1L, "https://a.com/x"), (2L, "https://a.com/y"), (3L, "https://a.com/z"),
      (4L, "https://b.org/x"), (5L, "https://b.org/y"), (6L, "https://c.net/x")
    ).toDF("doc_id", "url")
    val out = Text.hashSplit(Urls.parse(df, "url"), "domain",
      Seq("train" -> 0.5, "test" -> 0.5))
      .select("domain", "split").collect()
    val byDomain = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(byDomain.values.forall(_.size == 1))
  }

  test("lengthBatches: batch sizes bounded, totals preserved, waste non-negative") {
    val docs = (1L to 100L).map(i => (i, ("w " * (i % 37 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = Text.lengthBatches(docs, "text", "doc_id", batchSize = 8, bucketWidth = 10)
      .collect()
    assert(out.map(_.getLong(2)).sum == 100L)            // every doc in exactly one batch
    assert(out.forall(_.getLong(2) <= 8L))               // batch size bound
    assert(out.forall(r => r.getLong(5) >= 0L))          // pad_waste >= 0
    // within a bucket, max_tokens stays inside the bucket's token range
    assert(out.forall(r => r.getLong(3) / 10 == r.getLong(0)))
    // waste identity: n_docs*max == sum + waste
    assert(out.forall(r => r.getLong(2) * r.getLong(3) == r.getLong(4) + r.getLong(5)))
  }

  test("blocklist: suffix chain blocks domain+subdomains, most-specific wins, join form agrees") {
    val df = Seq(
      (1L, "a.b.spam.com"),      // matched by both entries; b.spam.com is more specific
      (2L, "spam.com"),          // exact entry match
      (3L, "ok.example.org"),    // clean
      (4L, "Bad.Example.ORG"),   // case-insensitive match
      (5L, "notspam.com")        // suffixes are label-aligned, NOT substrings
    ).toDF("id", "host")
    val entries = Seq("spam.com", "b.spam.com", "bad.example.org")
    val out = Urls.blocklistFlag(df, "host", entries).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(out(1L) == ((Some("b.spam.com"), true)))
    assert(out(2L) == ((Some("spam.com"), true)))
    assert(out(3L) == ((None, false)))
    assert(out(4L) == ((Some("bad.example.org"), true)))
    assert(out(5L) == ((None, false)))
    // the large-blocklist join form keeps exactly the unflagged rows
    val bl = entries.toDF("entry")
    val kept = Urls.blocklistFilter(df, "host", "id", bl)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 5L))
    // non-broadcast fallback produces the identical survivor set
    val keptShuffle = Urls.blocklistFilter(df, "host", "id", bl,
      hintBroadcast = false).collect().map(_.getLong(0)).toSet
    assert(keptShuffle == kept)
  }

  test("blocklist: null host (URL parse failure) — flag is false, both forms keep the row") {
    val df = Seq((1L, "spam.com"), (2L, null.asInstanceOf[String]), (3L, "ok.org"))
      .toDF("id", "host")
    val entries = Seq("spam.com")
    val flagged = Urls.blocklistFlag(df, "host", entries)
    val byId = flagged.collect()
      .map(r => r.getLong(0) -> (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(byId(2L) == ((None, false)), "null host must flag blocked=false, not NULL")
    // the documented gate pattern must keep the null-host row
    val gateKept = flagged.filter(!col("blocked")).collect().map(_.getLong(0)).toSet
    assert(gateKept == Set(2L, 3L))
    // and agree with the join form on the survivor set
    val joinKept = Urls.blocklistFilter(df, "host", "id", entries.toDF("entry"))
      .collect().map(_.getLong(0)).toSet
    assert(joinKept == gateKept)
  }

  test("main-content extraction: link-dense chrome cut, body kept, densities exact") {
    val html = "<html><body>" +
      "<nav><a href=\"/\">Home page link</a> <a href=\"/b\">About page</a></nav>" +
      "<div>this paragraph is the long main body of the page and it easily clears the gate</div>" +
      "<p>short</p>" +
      "<p>another long body paragraph with one <b>inline</b> <a href=\"/x\">tiny link</a> kept anyway</p>" +
      "<footer><a href=\"/t\">All rights reserved by us</a></footer></body></html>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val blocks = Text.mainContentBlocks(df, "html", "doc_id").collect()
      .map(r => r.getLong(1) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4), r.getString(5))).toMap
    // nav: text = anchors only -> density 1.0, dropped
    assert(blocks(1L)._2 == 1.0 && !blocks(1L)._3)
    // main div: zero links, long -> kept
    assert(blocks(2L)._2 == 0.0 && blocks(2L)._3)
    // short <p>: density 0 but under minChars -> dropped
    assert(blocks(3L)._1 == 5L && !blocks(3L)._3)
    // body <p> with one small anchor: low density -> kept
    assert(blocks(4L)._3 && blocks(4L)._2 < 0.5)
    // footer: anchor dominates -> dropped
    assert(!blocks(5L)._3)
    val main = Text.extractMainContent(df, "html", "doc_id").collect().head
    assert(main.getString(1) ==
      blocks(2L)._4 + "\n\n" + blocks(4L)._4)
    assert(main.getLong(2) == 5L && main.getLong(3) == 2L)
  }

  test("gopherRepetition: hand-computed line/paragraph/n-gram repetition signals") {
    val docs = Seq(
      // lines [aa bb, aa bb, cc]: 1 dup line (5 chars) over len-14 text;
      // top 2-gram 'aa bb' x2 (10 chars); single 5-gram -> no dup5
      (1L, "aa bb\naa bb\ncc"),
      // paragraphs [x y, x y, z]: 1 dup paragraph (3 chars) over len 11
      (2L, "x y\n\nx y\n\nz"),
      // a 10-gram repeated twice: every dup{5..10} signal fires
      (3L, "one two three four five six seven eight nine ten " +
        "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val out = Text.gopherRepetition(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    def d(r: org.apache.spark.sql.Row, f: String) = r.getDouble(r.fieldIndex(f))
    val a = out(1L)
    assert(a.getLong(a.fieldIndex("n_lines")) == 3L)
    assert(d(a, "dup_line_frac") == 0.333333)
    assert(d(a, "dup_line_char_frac") == 0.357143)
    assert(d(a, "top2_char_frac") == 0.714286)
    assert(d(a, "top3_char_frac") == 0.0)
    assert(d(a, "dup5_char_frac") == 0.0)
    assert(!a.getBoolean(a.fieldIndex("keep")), "dup line + top2 must reject")
    val b = out(2L)
    assert(b.getLong(b.fieldIndex("n_paras")) == 3L)
    assert(d(b, "dup_para_frac") == 0.333333)
    assert(d(b, "dup_para_char_frac") == 0.272727)
    val c = out(3L)
    (5 to 10).foreach(n => assert(d(c, s"dup${n}_char_frac") > 0.0, s"n=$n"))
    assert(!c.getBoolean(c.fieldIndex("keep")))
  }

  test("scrubCards: Luhn-valid numbers redact, lookalikes survive and count as rejected") {
    val docs = Seq(
      (1L, "pay 4111111111111111 or 4012-8888-8888-1881 today"),
      (2L, "order 1234-5678-9012-3456 shipped"), // card-shaped, Luhn-fails
      (3L, "call 555-123-4567 x89"), // 10 digits: below candidate floor
      (4L, "amex 378282246310005 fine"), // 15-digit valid
      (5L, "nothing numeric here")
    ).toDF("doc_id", "text")
    val out = Text.scrubCards(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("pay <CARD> or <CARD> today", 2L, 0L)))
    assert(out(2L) == (("order 1234-5678-9012-3456 shipped", 0L, 1L)),
      "checksum-failing candidate survives and is reported")
    assert(out(3L) == (("call 555-123-4567 x89", 0L, 0L)),
      "a 10-digit phone never becomes a candidate")
    assert(out(4L) == (("amex <CARD> fine", 1L, 0L)))
    assert(out(5L) == (("nothing numeric here", 0L, 0L)))
  }

  test("dropKnownChunks: known chunks cut, fresh text survives, within-batch repeats drop") {
    // seed scaled FAR past any position index: streams from different
    // seeds must not be shifted copies of each other (seed + i alone
    // would make them overlap — and content-defined chunking would,
    // correctly, dedup the overlap)
    def rndText(seed: Long, n: Int): String = (1 to n).map { i =>
      var z = (seed * 1000003L + i) * 0x9E3779B97F4A7C15L
      z ^= (z >>> 31); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 27)
      val r = java.lang.Long.remainderUnsigned(z, 27)
      if (r == 26) ' ' else ('a' + r).toChar
    }.mkString
    val corpusText = rndText(11L, 800)
    val freshText = rndText(99L, 800)
    val corpus = Seq((1L, corpusText)).toDF("doc_id", "text")
    val index = Dedup.contentChunkHashIndex(corpus, "text")
    // batch: an exact re-ingest of the corpus doc, a fresh doc, and a
    // second copy of the fresh doc (within-batch repeat)
    val batch = Seq((10L, corpusText), (11L, freshText), (12L, freshText))
      .toDF("doc_id", "text")
    val out = Dedup.dropKnownChunks(batch, "text", "doc_id", index)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L)._1 == "" && out(10L)._2 == out(10L)._3,
      "a re-ingested doc loses every chunk")
    assert(out(11L) == ((freshText, out(11L)._2, 0L)),
      "fresh text passes through byte-identical")
    assert(out(12L)._1 == "" && out(12L)._3 == out(12L)._2,
      "the within-batch second copy drops fully")
    // surviving ranges stitch back losslessly: cutting nothing = identity
    val none = Dedup.dropKnownChunks(batch,
      "text", "doc_id", index.limit(0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(none(10L) == corpusText && none(11L) == freshText)
  }

  test("domainQualityGate: farms block, good sites survive a bad page, thin evidence exempts") {
    val docs = Seq(
      // spam.farm: 3 uniformly poor pages -> blocked
      (1L, "spam.farm", 0.1), (2L, "spam.farm", 0.2), (3L, "SPAM.FARM", 0.15),
      // good.site: one bad page among good ones -> mean holds, not blocked
      (4L, "good.site", 0.9), (5L, "good.site", 0.95), (6L, "good.site", 0.1),
      // tiny.site: 2 poor pages but below the evidence floor -> exempt
      (7L, "tiny.site", 0.05), (8L, "tiny.site", 0.1)
    ).toDF("doc_id", "host", "score")
    val out = Urls.domainQualityGate(docs, "host", "score",
        minDocs = 3, minMeanScore = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("domain_n_docs"), r.getAs[Boolean]("domain_blocked")))).toMap
    assert(out.size == 8, "every input row survives with a verdict")
    assert(Seq(1L, 2L, 3L).forall(out(_) == ((3L, true))),
      "case-folded host members aggregate together and block")
    assert(Seq(4L, 5L, 6L).forall(out(_) == ((3L, false))))
    assert(Seq(7L, 8L).forall(out(_) == ((2L, false))))
  }

  test("content-defined chunking: chunks tile the doc; edits re-sync; variants agree on shape") {
    // deterministic pseudo-random text (splitmix mixing, lowercase+space)
    def rndText(seed: Long, n: Int): String = (1 to n).map { i =>
      var z = (seed + i) * 0x9E3779B97F4A7C15L
      z ^= (z >>> 31); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 27)
      val r = java.lang.Long.remainderUnsigned(z, 27)
      if (r == 26) ' ' else ('a' + r).toChar
    }.mkString
    val base = rndText(7L, 1200)
    val edited = base.substring(0, 50) + "XYZZY" + base.substring(50)
    val docs = Seq((1L, base), (2L, edited), (3L, "tiny"), (4L, ""))
      .toDF("doc_id", "text")
    for (fast <- Seq(false, true)) {
      val ch = Dedup.contentChunks(docs, "text", "doc_id", window = 16,
        fastHash = fast).collect()
        .groupBy(_.getLong(0)).map { case (d, rs) =>
          d -> rs.sortBy(_.getLong(1)) }
      // tiling: starts begin at 1, each next start = prev end + 1,
      // lengths sum to the doc length
      for ((d, txt) <- Seq(1L -> base, 2L -> edited, 3L -> "tiny")) {
        val rows = ch(d)
        assert(rows.head.getLong(2) == 1L, s"fast=$fast doc $d start")
        assert(rows.map(_.getLong(3)).sum == txt.length, s"fast=$fast doc $d len")
        rows.sliding(2).foreach {
          case Array(a, b) =>
            assert(b.getLong(2) == a.getLong(2) + a.getLong(3))
          case _ =>
        }
      }
      assert(!ch.contains(4L), "empty doc emits no chunks")
      assert(ch(3L).length == 1, "short doc is one whole chunk")
      // insertion robustness: the 5-char insert at position 50 disturbs
      // only the chunks it touches — boundaries re-sync after it, so
      // most chunk hashes are SHARED between the two versions (offset
      // or fixed-width chunking would share none past the edit)
      val h1 = ch(1L).map(_.getString(4)).toSet
      val h2 = ch(2L).map(_.getString(4)).toSet
      val shared = (h1 & h2).size
      assert(shared >= h1.size / 2,
        s"fast=$fast: only $shared of ${h1.size} chunks survived a 5-char insert")
      assert(h1 != h2, "the edited chunk itself must differ")
    }
    // the md5 and xxhash64 boundary families chunk DIFFERENTLY (expected)
    // but both feed the same dup machinery: stats rows exist per doc
    val st = Dedup.contentChunkStats(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st.keySet == Set(1L, 2L, 3L))

    // GEAR production family: same tiling + re-sync contract, and the
    // expression agrees with a direct Scala reference of the gear rule
    val gch = Dedup.contentChunksGear(docs, "text", "doc_id")
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.sortBy(_.getLong(1)) }
    for ((d, txt) <- Seq(1L -> base, 2L -> edited, 3L -> "tiny")) {
      val rows = gch(d)
      assert(rows.head.getLong(2) == 1L)
      assert(rows.map(_.getLong(3)).sum == txt.length, s"gear doc $d tiling")
    }
    val g1 = gch(1L).map(_.getString(4)).toSet
    val g2 = gch(2L).map(_.getString(4)).toSet
    assert((g1 & g2).size >= g1.size / 2 && g1 != g2,
      s"gear re-sync: ${(g1 & g2).size} of ${g1.size} shared")
    // reference replay of the boundary rule on the base doc
    val gear = {
      val t = Array.tabulate(256) { i =>
        var z = (i + 1) * 0x9E3779B97F4A7C15L
        z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
        z ^= (z >>> 27); z *= 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      var h = 0L
      val bs = scala.collection.mutable.ArrayBuffer[Int]()
      for (i <- 0 until base.length - 1) {
        h = (h << 1) + t(base.charAt(i) & 0xff)
        if (i + 1 >= 16 && (h & 63L) == 0L) bs += (i + 1)
      }
      bs.toSeq
    }
    val wantStarts = (1 +: gear.map(_ + 1)).map(_.toLong)
    assert(gch(1L).map(_.getLong(2)).toSeq == wantStarts,
      "expression boundaries equal the reference gear scan")
    // registered as a SQL function through the extensions
    graft.GraftExtensions.register(spark)
    docs.createOrReplaceTempView("gear_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, gear_boundaries(text, 16, 6) AS b FROM gear_docs WHERE doc_id = 1")
      .collect().head.getSeq[Int](1)
    assert(viaSql.map(_.toLong + 1) == wantStarts.drop(1),
      "SQL-registered expression matches")
  }

  test("gear-fed chunk dedup family: dups/stats match a reference recomputation; incremental cut works") {
    def rndText(seed: Long, n: Int): String = (1 to n).map { i =>
      var z = (seed * 1000003L + i) * 0x9E3779B97F4A7C15L
      z ^= (z >>> 31); z *= 0xBF58476D1CE4E5B9L; z ^= (z >>> 27)
      val r = java.lang.Long.remainderUnsigned(z, 27)
      if (r == 26) ' ' else ('a' + r).toChar
    }.mkString
    val gear = ChunkBoundary.Gear(16, 6)
    // boilerplate-seeded corpus: every even doc shares the same block
    val boiler = rndText(5L, 400)
    val docs = (1L to 8L).map(d => d ->
      (rndText(d * 17L, 600) + (if (d % 2 == 0) boiler else ""))).toDF("doc_id", "text")

    // parity: the operators' join/agg machinery over gear boundaries
    // equals a straight Scala recomputation from the gear chunk table
    val table = Dedup.contentChunks(docs, "text", "doc_id", gear).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val canon = table.groupBy(_._5).map { case (h, rs) =>
      h -> rs.map(r => (r._1, r._2)).min }
    val wantDups = table.map { case (d, i, _, len, h) =>
      val (cd, ci) = canon(h)
      (d, i, len, h, cd != d || ci != i, cd, ci)
    }.toSet
    val gotDups = Dedup.contentChunkDups(docs, "text", "doc_id", gear).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6))).toSet
    assert(gotDups == wantDups, "contentChunkDups(gear) parity")
    assert(wantDups.exists(_._5), "fixture must contain gear-grain dups")

    val wantStats = wantDups.toSeq.groupBy(_._1).map { case (d, rs) =>
      val dupChars = rs.filter(_._5).map(_._3).sum
      (d, rs.size.toLong, rs.count(_._5).toLong, dupChars,
        math.round(dupChars.toDouble / rs.map(_._3).sum * 1e6) / 1e6)
    }.toSet
    val gotStats = Dedup.contentChunkStats(docs, "text", "doc_id", gear).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(gotStats == wantStats, "contentChunkStats(gear) parity")

    // incremental: index the corpus, re-ingest one corpus doc + one fresh
    val index = Dedup.contentChunkHashIndex(docs, "text", gear)
    val fresh = rndText(999L, 600)
    val batch = Seq((100L, rndText(2L * 17L, 600) + boiler), (101L, fresh))
      .toDF("doc_id", "text") // doc 100 = corpus doc 2's exact text
    val cut = Dedup.dropKnownChunks(batch, "text", "doc_id", index, gear)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cut(100L)._1 == "" && cut(100L)._2 == cut(100L)._3,
      "a re-ingested doc loses every gear chunk")
    assert(cut(101L) == ((fresh, cut(101L)._2, 0L)),
      "fresh text passes through byte-identical under gear boundaries")
    // Bloom twin: inserted chunks always cut (no false negatives on the
    // known side); the re-ingested doc therefore empties here too
    val bcut = Dedup.dropKnownChunksBloom(batch, "text", "doc_id", index,
        gear, 0L, 0.01)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bcut(100L) == "", "bloom cut drops every indexed gear chunk")
  }

  test("paragraph dedup: cross-doc canonical pick, normalization, and cut") {
    val docs = Seq(
      (1L, "p1\n\nshared\n\np2"),
      (2L, "shared\n\nunique"),
      (3L, "SHARED\n\n  shared  ") // normalization folds case + padding
    ).toDF("doc_id", "text")
    val v = Dedup.paragraphDups(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(3), r.getLong(4), r.getLong(5))).toMap
    assert(v((1L, 2L)) == ((false, 1L, 2L)), "first occurrence is canonical")
    assert(v((2L, 1L)) == ((true, 1L, 2L)))
    assert(v((3L, 1L)) == ((true, 1L, 2L)), "case-folded copy is a dup")
    assert(v((3L, 2L)) == ((true, 1L, 2L)), "padded copy is a dup")
    assert(v((2L, 2L))._1 == false)
    val cut = Dedup.dropDuplicateParagraphs(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(cut(1L) == (("p1\n\nshared\n\np2", 3L, 0L)))
    assert(cut(2L) == (("unique", 2L, 1L)))
    assert(cut(3L) == (("", 2L, 2L)), "a doc can lose every paragraph")
  }

  test("incremental paragraph cut: index hits + within-batch repeats; Bloom form skips batch repeats") {
    val corpus = Seq((0L, "known para")).toDF("doc_id", "text")
    val index = Dedup.paragraphHashIndex(corpus, "text")
    val batch = Seq(
      (10L, "Known  Para\n\nnovel\n\nrepeat\n\nrepeat"), // case/space-folded index hit
      (11L, "repeat")                                    // within-batch dup of (10, 3)
    ).toDF("doc_id", "text")
    val exact = Dedup.dropKnownParagraphs(batch, "text", "doc_id", index)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(exact(10L) == (("novel\n\nrepeat", 2L)), "index hit + batch dup cut")
    assert(exact(11L) == (("", 1L)), "non-canonical batch copy cut")
    // Bloom form: index hits only (row-local, no cross-row state)
    val bloom = Dedup.dropKnownParagraphsBloom(batch, "text", "doc_id", index,
        expectedItems = 8, fpp = 0.001)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(bloom(10L) == (("novel\n\nrepeat\n\nrepeat", 1L)))
    assert(bloom(11L) == (("repeat", 0L)), "within-batch repeat kept by design")
  }

  test("paragraph cut is idempotent and leaves zero cross-doc duplicates") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .limit(60)
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0, lit("\n\nrepeated footer block"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("\n\nanother shared notice"))
          .otherwise(lit(""))))
    val once = Dedup.dropDuplicateParagraphs(docs, "text", "doc_id")
    // after the cut, every surviving paragraph content is unique corpus-wide
    val residual = Dedup.paragraphDups(once, "clean_text", "doc_id")
      .filter(col("is_dup")).count()
    assert(residual == 0L, s"cut must leave no duplicate paragraphs, got $residual")
    // and a second cut is a no-op
    val twice = Dedup.dropDuplicateParagraphs(once, "clean_text", "doc_id")
      .select(col("doc_id"), col("clean_text"))
    val first = once.select(col("doc_id"), col("clean_text"))
    assert(twice.except(first).isEmpty && first.except(twice).isEmpty)
    // token mass never grows
    val before = docs.select(sum(length(col("text")))).head.getLong(0)
    val after = once.select(sum(length(col("clean_text")))).head.getLong(0)
    assert(after <= before)
  }

  test("repetition_stats: exact dup/top numerators and lexicographic tie-break") {
    val txt = "one two three four five six seven eight nine ten " +
      "one two three four five six seven eight nine ten"
    val df = Seq((1L, txt)).toDF("id", "text")
    val r = df.select(graft.functions.RepetitionStats.stats(col("text")).as("rs"))
      .select(col("rs.dup10_chars"), col("rs.top2_chars"), col("rs.n_lines"))
      .collect().head
    // the 48-char 10-gram occurs twice -> 96; nine 2-grams tie at count 2,
    // 'eight nine' (10 chars) is the lexicographic winner -> 20
    assert(r.getLong(0) == 96L)
    assert(r.getLong(1) == 20L)
    assert(r.getLong(2) == 1L)
  }

  test("mojibake table entries ARE the cp1252 rendering of their target's UTF-8 bytes") {
    Text.MojibakeTable.foreach { case (bad, good) =>
      val rendered = new String(
        good.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
      assert(rendered == bad, s"'$good' cp1252-renders as '$rendered', table has '$bad'")
    }
  }

  test("fixMojibake repairs a cp1252 double-encode round trip; clean text untouched") {
    val original = "don’t — “élite”… © 2024 «10°»"
    // the table covers every artifact the corruption produces EXCEPT the
    // closing ” (its UTF-8 maps through cp1252's undefined 0x9D)
    val corrupted = new String(
      original.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    val df = Seq((1L, corrupted), (2L, "plain ascii text"),
      (3L, "already clean é’—")).toDF("doc_id", "text")
    val got = Text.fixMojibake(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    val (fixed, nArt, changed) = got(1L)
    assert(changed && nArt >= 8L)
    // every table-covered character is restored
    Seq("don’t", "—", "“élite", "…", "©", "«10°»").foreach { frag =>
      assert(fixed.contains(frag), s"missing '$frag' in '$fixed'")
    }
    assert(got(2L) == (("plain ascii text", 0L, false)))
    // already-correct unicode passes through unrepaired and unflagged
    assert(got(3L) == (("already clean é’—", 0L, false)))
  }

  test("scriptProfile: hand-computed counts, tie precedence, empty text") {
    val df = Seq(
      (1L, "hello мир 你好 123"),    // latin 5, cyr 3, cjk 2, digit 3
      (2L, "ab аб"),                 // latin 2, cyrillic 2 -> tie: latin wins
      (3L, ""),                      // empty -> ratios 0, majority other
      (4L, "!!! ???")                // no class matches -> other
    ).toDF("doc_id", "text")
    val got = Text.scriptProfile(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_chars") == 13L)
    assert(r1.getAs[Long]("n_latin") == 5L)
    assert(r1.getAs[Long]("n_cyrillic") == 3L)
    assert(r1.getAs[Long]("n_cjk") == 2L)
    assert(r1.getAs[Long]("n_digit") == 3L)
    assert(r1.getAs[String]("majority") == "latin")
    assert(math.abs(r1.getAs[Double]("latin_ratio") - 5.0 / 13) < 1e-6)
    assert(got(2L).getAs[String]("majority") == "latin") // precedence on tie
    assert(got(3L).getAs[String]("majority") == "other")
    assert(got(3L).getAs[Double]("latin_ratio") == 0.0)
    assert(got(4L).getAs[String]("majority") == "other")
  }
}

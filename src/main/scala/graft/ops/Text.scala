package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Text-analysis operators for LLM training-data pipelines (SURVEY.md §7.5):
 * tokenization, quality scoring, language ID, fingerprinting, simhash.
 *
 * All pure Catalyst expressions (no UDFs) so they stay inside whole-stage
 * codegen and scale linearly with input splits — at 100 TB these run as a
 * single narrow projection pass over the corpus, no shuffle.
 *
 * Hash primitives are built on md5 only, which is bit-identical across
 * engines (used by the DuckDB oracles and any future cross-engine checks).
 */
object Text {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Tiny English-ish stopword list for ratio features (heuristic, not NLP). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /**
   * Token statistics: counts, distinct counts, average token length.
   * The basis of quality filtering in C4/RefinedWeb-style pipelines.
   */
  def tokenStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = tokens(col(textCol))
    // token-length sum == chars left after deleting every \s+ run from the
    // lowercased text (identical by construction: the tokens ARE those
    // runs' complements, and a leading empty token contributes length 0).
    // One codegen'd regexp pass instead of the interpreted
    // aggregate(transform(...)) HOF fold that ran the lambda interpreter
    // per token (~µs/element — the finding that motivated WordShingles).
    val tokenLenSum = length(regexp_replace(lower(col(textCol)), "\\s+", ""))
    df.select(col(idCol),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      round(tokenLenSum.cast("double") / size(t), 6).as("avg_token_len"))
  }

  /**
   * Context-window chunking for LLM training prep: split each document
   * into windows of `chunkTokens` whitespace tokens with `overlap` tokens
   * shared between consecutive windows (stride = chunkTokens − overlap).
   * The standard pre-tokenizer packing step — a 100 TB corpus becomes the
   * chunk table that tokenization/packing consumes.
   *
   * Output: (id, chunk_idx, n_tokens, chunk_text), one row per window;
   * the last window keeps whatever remains (may be shorter). Documents
   * with no tokens yield no rows — empty/whitespace-only text under the
   * default tokenizer (gated on `trim(text)` being non-empty, because
   * `split("\\s+")` of blank text yields `[""]`, size 1), or an empty
   * array under `tokensCol`. Windows per doc:
   * `1 + ceil((len − chunkTokens) / stride)` for len > chunkTokens, else 1
   * — integer arithmetic, so the DuckDB oracle reproduces it exactly.
   *
   * `tokensCol`: optional pre-tokenized `array<string>` column (a real
   * tokenizer's output) that replaces the whitespace split — window
   * boundaries then follow the actual tokenizer, making the operator
   * drop-in for training prep; with the column equal to the whitespace
   * split the output is identical (spec-checked).
   *
   * Scale shape: one codegen'd projection (split once, `sequence` +
   * `explode` for the 1→W fan-out, `slice`/`array_join` per window) — no
   * shuffle, no UDF; fan-out is bounded by len/stride per doc. Chunks of
   * a document stay in its input partition, so a downstream
   * `repartition` decides distribution policy, not this operator.
   */
  def chunk(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int = 0,
      tokensCol: Option[String] = None): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens >= 1 and 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokensCol.map(col).getOrElse(tokens(col(textCol)))
    val lenT = size(toks)
    // zero-token gate: the default tokenizer's split("\s+") maps blank text
    // to [""] (size 1), so gate on the text itself; a custom tokensCol
    // carries an honest size
    val nonEmpty = tokensCol.map(c => size(col(c)) > 0)
      .getOrElse(length(trim(col(textCol))) > 0)
    // ceil((len - chunk) / stride) + 1 in pure integer arithmetic
    // (Column `/` is double division — floor().cast is the exact quotient
    // for these positive operands)
    val nChunks = when(lenT <= chunkTokens, lit(1))
      .otherwise(floor((lenT - chunkTokens + stride - 1) / stride).cast("int") + 1)
    df.filter(nonEmpty)
      .select(col(idCol), toks.as("__toks"), nChunks.as("__n"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__n") - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens)).as("__w"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__w")).cast("long").as("n_tokens"),
        array_join(col("__w"), " ").as("chunk_text"))
  }

  /**
   * Sentence-boundary chunking — the [[chunk]] variant real pipelines
   * use for RAG/training prep when windows must not cut mid-sentence:
   * split each document into sentences (maximal runs of
   * non-terminators plus their trailing `.!?` run, trimmed), then
   * greedily pack CONSECUTIVE sentences into chunks of at most
   * `maxTokens` whitespace tokens. A single sentence over the budget
   * becomes its own (overflowing) chunk rather than being cut — the
   * [[packChunks]] contract. Documents with no sentences yield no rows.
   *
   * Output: (id, chunk_idx, n_tokens, chunk_text), chunk_idx 0-based,
   * sentences joined with one space.
   *
   * Scale shape: UNLIKE [[packChunks]] (a per-doc fold after a doc-keyed
   * exchange), the greedy fold here runs INSIDE the row over the doc's
   * own sentence array (`aggregate` with a (done, cur, tok) struct
   * accumulator) — no shuffle at all, and the DuckDB oracle replays the
   * identical left fold with `list_reduce`.
   */
  def chunkSentences(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    val raw = regexp_extract_all(col(textCol), lit("[^.!?]+[.!?]*"), lit(0))
    val sents = filter(transform(raw, s => trim(s)), s => s =!= lit(""))
    def tc(s: Column): Column = size(filter(split(s, "\\s+"), t => t =!= lit("")))
    val init = struct(array().cast("array<string>").as("done"),
      lit("").as("cur"), lit(0).as("tok"))
    val folded = aggregate(sents, init,
      (a, s) => {
        val stc = tc(s)
        when(a.getField("tok") > 0 && a.getField("tok") + stc > maxTokens,
          struct(concat(a.getField("done"), array(a.getField("cur"))).as("done"),
            s.as("cur"), stc.as("tok")))
        .otherwise(struct(a.getField("done").as("done"),
          when(a.getField("tok") === 0, s)
            .otherwise(concat_ws(" ", a.getField("cur"), s)).as("cur"),
          (a.getField("tok") + stc).as("tok")))
      },
      a => when(a.getField("tok") > 0,
        concat(a.getField("done"), array(a.getField("cur"))))
        .otherwise(a.getField("done")))
    df.select(col(idCol), posexplode(folded).as(Seq("__i", "chunk_text")))
      .select(col(idCol), col("__i").cast("long").as("chunk_idx"),
        tc(col("chunk_text")).cast("long").as("n_tokens"), col("chunk_text"))
  }

  /**
   * Greedy sequence packing, the step after [[chunk]]: concatenate a
   * document's chunks in order into packs of at most `maxTokens` tokens
   * (start a new pack when the next chunk would overflow). Doc-scoped by
   * design — packs never span documents, which keeps the operator a
   * deterministic per-key fold (the cross-document packing some trainers
   * use trades that determinism for fill ratio; compose it downstream if
   * wanted). A chunk longer than `maxTokens` becomes its own (overflowing)
   * pack rather than being silently truncated.
   *
   * `tokenCountCol` (default `n_tokens`, the [[chunk]] output): the column
   * whose counts drive pack boundaries — point it at a real tokenizer's
   * token counts and the packs respect the actual training budget.
   *
   * Output: (id, pack_idx, n_chunks, n_tokens, pack_text). The id column
   * keeps its NATIVE type — long surrogate keys and string UUIDs/URLs
   * both pass through unchanged (the fold compares ids by value, never
   * casts), so real corpora need no pre-mapping. Scale shape:
   * one exchange hash-keyed on the doc id (the same entity-keyed shuffle
   * shape as the featurizer) + a per-partition SPILLABLE sort on
   * (doc, chunk_idx), then a streaming fold — greedy packing is
   * inherently sequential per key, so this is the minimal plan, and task
   * memory is one pack buffer regardless of document size (no per-doc
   * chunk-list materialization: Spark's external sort does the ordering).
   */
  def packChunks(chunks: DataFrame, idCol: String, maxTokens: Int,
      tokenCountCol: String = "n_tokens"): DataFrame = {
    require(maxTokens >= 1)
    val idField = chunks.schema(idCol)
    val outSchema = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField("pack_idx", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("pack_text", StringType, nullable = false)))
    chunks
      .select(col(idCol).as("__doc"), col("chunk_idx").cast("long").as("__ci"),
        col(tokenCountCol).cast("long").as("__t"), col("chunk_text").as("__txt"))
      .repartition(col("__doc"))
      .sortWithinPartitions("__doc", "__ci")
      .mapPartitions { it =>
        // streaming fold over the sorted run, resetting at doc boundaries;
        // the None sentinel flushes the final open pack
        var started = false
        var curDoc: Any = null
        var packIdx = 0L; var nChunks = 0L; var nToks = 0L
        val sb = new StringBuilder
        def emit(): Option[Row] =
          if (nChunks > 0) {
            val r = Row(curDoc, packIdx, nChunks, nToks, sb.result())
            packIdx += 1; nChunks = 0; nToks = 0; sb.clear()
            Some(r)
          } else None
        (it.map(Option(_)) ++ Iterator(None)).flatMap {
          case None => emit().iterator
          case Some(row) =>
            val d = row.get(0); val t = row.getLong(2); val txt = row.getString(3)
            val flushed =
              if (!started || d != curDoc) {
                val e = emit(); packIdx = 0L; curDoc = d; started = true; e
              }
              else if (nChunks > 0 && nToks + t > maxTokens) emit()
              else None
            if (nChunks > 0) sb.append(' ')
            sb.append(txt); nChunks += 1; nToks += t
            flushed.iterator
        }
      }(Encoders.row(outSchema))
  }

  /**
   * Cross-document pack ASSIGNMENTS: one output row per input chunk with
   * its (bucket, pack_idx, token_offset) — the coordinates trainers need
   * to remap per-example annotations (loss spans, boundaries, attention
   * segments) into PACKED sequence space, which the aggregated
   * [[packChunksAcrossDocs]] output deliberately collapses. Same
   * deterministic [[docBucket]] salting, same (doc, chunk) fold order,
   * same overflow rule — so assignments and the aggregated packs agree
   * row-for-row.
   *
   * Output: (id, chunk_idx, bucket, pack_idx, token_offset, n_tokens).
   * Scale shape: ONE bucket-keyed exchange + per-partition sort +
   * constant-memory streaming fold (no aggregation at all — the fold
   * emits as it walks).
   */
  def packAssignments(chunks: DataFrame, idCol: String, maxTokens: Int,
      nBuckets: Int, tokenCountCol: String = "n_tokens"): DataFrame = {
    require(maxTokens >= 1 && nBuckets >= 1)
    val idField = chunks.schema(idCol)
    val outSchema = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField("chunk_idx", LongType, nullable = false),
      StructField("bucket", LongType, nullable = false),
      StructField("pack_idx", LongType, nullable = false),
      StructField("token_offset", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false)))
    chunks
      .select(col(idCol).as("__doc"), col("chunk_idx").cast("long").as("__ci"),
        col(tokenCountCol).cast("long").as("__t"),
        docBucket(col(idCol), nBuckets).as("__b"))
      .repartition(col("__b"))
      .sortWithinPartitions("__b", "__doc", "__ci")
      .mapPartitions { it =>
        var started = false
        var curBucket = -1L
        var packIdx = 0L; var cum = 0L; var nChunks = 0L
        it.map { row =>
          val d = row.get(0); val ci = row.getLong(1)
          val t = row.getLong(2); val b = row.getLong(3)
          // same overflow rule as packChunks' fold (counter, not cum, so a
          // zero-token chunk still occupies its pack slot)
          if (!started || b != curBucket) {
            started = true; curBucket = b; packIdx = 0L; cum = 0L; nChunks = 0L
          } else if (nChunks > 0 && cum + t > maxTokens) {
            packIdx += 1; cum = 0L; nChunks = 0L
          }
          val off = cum
          cum += t; nChunks += 1
          Row(d, ci, b, packIdx, off, t)
        }
      }(Encoders.row(outSchema))
  }

  /** Deterministic doc → bucket assignment for [[packChunksAcrossDocs]]:
    * first 4 hex nibbles of md5(id) mod `nBuckets`. md5 (not xxhash64) so
    * the DuckDB oracle computes the identical bucket. */
  def docBucket(id: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /**
   * Cross-document greedy packing: the fill-ratio path [[packChunks]]'s
   * scaladoc defers. Docs are hashed into `nBuckets` fixed salted buckets
   * ([[docBucket]]); within a bucket, chunks are packed greedily in
   * (doc_id, chunk_idx) order, so packs MAY span documents — lifting fill
   * ratio toward maxTokens (spec-checked against the doc-scoped variant)
   * while staying fully deterministic: bucket assignment and pack order
   * are content-derived, never partition- or arrival-order-derived, so
   * the same recursive-CTE oracle pattern as [[packChunks]] applies.
   *
   * Output: (bucket, pack_idx, n_docs, n_chunks, n_tokens, pack_text).
   *
   * Scale shape: one exchange hash-keyed on the bucket + a per-partition
   * sort, then a STREAMING fold (constant memory: one pack buffer, no
   * per-bucket materialization — same fold as [[packChunks]], keyed on
   * the bucket instead of the doc).
   * `nBuckets` sets the parallelism/fill tradeoff: each bucket is packed
   * sequentially, so choose nBuckets ≳ cluster cores at scale (buckets
   * per task ≈ nBuckets / shuffle partitions; fill loss vs a single
   * global sequence is negligible once buckets hold many docs).
   */
  def packChunksAcrossDocs(chunks: DataFrame, idCol: String, maxTokens: Int,
      nBuckets: Int, tokenCountCol: String = "n_tokens"): DataFrame = {
    require(maxTokens >= 1 && nBuckets >= 1)
    // id-type generic like [[packChunks]]: the doc id orders the fold
    // within a bucket (native-type sort: numeric for longs, binary
    // lexicographic for strings — both deterministic and engine-portable)
    // and feeds the n_docs boundary count; it is never cast.
    val outSchema = StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("pack_idx", LongType, nullable = false),
      StructField("n_docs", LongType, nullable = false),
      StructField("n_chunks", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("pack_text", StringType, nullable = false)))
    chunks
      .select(docBucket(col(idCol), nBuckets).as("bucket"),
        col(idCol).as("__doc"), col("chunk_idx").cast("long").as("__ci"),
        col(tokenCountCol).cast("long").as("__t"), col("chunk_text").as("__txt"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "__doc", "__ci")
      .mapPartitions { it =>
        // streaming fold over the sorted run; a partition may hold several
        // buckets — reset pack numbering at each bucket boundary. The None
        // sentinel flushes the final open pack.
        var curBucket = -1L
        var packIdx = 0L; var nDocs = 0L; var nChunks = 0L; var nToks = 0L
        var lastDoc: Any = null
        var haveDoc = false
        val sb = new StringBuilder
        def emit(): Option[Row] =
          if (nChunks > 0) {
            val r = Row(curBucket, packIdx, nDocs, nChunks, nToks, sb.result())
            packIdx += 1; nDocs = 0; nChunks = 0; nToks = 0
            lastDoc = null; haveDoc = false
            sb.clear()
            Some(r)
          } else None
        (it.map(Option(_)) ++ Iterator(None)).flatMap {
          case None => emit().iterator
          case Some(row) =>
            val b = row.getLong(0); val d = row.get(1)
            val t = row.getLong(3); val txt = row.getString(4)
            val flushed =
              if (b != curBucket) { val e = emit(); packIdx = 0L; curBucket = b; e }
              else if (nChunks > 0 && nToks + t > maxTokens) emit()
              else None
            if (nChunks > 0) sb.append(' ')
            if (!haveDoc || d != lastDoc) { nDocs += 1; lastDoc = d; haveDoc = true }
            sb.append(txt); nChunks += 1; nToks += t
            flushed.iterator
        }
      }(Encoders.row(outSchema))
  }

  /**
   * 64-bit SimHash packed as 4 x 16-bit words (the
   * [[graft.ops.Vectors.binaryCode]] word layout): per token, the first
   * 16 md5 nibbles vote ±1 on 64 bits; positive sums set the bit. The
   * SCALE companion of [[simhash16]]: a 16-bit signature gives each
   * near-dup band only 2⁴ buckets (candidate sets grow quadratically
   * with the corpus), while these bands key on 16 bits = 2¹⁶ buckets —
   * the same corpus-size-independent collision rate as MinHash banding.
   * Same md5-nibble arithmetic, so it replays in SQL and hash-matches.
   */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame =
    // one narrow projection — the exploded 64-vote aggregate this
    // replaces shuffled 64 partial sums per document (see
    // graft.functions.SimHash64; bit-identical, oracle-pinned); the
    // input is core-spread first (identity at corpus scale) so the
    // per-doc hash loop uses the whole machine on small inputs
    graft.core.Spread.toCores(df.filter(col(textCol).isNotNull))
      .select(col(idCol),
        graft.functions.SimHash64.simhash64(tokens(col(textCol))).as("pcode"))

  /**
   * Heaps-law vocabulary growth: cumulative distinct-term count at
   * `nCheckpoints` equal-document checkpoints along the id order, with
   * cumulative token counts — the companion diagnostic to [[zipfStats]]
   * (natural corpora grow vocab ≈ K·Nᵝ, β ≈ 0.5–0.7; a flat curve means
   * templated/repetitive data, a linear one near-random tokens).
   *
   * Exact and engine-replayable: a term's first-occurrence doc is a
   * min-aggregate, so vocab-at-checkpoint is just a count of terms with
   * first_doc <= the checkpoint's max id — no iterative scan. The doc
   * checkpoint assignment is [[graft.ops.Select.ntileBuckets]] — exact
   * SQL NTILE semantics computed by range-partition + per-partition
   * offsets, so the per-DOC token-count table is never funneled through
   * a single global window task (doc grain is billions of rows at
   * corpus scale; the checkpoint and cumulative aggregates after it are
   * checkpoint-grain). Docs with zero non-empty tokens carry no
   * vocabulary and are excluded from the document ordering.
   *
   * Output: (checkpoint, max_doc, cum_docs, cum_tokens, vocab).
   */
  def vocabGrowth(df: DataFrame, textCol: String, idCol: String,
      nCheckpoints: Int = 10): DataFrame = {
    require(nCheckpoints >= 1, "nCheckpoints must be >= 1")
    val ex = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val docTok = ex.groupBy(col(idCol)).agg(count(lit(1)).as("nt"))
    val run = org.apache.spark.sql.expressions.Window.orderBy(col("ck"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = graft.ops.Select.ntileBuckets(docTok, Seq(col(idCol)),
        nCheckpoints, bucketCol = "ck")
      .groupBy(col("ck"))
      .agg(count(lit(1)).as("n_docs"), max(col(idCol)).as("max_doc"),
        sum(col("nt")).as("toks"))
      .withColumn("cum_docs", sum(col("n_docs")).over(run))
      .withColumn("cum_tokens", sum(col("toks")).over(run))
    val fd = ex.distinct().groupBy(col("w")).agg(min(col(idCol)).as("fd"))
    val voc = fd.join(broadcast(cum.select(col("ck"), col("max_doc"))),
        col("fd") <= col("max_doc"))
      .groupBy(col("ck")).agg(count(lit(1)).as("vocab"))
    cum.join(voc, Seq("ck"))
      .select(col("ck").cast("long").as("checkpoint"), col("max_doc"),
        col("cum_docs"), col("cum_tokens"), col("vocab"))
  }

  /**
   * TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) over the
   * corpus: PageRank on the word CO-OCCURRENCE graph (an undirected
   * edge between tokens at distance ≤ `window` within a document), top
   * `topK` words by centrality — the unsupervised keyword ranking that
   * beats raw frequency because a word matters when it co-occurs with
   * OTHER important words (the [[tfidfKeywords]] per-doc scorer's
   * corpus-level graph sibling). Composes two existing surfaces: the
   * edge build here, the fixed-iteration [[graft.ops.Graph.pageRank]]
   * for the centrality.
   *
   * Scale shape: the co-occurrence pairs come from SLICED-ARRAY ZIPS
   * (for each offset k ≤ window, zip the token array against itself
   * shifted by k) — a shuffle-free narrow projection with fanout ≤
   * window per token, never a positional self-join (which would go
   * quadratic per document before its distance filter). Edges then
   * aggregate to the VOCABULARY-sized graph; PageRank's per-iteration
   * cost is |edges|, corpus-size-independent after the one build pass.
   * Distances are measured in non-empty-token space (the whitespace
   * tokenizer's empty fragments are dropped first).
   *
   * Output: (word, rank, rk) for the top `topK` (rank 6 dp, ties by
   * word asc).
   */
  def textrank(df: DataFrame, textCol: String, idCol: String,
      window: Int = 2, iterations: Int = 5, topK: Int = 20,
      checkpointEvery: Int = 1): DataFrame = {
    // checkpointEvery defaults to 1 like the rest of the iterative family
    // (Graph.scala: "checkpoints EVERY iteration by default — default-off
    // proved a footgun"): a caller raising `iterations` must not get
    // unbounded plan depth silently. Fixed-small-iteration callers pass 0
    // explicitly: pageRank's score lineage is LINEAR (each rankᵢ referenced
    // once by rankᵢ₊₁), so a small fixed count unrolls into one declarative
    // plan over the one checkpointed edge table — no per-iteration driver
    // materialization round-trips; shuffle files already persist each
    // iteration's stage output. Pass >= 1 for very deep runs where
    // plan size itself becomes the cost.
    require(window >= 1 && iterations >= 0 && topK >= 1,
      "window, topK >= 1; iterations >= 0")
    val ts = array_remove(tokens(col(textCol)), "")
    // greatest(len − k, 0): a doc shorter than the window must yield an
    // empty slice, not a negative-length error
    val pairs = flatten(transform(sequence(lit(1), lit(window)), k =>
      zip_with(
        slice(col("__ts"), lit(1), greatest(size(col("__ts")) - k, lit(0))),
        slice(col("__ts"), k + lit(1),
          greatest(size(col("__ts")) - k, lit(0))),
        (x, y) => struct(x.as("wa"), y.as("wb")))))
    val co = graft.core.Spread.toCores(df.filter(col(textCol).isNotNull))
      .select(ts.as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(explode(pairs).as("__p"))
      .select(col("__p.wa").as("wa"), col("__p.wb").as("wb"))
      .filter(col("wa") =!= col("wb"))
    // both directions via ONE explode, not a self-union: the union's
    // branches would inline (and EXECUTE — swapped projections defeat
    // exchange reuse, the Graph.symEdges finding) the whole spread +
    // tokenize + sliced-zip chain twice
    val edges = co.select(explode(array(
        struct(col("wa").as("src"), col("wb").as("dst")),
        struct(col("wb").as("src"), col("wa").as("dst")))).as("__d"))
      .select(col("__d.src").as("src"), col("__d.dst").as("dst"))
    val pr = graft.ops.Graph.pageRank(edges, "src", "dst", iterations,
      checkpointEvery = checkpointEvery)
    val wv = org.apache.spark.sql.expressions.Window
      .orderBy(col("rank").desc, col("v").asc)
    pr.withColumn("rk", row_number().over(wv))
      .filter(col("rk") <= topK)
      .select(col("v").as("word"), col("rank"), col("rk"))
  }

  /**
   * Zipf-law fit over the corpus vocabulary: OLS of ln(freq) on
   * ln(rank) for the top `topN` terms (freq desc, term-asc tiebreak).
   * Natural-language corpora slope ≈ −1; a far-off slope is the cheap
   * whole-corpus tell for synthetic/templated/boilerplate-dominated
   * data that per-doc quality scores miss. Output: one row
   * (n_terms, zipf_slope, ln_intercept), rounded 6.
   *
   * Scale shape: the vocabulary aggregate is corpus-wide with map-side
   * combine; the rank window and regression run over the topN-row term
   * table. At 100 TB pre-filter `f >= minFreq` before ranking so the
   * window input stays tiny (the tail never makes the top-N anyway).
   */
  def zipfStats(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 2, "need at least two ranks to fit a slope")
    val tf = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("f").desc, col("w").asc)
    val top = tf.withColumn("r", row_number().over(wr)).filter(col("r") <= topN)
    val x = log(col("r").cast("double"))
    val y = log(col("f").cast("double"))
    val a = top.agg(count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
      sum(x * x).as("sxx"))
    val slope = (col("sxy") - col("sx") * col("sy") / col("n")) /
      (col("sxx") - col("sx") * col("sx") / col("n"))
    a.select(col("n").cast("long").as("n_terms"),
      round(slope, 6).as("zipf_slope"),
      round(col("sy") / col("n") - slope * col("sx") / col("n"), 6)
        .as("ln_intercept"))
  }

  /**
   * Per-document n-gram NOVELTY: the share of a doc's distinct word
   * shingles that appear in no other document (corpus df = 1), plus the
   * mean df of its shingles — the boilerplate/templating diagnostic that
   * complements pairwise dedup: novelty ≈ 1 marks genuinely unique
   * prose, low novelty marks mirror/template content whose shingles are
   * corpus-wide even when no single near-dup pair crosses the Jaccard
   * threshold. Docs with fewer than `n` tokens have no shingles and are
   * not emitted.
   *
   * Scale shape: distinct (doc, shingle) → shingle-keyed df aggregate
   * (map-side combine) → one equi-join back on the shingle — the
   * [[Dedup.ngramJaccardPairs]] candidate-join pattern; only shingle
   * strings and counts move. A df≈corpus boilerplate shingle fans out df
   * rows here like in every shingle join — profile with
   * [[Dedup.shingleDfCap]] and pre-filter if such shingles dominate.
   *
   * Output: (id, n_shingles, n_unique, mean_df, novelty), rounded 6.
   */
  def noveltyScore(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val sh = Dedup.shingles(df, textCol, idCol, n).distinct()
    val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    sh.join(dfs, "shingle")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"),
        round(avg(col("df").cast("double")), 6).as("mean_df"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_shingles"), 6))
  }

  /**
   * Deterministic feature-hashed text embedding (signed feature hashing,
   * Weinberger et al. 2009): each whitespace token hashes to one of
   * `dim` buckets with a ±1 sign, per-doc bucket sums are L2-normalized
   * — a cheap, engine-stable text → vector bridge that gives any corpus
   * an embedding column WITHOUT a neural encoder (the recall-oriented
   * blocking/featurizing fallback where no model embeddings exist).
   * Both hashes are md5-derived (the [[hashSplit]] family), so the whole
   * vector replays in SQL and hash-matches (`q_text_hash_embed`).
   *
   * Output is the SPARSE representation (id, dim_idx, val) with
   * val = raw/‖raw‖ rounded to 6 dp and zero-mass buckets omitted —
   * O(distinct buckets) rows per doc regardless of `dim`. Everything up
   * to the final division is integer arithmetic (signed bucket sums,
   * squared norm), so cross-engine determinism is exact, not
   * floating-point-lucky.
   *
   * Scale shape: explode → (id, bucket) hash aggregate (map-side
   * combine) → id-keyed window for the norm; text bodies leave the plan
   * at the explode.
   */
  def hashEmbedding(df: DataFrame, textCol: String, idCol: String,
      dim: Int = 64): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    def h16(c: Column) = conv(substring(md5(c), 1, 4), 16, 10).cast("long")
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val raw = tok
      .select(col(idCol),
        pmod(h16(concat(col("__w"), lit("#b"))), lit(dim.toLong)).as("dim_idx"),
        when(pmod(h16(concat(col("__w"), lit("#s"))), lit(2L)) === 0, lit(1L))
          .otherwise(lit(-1L)).as("__s"))
      .groupBy(col(idCol), col("dim_idx"))
      .agg(sum(col("__s")).as("__raw"))
      .filter(col("__raw") =!= 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    raw.select(col(idCol), col("dim_idx"),
      round(col("__raw").cast("double") /
        sqrt(sum(col("__raw") * col("__raw")).over(w).cast("double")), 6).as("val"))
  }

  /**
   * Deterministic corpus split: train/dev/test labels derived from the
   * doc id's md5 (first 4 hex nibbles, a uniform value in [0, 65536)),
   * compared against cumulative fraction thresholds floored to integers.
   * The corpus-prep counterpart of the RANDOM row splits (G3, spec-only):
   * content-derived, so membership is stable across runs, partitionings
   * and engines — which makes it fully ORACLE-CHECKABLE, and means a doc
   * keeps its split when the corpus is re-processed (the property
   * training pipelines actually need to avoid cross-split leakage over
   * time). One narrow projection, no shuffle.
   *
   * `fractions` are (label, weight) pairs; weights are normalized. The
   * final label absorbs the rounding remainder (thresholds floor to
   * 1/65536 granularity — at most ~0.0015% skew per boundary).
   */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "need non-empty positive split fractions")
    val total = fractions.map(_._2).sum
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    val cums = fractions.scanLeft(0.0) { case (a, (_, w)) => a + w / total }
      .tail.map(c => math.floor(c * 65536).toLong)
    val label = fractions.init.zip(cums.init).foldRight(
      lit(fractions.last._1): Column) { case (((name, _), t), rest) =>
        when(h < t, lit(name)).otherwise(rest)
      }
    df.withColumn("split", label)
  }

  /**
   * Deterministic multi-epoch training shuffle + shard manifest: for each
   * epoch e in [0, epochs) every row gets a content-derived shard and a
   * sortable key — the final "global shuffle" step that turns a curated
   * corpus into per-epoch training shards, with a DIFFERENT but fully
   * reproducible permutation per epoch (the salt is `e:id`, never
   * `rand()`, so re-runs, retries and engines agree row-for-row).
   *
   * The order WITHIN a shard is defined by `sort_key` (the md5 itself —
   * uniform, collision-free in practice, lexicographically sortable):
   * consumers write with `repartitionByRange($"epoch", $"shard")` +
   * `sortWithinPartitions($"sort_key")` (or hive-partition by
   * epoch/shard via [[graft.sources.CorpusIo]]). Deliberately NO
   * row_number position: a per-shard dense rank would funnel each shard
   * through one window task — the sort key gives the same ordering
   * contract shuffle-free.
   *
   * Output: (id, epoch, shard, sort_key); one projection + a 1→epochs
   * explode, no shuffle of its own.
   */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
      nShards: Int): DataFrame = {
    require(epochs >= 1 && nShards >= 1, "epochs and nShards must be >= 1")
    val epoch = explode(array((0 until epochs).map(e => lit(e.toLong)): _*))
    val h = md5(concat(col("epoch").cast("string"), lit(":"),
      col(idCol).cast("string")))
    df.select(col(idCol), epoch.as("epoch"))
      .withColumn("sort_key", h)
      .withColumn("shard",
        pmod(conv(substring(col("sort_key"), 1, 4), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .select(col(idCol), col("epoch"), col("shard"), col("sort_key"))
  }

  /**
   * Encoding-hygiene anomaly scan: per doc, counts of U+FFFD replacement
   * characters (the scar a botched charset conversion leaves), control
   * characters (C0 minus tab/newline/CR), and the longest line — the
   * cheap pass that catches binary-in-text, mojibake and minified blobs
   * before they poison tokenizer fits and dedup hashes. One narrow
   * codegen projection; patterns restricted to the Java-regex ∩ RE2
   * subset.
   *
   * Output: (id, n_replacement, n_control, n_lines, max_line_len,
   * flagged).
   */
  def anomalyScan(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n", -1)
    val nRepl = regexp_count(t, lit("\\uFFFD")).cast("long")
    val nCtl = regexp_count(t,
      lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")).cast("long")
    df.select(col(idCol),
      nRepl.as("n_replacement"),
      nCtl.as("n_control"),
      size(lines).cast("long").as("n_lines"),
      array_max(transform(lines, l => length(l))).cast("long").as("max_line_len"),
      (nRepl > 0 || nCtl > 0).as("flagged"))
  }

  /**
   * Per-group score calibration: each row's score becomes its
   * percent-rank WITHIN its group (source), so a single global threshold
   * ("keep the top 30%") cuts every source at the same quantile instead
   * of letting one verbose source dominate — the standard fix for
   * heterogeneous quality-score distributions across corpus sources
   * (CCNet applies its LM threshold per language/shard for the same
   * reason). Deterministic: ties break on the id.
   *
   * Output: input keys + (score, pct_rank in [0,1], rounded 6 dp). One
   * window pass keyed on the group — at 100 TB the same per-source
   * shuffle any per-source processing needs; no global sort.
   */
  def calibrateScores(df: DataFrame, scoreCol: String, groupCols: Seq[String],
      idCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol), col(idCol))
    df.select((groupCols :+ idCol :+ scoreCol).map(col): _*)
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
  }

  /**
   * Deterministic per-group quota sampling: keep at most `quota` rows per
   * group, chosen by a salted content hash (stable across runs,
   * partitionings and engines — never `rand()`), md5 tiebroken by id.
   * The balanced-downsampling step of multi-source corpora ("cap every
   * source at N docs"); complements [[mixCorpus]]'s fractional weights
   * with an exact per-group cardinality bound. One window pass on the
   * group key; at 100 TB the per-group rank is the same shuffle the
   * downstream per-source processing needs anyway.
   */
  def quotaSample(df: DataFrame, groupCols: Seq[String], idCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat_ws("#", col(idCol).cast("string"), lit("quota"))).asc,
        col(idCol).asc)
    df.withColumn("_qr", row_number().over(w))
      .filter(col("_qr") <= quota).drop("_qr")
  }

  /**
   * Deterministic weighted corpus mixing — the data-mixture reweighting
   * step of multi-source training pipelines (Pile/DoReMi style): each
   * source gets a sampling weight `w >= 0`, and every doc is emitted
   * `floor(w)` times plus one more when the doc's salted-md5 uniform
   * value in [0, 65536) falls under `frac(w) * 65536` — so w = 0.25
   * downsamples to a quarter, w = 2.5 emits 2 or 3 copies. The hash is
   * salted ("#mix") so mixture membership is independent of
   * [[hashSplit]]'s train/dev/test assignment; being content-derived it
   * is stable across runs, partitionings and engines (oracle-checkable),
   * and a doc keeps its fate when the corpus is reprocessed.
   *
   * Output: all input columns plus `copy` (0-based repeat index; rows
   * with zero copies disappear). One narrow projection + explode — no
   * shuffle, no RNG.
   */
  def mixCorpus(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixture weights must be >= 0")
    val h = conv(substring(md5(concat(col(idCol).cast("string"), lit("#mix"))),
      1, 4), 16, 10).cast("long")
    val w = weights.foldLeft(lit(defaultWeight)) { case (rest, (s, wt)) =>
      when(col(sourceCol) === s, lit(wt)).otherwise(rest)
    }
    val base = floor(w).cast("long")
    val thresh = floor((w - floor(w)) * 65536).cast("long")
    val n = base + when(h < thresh, lit(1L)).otherwise(lit(0L))
    // sequence(0, -1) would DESCEND in Spark; guard the zero-copy case
    // with an explicit empty array so explode drops the row
    df.withColumn("copy", explode(when(n > 0, sequence(lit(0L), n - lit(1L)))
      .otherwise(array().cast("array<long>"))))
  }

  /**
   * C4-style line-level dedup (Raffel et al. 2020 §2.2 discards any line
   * occurring more than once in the dataset; generalized here to a
   * document-frequency threshold): drop every line whose normalized form
   * (trim + lowercase) appears in at least `minDf` DISTINCT documents,
   * then reassemble each document's surviving lines in original order.
   * Documents whose every line is boilerplate disappear from the output
   * (C4 drops emptied docs). Output: (id, clean_text, n_lines).
   *
   * Scale shape: line document-frequency is a two-level aggregation
   * (per-doc distinct, then count — both with map-side partial combine),
   * and the hot-line list rejoins as a broadcast anti-join by default
   * (the list holds only lines duplicated across >= minDf docs). Set
   * `broadcastHot = false` when the duplicated-line universe exceeds
   * broadcast memory — the join degrades to a shuffle anti-join keyed on
   * the line. Reassembly is ONE doc-keyed aggregation: `sort_array` over
   * (pos, line) structs restores order without a window.
   */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
      minDf: Int = 2, broadcastHot: Boolean = true): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val norm = trim(lower(col("line")))
    val hot = lines.select(norm.as("nl"), col(idCol)).distinct()
      .groupBy(col("nl")).agg(count(lit(1)).as("df_n"))
      .filter(col("df_n") >= minDf)
      .select(col("nl"))
    val hotSide = if (broadcastHot) broadcast(hot) else hot
    lines.join(hotSide, norm === col("nl"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("line")))),
          x => x("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines"))
  }

  /**
   * Intra-document duplicate-line removal — the WITHIN-doc counterpart of
   * the corpus-wide [[dedupLines]] (RefinedWeb/MassiveText run both: a doc
   * that repeats its own navigation/footer lines keeps one copy; C4-style
   * cross-doc boilerplate needs the document-frequency pass). Keeps the
   * FIRST occurrence of each normalized (trim + lowercase) line, preserves
   * original order and the surviving lines' original (untrimmed) text.
   *
   * Output: (id, clean_text, n_lines, n_dropped).
   *
   * Scale shape: unlike the cross-doc variant this needs NO shuffle at all
   * — membership is decided inside the row with array higher-order
   * functions (`array_position` of the normalized form == own index keeps
   * exactly the first occurrence), so the operator is one codegen'd
   * narrow projection over the corpus. Cost is O(lines²) per doc on the
   * normalized-line array, fine for real documents (lines ≪ 10⁴); docs
   * with that many lines are boilerplate the quality filters drop anyway.
   */
  def dedupLinesInDoc(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val normed = transform(lines, l => trim(lower(l)))
    // keep line i (0-based lambda index) iff the first occurrence of its
    // normalized form is at i (array_position is 1-based)
    val kept = filter(lines, (_, i) =>
      array_position(normed, element_at(normed, i + 1)) === (i + 1).cast("long"))
    df.select(col(idCol),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_dropped"))
  }

  /**
   * PII scrubbing: mask emails, US-style phone numbers and IPv4 addresses
   * with typed placeholder tokens, and count what was masked — the
   * redaction pass corpus pipelines run before training. Patterns are
   * deliberately restricted to constructs whose semantics agree between
   * Java regex (Spark codegen) and RE2 (DuckDB), so the operator is
   * oracle-checkable; a production deployment would widen the pattern
   * set, not the plumbing. One narrow codegen projection, no shuffle, no
   * UDF (`regexp_replace` + `regexp_count`).
   *
   * Output: (id, clean_text, n_emails, n_phones, n_ips). Masking order:
   * emails, then phones, then IPs — and each count runs on the SAME
   * progressively-masked text the clean_text pipeline sees (phones
   * counted on email-masked text, IPs on email+phone-masked text), so
   * the counts always agree with what the output text shows: a
   * phone-shaped substring inside an email is masked as <EMAIL> and NOT
   * counted as a phone.
   */
  def scrubPii(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // domain = dot-terminated segments: unambiguous to parse, so Java
    // regex (backtracking) and RE2 (automaton) agree on match extents
    val email = "[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9-]+\\.)+[A-Za-z]{2,}"
    val phone = "\\d{3}[-.]\\d{3}[-.]\\d{4}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val t = col(textCol)
    val afterEmail = regexp_replace(t, email, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phone, "<PHONE>")
    df.select(col(idCol),
      regexp_replace(afterPhone, ip, "<IP>").as("clean_text"),
      regexp_count(t, lit(email)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(phone)).cast("long").as("n_phones"),
      regexp_count(afterPhone, lit(ip)).cast("long").as("n_ips"))
  }

  /**
   * Checksum-validated payment-card scrub: candidate digit runs (13–19
   * digits, optional single space/dash group separators) are VERIFIED
   * with the Luhn check before redaction, so order ids, timestamps and
   * tracking numbers that merely look card-shaped survive — the
   * false-positive control a bare regex scrub ([[scrubPii]]) cannot
   * give. Valid candidates are replaced with `<CARD>` wherever they
   * occur; invalid ones are left untouched and reported, so a release
   * audit can eyeball the near-misses.
   *
   * Pure Catalyst: candidates via `regexp_extract_all`, the Luhn sum an
   * `aggregate` HOF over the candidate's reversed digit string (double
   * every second digit, subtract 9 above 9), the redaction a fold of
   * literal `replace` calls over the validated list — one narrow
   * codegen projection, no shuffle, stream-legal; fuses into the scan
   * stage next to [[scrubPii]]. The regex stays in the Java ∩ RE2
   * subset so external engines replay the decision. Output:
   * (id, clean_text, n_cards, n_rejected).
   */
  def scrubCards(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // 13-19 digits with optional single separators; \b keeps mid-number
    // starts and longer digit runs out on both engines
    val cardPat = "\\b\\d(?:[ -]?\\d){12,18}\\b"
    val cands = array_distinct(
      regexp_extract_all(col(textCol), lit(cardPat), lit(0)))
    val luhnValid: Column => Column = c => {
      val ds = reverse(regexp_replace(c, "[^0-9]", ""))
      val s = aggregate(sequence(lit(1), length(ds)), lit(0),
        (acc, i) => {
          val d = ds.substr(i, lit(1)).cast("int")
          val dbl = when(pmod(i, lit(2)) === 0,
            when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
          acc + dbl
        })
      pmod(s, lit(10)) === 0
    }
    val valid = filter(cands, luhnValid)
    df.select(col(idCol),
      aggregate(valid, col(textCol),
        (acc, c) => replace(acc, c, lit("<CARD>"))).as("clean_text"),
      size(valid).cast("long").as("n_cards"),
      (size(cands) - size(valid)).cast("long").as("n_rejected"))
  }

  /**
   * Corpus text normalization: Unicode NFC composition (custom codegen'd
   * [[graft.functions.NfcNormalize]] expression — Spark has no built-in),
   * then control characters (C0 + DEL) and NBSP replaced by spaces, runs
   * of whitespace collapsed to one space, and the result trimmed. The
   * canonicalization pass that runs BEFORE any hash-based operator (exact
   * dedup, minhash, fingerprints): `e`+U+0301 from one crawler and
   * precomposed U+00E9 from another must hash identically or every
   * downstream dedup silently misses the pair.
   *
   * Newlines are deliberately folded with the rest of the whitespace —
   * run the line-structure operators ([[dedupLines]] etc.) BEFORE this
   * pass. One narrow codegen projection, no shuffle; the NFC expression
   * has an allocation-free fast path for already-normalized (e.g. pure
   * ASCII) text, which is almost all of a real corpus.
   *
   * Output: (id, clean_text, n_chars_norm).
   */
  def normalizeText(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import graft.functions.NfcNormalize.nfcNormalize
    // \x{..} hex escapes parse identically in Java regex and RE2
    val noCtl = regexp_replace(nfcNormalize(col(textCol)),
      "[\\x{00}-\\x{1f}\\x{7f}\\x{a0}]", " ")
    val clean = trim(regexp_replace(noCtl, " +", " "))
    df.select(col(idCol), clean.as("clean_text"),
      length(clean).cast("long").as("n_chars_norm"))
  }

  /**
   * The common cp1252-misdecoded-UTF-8 artifacts and their repairs: the
   * character sequences a UTF-8 byte stream turns into when decoded as
   * Windows-1252 (the dominant real-world mojibake family — curly
   * quotes/dashes E2 80 xx and Latin-1 accents C3 xx / symbols C2 xx).
   * Three-char artifacts first so the chain never half-consumes one.
   * Each entry is the EXACT cp1252 rendering of the target's UTF-8
   * bytes — verified by construction (new String(target.getBytes(UTF_8),
   * "windows-1252") in the spec).
   */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€“" -> "–", // en dash
    "â€”" -> "—", // em dash
    "â€˜" -> "‘", // left single quote
    "â€™" -> "’", // right single quote
    "â€œ" -> "“", // left double quote
    "â€¦" -> "…", // ellipsis
    "Ã©" -> "é", // é
    "Ã¨" -> "è", // è
    "Ã¤" -> "ä", // ä
    "Ã¶" -> "ö", // ö
    "Ã¼" -> "ü", // ü
    "Ã±" -> "ñ", // ñ
    "Ã§" -> "ç", // ç
    "Ã¡" -> "á", // á
    "Ã³" -> "ó", // ó
    "Ãº" -> "ú", // ú
    "Â©" -> "©", // ©
    "Â°" -> "°", // °
    "Â«" -> "«", // «
    "Â»" -> "»", // »
    "Â " -> " ") // nbsp

  /**
   * Mojibake repair (the fixed-table core of ftfy): rewrite the
   * [[MojibakeTable]] artifacts back to the characters the original
   * UTF-8 encoded, count artifacts before repair, and flag touched
   * rows. A plain left-to-right `replace` chain — Java and SQL replace
   * agree exactly, so `q_text_fix_mojibake` hash-matches — and one
   * narrow codegen projection, no shuffle, streaming-legal. Full ftfy
   * additionally SEARCHES for the decoding that minimizes badness
   * (byte-level codec round-trips, out of the engine-replayable
   * subset); this table covers the dominant cp1252 double-encode
   * family, and [[anomalyScan]] still flags what the table misses.
   * Run BEFORE [[normalizeText]]: repairs produce NBSP/accents that
   * normalization then canonicalizes.
   *
   * Output: (id, fixed_text, n_artifacts, changed).
   */
  def fixMojibake(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val nArt = MojibakeTable.map { case (bad, _) =>
      ((length(t) - length(replace(t, lit(bad), lit("")))) /
        bad.length).cast("long")
    }.reduce(_ + _)
    val fixed = MojibakeTable.foldLeft(t) { case (e, (bad, good)) =>
      replace(e, lit(bad), lit(good))
    }
    df.select(col(idCol), fixed.as("fixed_text"), nArt.as("n_artifacts"),
      (nArt > 0L).as("changed"))
  }

  /** The script classes [[scriptProfile]] counts, as (name, regex char
    * class) — `\x{...}` hex ranges parse identically in Java regex and
    * RE2, the same portability rule as [[normalizeText]]. Precedence
    * order = tie order for the majority verdict. */
  val ScriptClasses: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{c0}-\\x{ff}]",
    "cyrillic" -> "[\\x{400}-\\x{4ff}]",
    "greek" -> "[\\x{370}-\\x{3ff}]",
    "cjk" -> "[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}]",
    "hangul" -> "[\\x{ac00}-\\x{d7af}\\x{1100}-\\x{11ff}]",
    "arabic" -> "[\\x{600}-\\x{6ff}]",
    "digit" -> "[0-9]")

  /**
   * Script-composition profile: per-document counts and ratios of the
   * [[ScriptClasses]] (Latin incl. Latin-1 accents, Cyrillic, Greek,
   * CJK incl. kana, Hangul incl. jamo, Arabic, digits) over the
   * non-whitespace character count, plus the majority script
   * (highest count; [[ScriptClasses]] order breaks ties; "other" when
   * nothing matches). The script gate that runs NEXT TO [[languageId]]
   * in a multilingual crawl pipeline: language-ID models assume a
   * script, so mC4/CCNet-style pipelines bucket by script FIRST —
   * and mixed-script documents (ratio spread across classes) are the
   * classic spam/SEO signal. One narrow codegen projection of
   * `regexp_count` calls, no shuffle, streaming-legal.
   *
   * Output: (id, n_chars, n_<class>..., <class>_ratio..., majority),
   * plus any `carry` payload columns passed through unchanged (so a
   * composed pipeline can gate on the profile without a join back).
   */
  def scriptProfile(df: DataFrame, textCol: String, idCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val outNames = "n_chars" +: "majority" +:
      ScriptClasses.flatMap(c => Seq(s"n_${c._1}", s"${c._1}_ratio"))
    require(!(carry :+ idCol).exists(outNames.contains),
      s"carry/id columns collide with profile outputs: rename before the " +
        s"profile (reserved: ${outNames.mkString(", ")})")
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val nChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    // two projection steps: counts become NAMED columns first, so the
    // ratio/majority expressions reference columns instead of embedding
    // the regexp_count subtree again (a running-best fold duplicated each
    // count exponentially; even greatest()+when chains over raw exprs
    // would re-embed every regex per reference)
    val counted = df.select(
      (Seq(col(idCol), nChars.as("n_chars")) ++
        ScriptClasses.map { case (name, cls) =>
          regexp_count(t, lit(cls)).cast("long").as(s"n_$name")
        } ++ carry.map(col)): _*)
    val mx = greatest(ScriptClasses.map(c => col(s"n_${c._1}")): _*)
    // the FIRST class attaining the max wins ties (declaration order)
    val majority = when(mx === 0L, lit("other")).otherwise(
      ScriptClasses.reverse.foldLeft(lit("other")) { case (tail, (name, _)) =>
        when(col(s"n_$name") === mx, lit(name)).otherwise(tail)
      })
    val cols = Seq(col(idCol), col("n_chars")) ++
      ScriptClasses.map(c => col(s"n_${c._1}")) ++
      ScriptClasses.map { case (name, _) =>
        round(when(col("n_chars") > 0,
          col(s"n_$name").cast("double") / col("n_chars")).otherwise(lit(0.0)),
          6).as(s"${name}_ratio")
      } ++ Seq(majority.as("majority")) ++ carry.map(col)
    counted.select(cols: _*)
  }

  /**
   * Compressibility quality signal: per-document DEFLATE ratio
   * ([[graft.functions.DeflateRatio]] — LZ77 catches the fuzzy and
   * long-range repetition the exact n-gram counters miss) plus the gate
   * verdict `keep = ratio in [lo, hi]`: far-below-prose ratios are
   * templated/repetitive text, near-1 ratios are non-text (random
   * strings, base64 blobs). The RedPajama-v2 signal family. One narrow
   * codegen projection, no shuffle, streaming-legal; deterministic but
   * not SQL-replayable (rows-only query + ordering specs).
   *
   * Output: (id, n_bytes, deflate_ratio rounded 6 dp, keep).
   */
  def compressionSignal(df: DataFrame, textCol: String, idCol: String,
      lo: Double = 0.20, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && lo < hi, "need 0 <= lo < hi")
    val t = coalesce(col(textCol).cast("string"), lit(""))
    df.select(col(idCol),
        octet_length(t).cast("long").as("n_bytes"),
        round(graft.functions.DeflateRatio.deflateRatio(t), 6)
          .as("deflate_ratio"))
      .withColumn("keep",
        col("deflate_ratio") >= lo && col("deflate_ratio") <= hi)
  }

  /**
   * Flesch reading-ease score (Flesch 1948, the readability heuristic
   * education-targeted curation gates on — FineWeb-Edu-style filters
   * correlate strongly with it):
   *
   *   FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
   *
   * with the standard cheap proxies: sentences = terminator groups
   * `[.!?]+` (floor 1), syllables = vowel groups `[aeiouy]+` per word
   * (floor 1 per word). Higher = simpler text; ~90 is grade-school
   * prose, below 30 is academic/legalese, and extreme values flag
   * non-prose (code, tables, keyword spam). One narrow codegen
   * projection (regexp counts + an aggregate HOF over the token
   * array), no shuffle, streaming-legal, engine-replayable
   * (`q_text_readability` hash-matches).
   *
   * Output: (id, n_words, n_sentences, n_syllables, flesch) — flesch
   * rounded to 6 dp, null for wordless docs.
   */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = coalesce(col(textCol).cast("string"), lit(""))
    val ws = filter(tokens(t), w => length(w) > 0)
    val nWords = size(ws).cast("long")
    val nSent = greatest(regexp_count(t, lit("[.!?]+")).cast("long"), lit(1L))
    val nSyl = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(regexp_count(w, lit("[aeiouy]+")).cast("long"), lit(1L)))
    // counts become named columns first (the scriptProfile rule: the
    // formula would otherwise re-embed the token split + HOF fold per
    // reference)
    df.select(col(idCol), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          round(lit(206.835)
            - lit(1.015) * col("n_words").cast("double") / col("n_sentences")
            - lit(84.6) * col("n_syllables").cast("double") / col("n_words"),
            6)))
  }

  /**
   * HTML/markup stripping — the boilerplate-removal front of web-corpus
   * extraction: drop `<script>`/`<style>` blocks wholesale (their TEXT is
   * code, not prose), drop comments, strip remaining tags, unescape the
   * five standard entities plus numeric quote/nbsp, collapse whitespace.
   * Pattern set is the Java-regex ∩ RE2 subset (non-greedy `.*?` and the
   * `(?s)` flag agree; no backreferences, so the close-tag alternation is
   * repeated rather than referenced) — oracle-checkable. `&amp;` is
   * unescaped LAST, the standard order that keeps `&amp;lt;` from
   * double-unescaping into `<`.
   *
   * One codegen projection, no shuffle. A production extractor would add
   * DOM-aware main-content detection ON TOP of this pass, not replace it.
   *
   * Output: (id, clean_text, n_chars_clean).
   */
  def stripMarkup(df: DataFrame, textCol: String, idCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    require(!(carry :+ idCol).exists(Seq("clean_text", "n_chars_clean").contains),
      "carry/id columns collide with stripMarkup outputs")
    val noBlocks = regexp_replace(col(textCol),
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val unescaped = replace(replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))
    val clean = trim(regexp_replace(unescaped, "\\s+", " "))
    df.select((Seq(col(idCol), clean.as("clean_text"),
      length(clean).cast("long").as("n_chars_clean")) ++ carry.map(col)): _*)
  }

  /** Block-level tags whose boundaries delimit content blocks for
    * [[mainContentBlocks]] (the jusText block segmentation). */
  private val BlockTagRe =
    "(?i)</?(?:p|div|li|h[1-6]|ul|ol|table|tr|td|nav|header|footer|article|section|br)(?:\\s[^>]*)?>"

  /** Tag-strip + whitespace-collapse + trim (NO entity unescape — compose
    * [[stripMarkup]] downstream for that). */
  private def blockText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]+>", " "), "\\s+", " "))

  /** Characters of the whitespace-joined inner texts of a block's `<a>`
    * anchors — the link-density numerator. */
  private def anchorChars(c: Column): Column =
    length(blockText(array_join(
      regexp_extract_all(c, lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)), " ")))

  /** Per-block struct array for the main-content family: non-empty blocks
    * in document order with their (text, anchor chars). */
  private def contentBlocks(html: Column): Column =
    filter(transform(split(html, BlockTagRe),
      b => struct(blockText(b).as("t"), anchorChars(b).as("ac"))),
      s => s.getField("t") =!= lit(""))

  /**
   * Main-content block segmentation (the jusText/trafilatura heuristic —
   * Pomikálek 2011): split raw HTML on block-level tag boundaries and
   * score each non-empty block by length and LINK DENSITY (anchor-text
   * characters over block characters). Navigation bars, footers, and
   * related-links boxes are short and link-dense; body prose is long and
   * link-sparse — the rule-based boilerplate cut that runs BEFORE
   * document-grain curation, recovering article text from page chrome.
   *
   * Emits every non-empty block with its measured signals AND the keep
   * verdict (`n_chars >= minChars AND link_density <= maxLinkDensity`,
   * density rounded 6 dp, verdict over the ROUNDED value) so thresholds
   * re-tune without a second pass. Inline anchors must not wrap block
   * tags (true of well-formed HTML); entities are left for
   * [[stripMarkup]] downstream.
   *
   * Output: (id, block_idx, n_chars, link_density, keep, block_text),
   * block_idx 1-based over non-empty blocks.
   *
   * Scale shape: ONE narrow projection — split, per-block regex
   * arithmetic, and the non-empty filter all run inside the row; only
   * the per-block rows explode (bounded by the page's block count). No
   * shuffle, no parser library, engine-portable regexes (Java ∩ RE2).
   */
  def mainContentBlocks(df: DataFrame, htmlCol: String, idCol: String,
      minChars: Int = 25, maxLinkDensity: Double = 0.5): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(contentBlocks(col(htmlCol)))
        .as(Seq("__p", "__b")))
    val nChars = length(col("__b.t"))
    val density = round(col("__b.ac").cast("double") /
      greatest(nChars, lit(1)), 6)
    exploded.select(col(idCol),
      (col("__p") + 1).cast("long").as("block_idx"),
      nChars.cast("long").as("n_chars"),
      density.as("link_density"),
      (nChars >= minChars && density <= maxLinkDensity).as("keep"),
      col("__b.t").as("block_text"))
  }

  /**
   * The apply side of [[mainContentBlocks]]: keep only main-content
   * blocks and rebuild each document (blocks joined with blank lines) —
   * entirely IN-ROW, so it is zero-shuffle, append-mode streaming-legal,
   * and the page HTML never leaves its input partition. Output:
   * (id, main_text, n_blocks, n_kept).
   */
  def extractMainContent(df: DataFrame, htmlCol: String, idCol: String,
      minChars: Int = 25, maxLinkDensity: Double = 0.5): DataFrame = {
    val blocks = contentBlocks(col(htmlCol))
    def keepP(s: Column): Column = {
      val n = length(s.getField("t"))
      val d = round(s.getField("ac").cast("double") / greatest(n, lit(1)), 6)
      n >= minChars && d <= maxLinkDensity
    }
    df.select(col(idCol), blocks.as("__bs"))
      .select(col(idCol),
        array_join(transform(filter(col("__bs"), keepP _), _.getField("t")), "\n\n")
          .as("main_text"),
        size(col("__bs")).cast("long").as("n_blocks"),
        size(filter(col("__bs"), keepP _)).cast("long").as("n_kept"))
  }

  /**
   * Length-grouped batching — the padding-efficiency step of training-data
   * layout: documents are bucketed by token-count range (`bucketWidth`
   * tokens per bucket) and batched WITHIN a bucket in (token count, id)
   * order, so each batch of `batchSize` docs has near-uniform lengths and
   * the padding waste `batch_size·max_len − Σlen` stays small. Emits one
   * row per batch with its waste accounting — the report that drives
   * bucket-width tuning.
   *
   * Scale shape: the window is partitioned BY BUCKET (dozens of
   * independent partitions, not one global sort), so batch numbering
   * parallelizes; at 100 TB the same bucket key is what the writer would
   * `repartitionByRange` on, reusing this shuffle. All arithmetic is
   * integer, so the output hash-matches cross-engine.
   *
   * Output: (bucket, batch_id, n_docs, max_tokens, sum_tokens, pad_waste).
   */
  def lengthBatches(df: DataFrame, textCol: String, idCol: String,
      batchSize: Int = 32, bucketWidth: Int = 16): DataFrame = {
    require(batchSize > 0 && bucketWidth > 0, "batchSize/bucketWidth must be positive")
    val nTok = size(tokens(col(textCol))).cast("long")
    val withBucket = df.select(col(idCol), nTok.as("n_tokens"),
      floor(nTok / bucketWidth).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket"))
      .orderBy(col("n_tokens").asc, col(idCol).asc)
    withBucket
      .withColumn("batch_id", floor((row_number().over(w) - 1) / batchSize))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_waste",
        col("max_tokens") * col("n_docs") - col("sum_tokens"))
  }

  /**
   * Quality scoring: char length, stopword ratio, distinct-token ratio,
   * uppercase-start flag. A doc is "quality" when it looks like prose:
   * some stopwords, low repetition.
   */
  def qualityScore(df: DataFrame, textCol: String, idCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val t = tokens(col(textCol))
    val stopArr = array(Stopwords.map(lit): _*)
    val nStop = size(filter(t, x => array_contains(stopArr, x)))
    // `carry` keeps payload columns (e.g. the text itself) in the output so
    // a downstream gate needs no join back — the scores stay one narrow
    // projection either way
    df.select(col(idCol) +: carry.map(col) :+
      length(col(textCol)).cast("long").as("n_chars_m") :+
      round(nStop.cast("double") / size(t), 6).as("stop_ratio") :+
      round(size(array_distinct(t)).cast("double") / size(t), 6).as("distinct_ratio"): _*)
  }

  /**
   * Heuristic language ID: pick the language whose stopword list covers the
   * largest token share; below `minRatio` emit "und" (undetermined).
   * N-gram/stopword heuristics are the standard cheap pre-filter before a
   * real LID model in corpus pipelines.
   */
  def languageId(df: DataFrame, textCol: String, idCol: String,
      profiles: Map[String, Seq[String]] =
        Map("en" -> Stopwords, "es" -> Seq("el", "la", "de", "y", "que", "en")),
      minRatio: Double = 0.05): DataFrame = {
    val t = tokens(col(textCol))
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> round(size(filter(t, x => array_contains(arr, x))).cast("double") / size(t), 6)
    }
    // ties break toward the alphabetically first language (deterministic)
    var bestLang: Column = lit(scores.head._1)
    var bestScore: Column = scores.head._2
    scores.tail.foreach { case (l, s) =>
      bestLang = when(s > bestScore, lit(l)).otherwise(bestLang)
      bestScore = when(s > bestScore, s).otherwise(bestScore)
    }
    df.select(col(idCol),
      when(bestScore >= minRatio, bestLang).otherwise(lit("und")).as("lang_guess"),
      bestScore.as("lang_score"))
  }

  /**
   * Repetition score: 1 - distinct/total word n-grams — the C4/RefinedWeb
   * "repeated n-gram" quality signal (high ratio = boilerplate loops,
   * keyboard mash, template spam). Distinct shingles come from the
   * codegen'd [[graft.functions.WordShingles]] expression; the whole thing
   * is one narrow projection, no shuffle.
   */
  def repetitionScore(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3): DataFrame = {
    val total = greatest(size(tokens(col(textCol))) - (n - 1), lit(0))
    val dist = size(graft.functions.WordShingles.wordShingles(col(textCol), n))
    df.select(col(idCol),
      total.cast("long").as("n_shingles"),
      dist.cast("long").as("n_distinct_shingles"),
      round(when(total > 0, lit(1.0) - dist.cast("double") / total)
        .otherwise(lit(0.0)), 6).as("rep_ratio"))
  }

  /** Gopher's stopword list for the minStopwords rule (Rae et al. 2021,
    * appendix A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-style document quality rules (Rae et al. 2021, appendix A1.1),
   * the rule-based filter most LLM corpus pipelines run before any trained
   * quality model: reject documents outside word-count / mean-word-length
   * bounds, with too many symbols (# or ...) per word, too many
   * bullet-started or ellipsis-ended lines, too few words containing an
   * alphabetic character, or too few distinct stopwords. Emits the measured
   * signals AND the keep verdict, so thresholds can be re-tuned downstream
   * without a second corpus scan.
   *
   * All ratios are rounded to 6 dp and the verdict compares the ROUNDED
   * values, so an external SQL engine replays the decision exactly.
   *
   * Scale shape: one codegen'd narrow projection (two splits + higher-order
   * filters over the token/line arrays), no shuffle — a single corpus pass,
   * fusable with the other per-doc quality signals.
   */
  def gopherRules(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      stopwords: Seq[String] = GopherStopwords,
      minStopwords: Int = 2): DataFrame = {
    val txt = col(textCol)
    val t = tokens(txt)
    val dbl = (c: Column) => c.cast("double")
    // split("\s+") maps blank text to [""] (size 1) — gate on the text
    val nWords = when(length(trim(txt)) > 0, size(t)).otherwise(lit(0))
    // token-length sum == chars left after deleting \s+ runs (see tokenStats)
    val charSum = length(regexp_replace(lower(txt), "\\s+", ""))
    val meanLen = round(when(nWords > 0, dbl(charSum) / nWords).otherwise(lit(0.0)), 6)
    val nSym = regexp_count(txt, lit("#")) + regexp_count(txt, lit("\\.\\.\\."))
    val symRatio = round(when(nWords > 0, dbl(nSym) / nWords).otherwise(lit(0.0)), 6)
    val lines = split(txt, "\n")
    val nLines = size(lines) // >= 1 always
    val nBullet = size(filter(lines, l => substring(ltrim(l), 1, 1).isin("-", "*", "•")))
    val bulletRatio = round(dbl(nBullet) / nLines, 6)
    val nEllipsis = size(filter(lines,
      l => endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
    val ellipsisRatio = round(dbl(nEllipsis) / nLines, 6)
    val nAlpha = size(filter(t, w => w.rlike("[a-z]")))
    val alphaRatio = round(when(nWords > 0, dbl(nAlpha) / nWords).otherwise(lit(0.0)), 6)
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(array_intersect(array_distinct(t), stopArr))
    val keep = nWords >= minWords && nWords <= maxWords &&
      meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
      symRatio <= maxSymbolRatio && bulletRatio <= maxBulletRatio &&
      ellipsisRatio <= maxEllipsisRatio && alphaRatio >= minAlphaRatio &&
      nStop >= minStopwords
    df.select(col(idCol),
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"),
      alphaRatio.as("alpha_ratio"),
      nStop.cast("long").as("n_stop"),
      keep.as("keep"))
  }

  /**
   * Filter-funnel attrition report over [[gopherRules]]: one row per
   * rule, in the fixed rule order, with how many docs pass it ALONE, how
   * many it KILLS (fail it having survived every earlier rule), and how
   * many SURVIVE through it — the table every curation writeup publishes
   * ("rule X removed N% of the corpus") and the tuning loop for
   * thresholds: a rule with near-zero marginal kills is free, one
   * killing half the corpus deserves a second look.
   *
   * Shape: the metric projection is [[gopherRules]]'s (shuffle-free);
   * the funnel is ONE whole-table aggregate (3 counters per rule,
   * map-side combined) whose single wide row explodes into the per-rule
   * report driver-free. Output: (rule_idx, rule, n_docs, n_pass_alone,
   * n_killed, n_surviving).
   */
  def gopherAttrition(df: DataFrame, textCol: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      stopwords: Seq[String] = GopherStopwords,
      minStopwords: Int = 2): DataFrame = {
    val m = gopherRules(df, textCol, idCol, minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletRatio,
      maxEllipsisRatio, minAlphaRatio, stopwords, minStopwords)
    val rules: Seq[(String, Column)] = Seq(
      "word_count" -> (col("n_words") >= minWords && col("n_words") <= maxWords),
      "mean_word_len" -> (col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen),
      "symbol_ratio" -> (col("symbol_ratio") <= maxSymbolRatio),
      "bullet_ratio" -> (col("bullet_ratio") <= maxBulletRatio),
      "ellipsis_ratio" -> (col("ellipsis_ratio") <= maxEllipsisRatio),
      "alpha_ratio" -> (col("alpha_ratio") >= minAlphaRatio),
      "stopwords" -> (col("n_stop") >= minStopwords))
    val cums = rules.scanLeft(lit(true)) { case (acc, (_, p)) => acc && p }.tail
    val aggs = rules.zip(cums).zipWithIndex.flatMap { case (((_, p), cum), i) =>
      val prior = if (i == 0) lit(true) else cums(i - 1)
      Seq(sum(when(p, 1L).otherwise(0L)).as(s"__p$i"),
        sum(when(prior && !p, 1L).otherwise(0L)).as(s"__k$i"),
        sum(when(cum, 1L).otherwise(0L)).as(s"__s$i"))
    }
    val wide = m.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).cast("long").as("rule_idx"), lit(name).as("rule"),
        col(s"__p$i").as("n_pass_alone"), col(s"__k$i").as("n_killed"),
        col(s"__s$i").as("n_surviving"))
    }
    wide.select(col("__n").as("n_docs"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.rule_idx"), col("__r.rule"), col("n_docs"),
        col("__r.n_pass_alone"), col("__r.n_killed"), col("__r.n_surviving"))
  }

  /**
   * Gopher repetition-removal rules (Rae et al. 2021, appendix A1.2) —
   * the OTHER half of the Gopher gate next to [[gopherRules]]: reject
   * documents dominated by internal repetition. Emits, per document, the
   * measured fractions AND the keep verdict, so thresholds re-tune
   * downstream without a second corpus scan:
   *
   *  - `dup_line_frac` / `dup_para_frac` — fraction of lines /
   *    paragraphs that repeat an earlier one (occurrences beyond the
   *    first over the total; blank elements dropped);
   *  - `dup_line_char_frac` / `dup_para_char_frac` — characters of those
   *    repeated occurrences over the document length;
   *  - `top{2,3,4}_char_frac` — characters covered by the single most
   *    frequent word n-gram (count x gram length; 0 when nothing
   *    repeats) over the document length;
   *  - `dup{5..10}_char_frac` — characters across ALL occurrences of
   *    duplicated n-grams over the characters across ALL n-grams of
   *    that size (the NeMo-Curator convention, which keeps the fraction
   *    in [0, 1] despite overlapping grams; see
   *    [[graft.functions.RepetitionStats]] for the documented deviation
   *    from the paper's sequential scan).
   *
   * Default thresholds are the paper's table A1. All fractions are
   * rounded to 6 dp and the verdict compares the ROUNDED values, so an
   * external SQL engine replays the decision exactly.
   *
   * Scale shape: ONE shuffle-free narrow projection; all 21 counters
   * come from a single codegen'd imperative pass per document
   * ([[graft.functions.RepetitionStats]]) — fusable with [[gopherRules]]
   * and the other per-doc quality signals in the same stage. `carry`
   * threads payload columns (the text itself, usually) through, so the
   * gate composes in a pipeline without a re-join — streaming-legal.
   */
  def gopherRepetition(df: DataFrame, textCol: String, idCol: String,
      maxDupLineFrac: Double = 0.30, maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20, maxDupParaCharFrac: Double = 0.20,
      maxTopNgramCharFrac: Seq[Double] = Seq(0.20, 0.18, 0.16),
      maxDupNgramCharFrac: Seq[Double] = Seq(0.15, 0.14, 0.13, 0.12, 0.11, 0.10),
      carry: Seq[String] = Nil): DataFrame = {
    require(maxTopNgramCharFrac.size == 3, "top thresholds cover n = 2, 3, 4")
    require(maxDupNgramCharFrac.size == 6, "dup thresholds cover n = 5..10")
    val dbl = (c: Column) => c.cast("double")
    val base = df.select(Seq(col(idCol),
      length(col(textCol)).cast("long").as("__nc"),
      graft.functions.RepetitionStats.stats(col(textCol)).as("__rs")) ++
      carry.map(col): _*)
    def elemFrac(dup: String, n: String): Column =
      round(when(col(s"__rs.$n") > 0,
        dbl(col(s"__rs.$dup")) / col(s"__rs.$n")).otherwise(lit(0.0)), 6)
    def charFrac(f: String): Column =
      round(when(col("__nc") > 0,
        dbl(col(s"__rs.$f")) / col("__nc")).otherwise(lit(0.0)), 6)
    val fracs: Seq[(String, Column, Column => Column)] =
      Seq(
        ("dup_line_frac", elemFrac("dup_lines", "n_lines"), (c: Column) => c <= maxDupLineFrac),
        ("dup_line_char_frac", charFrac("dup_line_chars"), (c: Column) => c <= maxDupLineCharFrac),
        ("dup_para_frac", elemFrac("dup_paras", "n_paras"), (c: Column) => c <= maxDupParaFrac),
        ("dup_para_char_frac", charFrac("dup_para_chars"), (c: Column) => c <= maxDupParaCharFrac)) ++
      (2 to 4).map(n => (s"top${n}_char_frac", charFrac(s"top${n}_chars"),
        (c: Column) => c <= maxTopNgramCharFrac(n - 2))) ++
      (5 to 10).map { n =>
        val f = round(when(col(s"__rs.gram${n}_chars") > 0,
          dbl(col(s"__rs.dup${n}_chars")) / col(s"__rs.gram${n}_chars"))
          .otherwise(lit(0.0)), 6)
        (s"dup${n}_char_frac", f, (c: Column) => c <= maxDupNgramCharFrac(n - 5))
      }
    val named = base.select(Seq(col(idCol),
      col("__rs.n_lines").as("n_lines"), col("__rs.n_paras").as("n_paras")) ++
      fracs.map { case (name, c, _) => c.as(name) } ++ carry.map(col): _*)
    named.withColumn("keep",
      fracs.map { case (name, _, pred) => pred(col(name)) }.reduce(_ && _))
  }

  /**
   * Document fingerprint: md5 over the sorted distinct token set — a
   * canonical-form hash robust to word order, the cheap cousin of shingle
   * fingerprinting for exact-ish dedup.
   */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol)))))).as("fp"))

  /**
   * Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
   * local fingerprinting algorithm): hash every k-token gram, slide a
   * window of `w` gram-hashes, and select each window's minimum (ties to
   * the RIGHTMOST minimum — the paper's rule, which maximizes selection
   * reuse across overlapping windows). The selection guarantee: any two
   * documents sharing a token run of at least `w + k - 1` tokens share at
   * least one fingerprint VALUE, while only ~2/(w+1) of gram hashes are
   * kept — the standard code/corpus overlap-detection primitive.
   *
   * Documents with fewer than `k` tokens emit nothing; documents with
   * fewer than `k + w - 1` use the shrunken effective window (their
   * global minimum — one fingerprint), so every hashable doc is covered.
   * Hashes are the first 8 hex nibbles of md5(gram) — engine-replayable
   * (the [[hashSplit]] md5-prefix family), so the whole table
   * hash-checks against the DuckDB oracle.
   *
   * Scale shape: one shuffle-free array-HOF projection per document (the
   * [[truncateMiddle]] pattern) — gram hashing, window minima, and the
   * distinct-selection dedup all happen inside the row; only the selected
   * (pos, fp) pairs explode. Output: (id, pos, fp), pos 1-based over
   * grams.
   */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    // the whole selection (gram md5s, rightmost-min deque, distinct) runs
    // in ONE imperative codegen'd expression — the HOF formulation
    // evaluated O(grams·(k+w)) interpreted lambdas per document and
    // dominated q_winnow_overlap's runtime (see WinnowSelect's scaladoc);
    // values are bit-identical (spec + oracle pinned)
    val toks = filter(tokens(col(textCol)), t => t =!= lit(""))
    df.select(col(idCol),
        explode(graft.functions.WinnowSelect.winnowSelect(toks, k, w)).as("__s"))
      .select(col(idCol), col("__s.pos").as("pos"), col("__s.fp").as("fp"))
  }

  /**
   * 16-bit SimHash from per-token md5s. For each of the first 4 hex nibbles
   * of md5(token), each of its 4 bits votes +1/-1; the sign of the summed
   * vote per bit position forms the signature. Near-duplicate docs land on
   * signatures within small Hamming distance.
   *
   * Implemented as one explode + hash-agg (shuffle on doc id only; the
   * 16 bit-sums are map-side partial aggregates).
   */
  def simhash16(df: DataFrame, textCol: String, idCol: String): DataFrame =
    // narrow projection (see graft.functions.SimHash16 — bit-identical
    // to the exploded 16-vote aggregate, oracle-pinned), core-spread
    // first like [[simhash64]]
    graft.core.Spread.toCores(df.filter(col(textCol).isNotNull))
      .select(col(idCol),
        graft.functions.SimHash16.simhash16(tokens(col(textCol))).as("simhash"))

  /**
   * Shannon character entropy per document (bits): `-sum p_c * log2 p_c`
   * over the character distribution of the raw text. The
   * gibberish/encoded-blob detector that complements [[gopherRules]]'s
   * word-level checks — base64 walls and key dumps sit near the 6-bit
   * ceiling, repeated-character padding near 0, prose around 4.
   *
   * Computed as `log2(L) - (1/L) * sum c*log2(c)` over per-character
   * counts, which needs only the (doc, char) histogram: one explode +
   * two-level hash aggregate with map-side partial combine on (doc, char)
   * — rows ∝ total characters, shuffled rows ∝ distinct (doc, char)
   * pairs (≤ alphabet size per doc). Docs with empty text are dropped
   * (entropy of nothing is undefined). Output rounded to 1e-6.
   */
  def charEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ln2 = math.log(2.0)
    df.filter(length(col(textCol)) > 0)
      // split(_, "") keeps a trailing "" (Java split limit -1) — drop it
      .select(col(idCol),
        explode(array_remove(split(col(textCol), ""), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(
        log(sum(col("c")).cast("double")) / lit(ln2) -
          sum(col("c") * log(col("c").cast("double")) / lit(ln2)) /
            sum(col("c")).cast("double"), 6).as("entropy_bits"))
  }

  /**
   * FlashText-style dictionary tagging: count every occurrence of each
   * dictionary phrase (1..L words, lowercased, whitespace-normalized) in
   * every document — topic tagging, controlled-vocabulary filtering, and
   * the "does this doc mention one of our N thousand entities" gate.
   * Counts include overlapping matches (tagging semantics, not
   * longest-match extraction).
   *
   * Scale shape: the corpus emits its positional n-grams ONCE PER
   * DISTINCT PHRASE LENGTH (codegen'd `word_shingles_all` — one
   * imperative pass per doc, no shuffle) and each length stream
   * equi-joins the broadcast phrase list, so cost is
   * corpus_tokens × |distinct lengths|, independent of dictionary size;
   * the (doc, phrase) aggregate moves only matched pairs. This is the
   * decontaminate machinery pointed at a curated dictionary instead of
   * a held-out benchmark. Output: (idCol, keyword, n_hits).
   */
  def keywordTag(df: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty dictionary")
    val norm = phrases.map(_.toLowerCase.trim.split("\\s+").mkString(" ")).distinct
    require(norm.forall(_.nonEmpty), "blank dictionary phrase")
    val byLen = norm.groupBy(_.split(" ").length)
    val spark = df.sparkSession
    import spark.implicits._
    val streams = byLen.toSeq.sortBy(_._1).map { case (len, ps) =>
      val dict = broadcast(ps.toDF("keyword"))
      df.select(col(idCol),
          explode(graft.functions.WordShingles.wordShinglesAll(col(textCol), len))
            .as("__g"))
        .join(dict, col("__g") === col("keyword"))
        .select(col(idCol), col("keyword"))
    }
    streams.reduce(_ unionByName _)
      .groupBy(col(idCol), col("keyword"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /**
   * [[keywordTag]] for SMALL dictionaries (tens to a few thousand
   * entries), evaluated entirely row-locally: the dictionary rides the
   * plan as literals and each phrase's occurrence count is a
   * filter-count over the row's positional shingles — no join, no
   * aggregate, NO SHUFFLE AT ALL, which makes it legal (and
   * batch-identical) inside a streaming query where the join form's
   * post-join groupBy would force an aggregation mode. Same output
   * contract as [[keywordTag]]: (idCol, keyword, n_hits > 0 rows only).
   */
  def keywordTagSmall(df: DataFrame, textCol: String, idCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty dictionary")
    val norm = phrases.map(_.toLowerCase.trim.split("\\s+").mkString(" ")).distinct
    require(norm.forall(_.nonEmpty), "blank dictionary phrase")
    // one materialized shingle array per distinct length (computed once
    // per row, shared by every phrase of that length)
    val byLen = norm.groupBy(_.split(" ").length)
    val lens = byLen.keys.toSeq.sorted
    val withGrams = lens.foldLeft(df)((d, len) => d.withColumn(s"__g$len",
      graft.functions.WordShingles.wordShinglesAll(col(textCol), len)))
    val counted = lens.flatMap { len =>
      byLen(len).sorted.map(p => struct(lit(p).as("keyword"),
        size(filter(col(s"__g$len"), g => g === lit(p))).cast("long").as("n_hits")))
    }
    withGrams.select(col(idCol), explode(array(counted: _*)).as("__kw"))
      .select(col(idCol), col("__kw.keyword"), col("__kw.n_hits"))
      .filter(col("n_hits") > 0)
  }

  /**
   * Head+tail truncation (the "keep the opening and the conclusion"
   * long-document policy of SFT/eval prep, vs chunking which keeps
   * everything): docs over `headTokens + tailTokens` whitespace tokens
   * keep their first `headTokens` and last `tailTokens` with `marker`
   * spliced between; shorter docs pass through. Output text is
   * re-joined on single spaces on BOTH paths so the operator is
   * whitespace-normalizing and engine-replayable.
   *
   * Pure array HOFs over the token split — a shuffle-free codegen'd
   * projection, streaming-legal, nothing scales beyond the row.
   * Output: (idCol, trunc_text, n_tokens, n_dropped, truncated).
   */
  def truncateMiddle(df: DataFrame, textCol: String, idCol: String,
      headTokens: Int, tailTokens: Int,
      marker: String = "..."): DataFrame = {
    require(headTokens >= 1 && tailTokens >= 1, "head/tail must be >= 1")
    val ts = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val n = size(ts)
    val keep = lit(headTokens + tailTokens)
    val trunc = concat(
      array_join(slice(ts, 1, headTokens), " "),
      lit(" " + marker + " "),
      array_join(slice(ts, -tailTokens, tailTokens), " "))
    df.select(col(idCol),
      when(n > keep, trunc).otherwise(array_join(ts, " ")).as("trunc_text"),
      n.cast("long").as("n_tokens"),
      greatest(n - keep, lit(0)).cast("long").as("n_dropped"),
      (n > keep).as("truncated"))
  }

  /**
   * T5-style span corruption (Raffel et al. 2020 §3.1.4; the UL2 R-denoiser
   * of Tay et al. 2022): replace short token spans with numbered sentinel
   * tokens and emit the (input, target) pair a masked-denoising objective
   * trains on — input keeps the unmasked text with `<extra_id_b>` holes,
   * target lists each sentinel followed by the tokens it hides.
   *
   * The reference samplers draw span starts at random; this rebuild is
   * hash-derived so the SAME spans mask on every engine and run: the
   * document splits into consecutive blocks of `blockLen` = round(spanLen
   * / density) tokens, and block b masks the `spanLen`-token span at
   * offset md5(id + ":" + b) % (blockLen - spanLen + 1) — matching T5's
   * expectation (one mean-length span per 1/density tokens, i.e. a
   * `density` fraction of tokens masked) with bounded worst-case gap.
   * Trailing tokens beyond the last full block stay unmasked (T5 keeps
   * partial tails too). Docs shorter than one block pass through with
   * n_masked = 0 and an empty target.
   *
   * Scale shape: one shuffle-free array-HOF projection (the
   * [[fimTransform]] pattern): block offsets, hole splicing, and target
   * assembly all happen inside the row; sentinels are plan literals.
   * Output: (id, input_text, target_text, n_tokens, n_masked, n_spans).
   */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
      density: Double = 0.15, spanLen: Int = 3,
      sentinelPrefix: String = "<extra_id_"): DataFrame = {
    require(density > 0 && density < 1, "density in (0, 1)")
    require(spanLen >= 1, "spanLen >= 1")
    val blockLen = math.max(spanLen + 1, math.round(spanLen / density).toInt)
    val width = blockLen - spanLen + 1
    def sentinel(b: Column): Column = concat(lit(sentinelPrefix), b, lit(">"))
    val ts = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val base = df.select(col(idCol), ts.as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .withColumn("__nb", (col("__n") / lit(blockLen)).cast("long"))
    // per block b (0-based): masked span start (1-based absolute)
    val off = (b: Column) =>
      lit(1L) + b * blockLen +
        conv(substring(md5(concat(col(idCol).cast("string"), lit(":"), b)), 1, 4),
          16, 10).cast("long") % width
    val blocks = when(col("__nb") >= 1, sequence(lit(0L), col("__nb") - 1))
      .otherwise(array().cast("array<bigint>"))
    // input: for each block, kept-prefix ++ sentinel ++ kept-rest-of-block;
    // plus the unmasked tail after the last full block
    val inputParts = concat(
      flatten(transform(blocks, b => {
        val st = off(b)
        concat(
          slice(col("__ts"), b * blockLen + 1, st - (b * blockLen + 1)),
          array(sentinel(b)),
          slice(col("__ts"), st + spanLen, (b + 1) * blockLen - (st + spanLen) + 1))
      })),
      slice(col("__ts"), col("__nb") * blockLen + 1,
        col("__n") - col("__nb") * blockLen))
    val targetParts = flatten(transform(blocks, b =>
      concat(array(sentinel(b)), slice(col("__ts"), off(b), lit(spanLen)))))
    base.select(col(idCol),
      when(col("__nb") >= 1, array_join(inputParts, " "))
        .otherwise(array_join(col("__ts"), " ")).as("input_text"),
      when(col("__nb") >= 1, array_join(targetParts, " "))
        .otherwise(lit("")).as("target_text"),
      col("__n").as("n_tokens"),
      (col("__nb") * spanLen).as("n_masked"),
      col("__nb").as("n_spans"))
  }

  /**
   * Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
   * training of language models to fill in the middle"): reorder a
   * `rate` fraction of documents into PSM form — `<PRE> prefix <SUF>
   * suffix <MID> middle` — so an autoregressive LM learns infilling from
   * plain left-to-right training. Token-level splits; everything is
   * hash-derived (the [[hashSplit]] md5-prefix family), so the SAME docs
   * transform with the SAME cut points on every engine and run:
   *  - apply gate: md5(id + ":fim") 16-bit value < rate * 65536, and the
   *    doc has >= 3 tokens;
   *  - cuts c1, c2 = 1 + floor(h_salt * (n-1) / 65536) for salts ":a"
   *    and ":b" (each in [1, n-1]; prefix and suffix are never empty,
   *    the middle may be — the paper keeps those);
   *  - prefix = tokens[1..lo], middle = (lo..hi], suffix = (hi..n] with
   *    lo/hi = min/max(c1, c2). Untouched docs pass through (tokens
   *    re-joined single-spaced) with fim_applied = false.
   *
   * Scale shape: one shuffle-free narrow projection — the
   * [[truncateMiddle]] pattern; sentinels are plan literals.
   */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      rate: Double = 0.5, preTok: String = "<PRE>", sufTok: String = "<SUF>",
      midTok: String = "<MID>"): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0, 1]")
    def hv(salt: String): Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 4),
        16, 10).cast("long")
    val ts = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val base = df.select(col(idCol), ts.as("__ts"))
      .withColumn("__n", size(col("__ts")).cast("long"))
      .withColumn("__ap", hv(":fim") < lit(math.round(rate * 65536)) &&
        col("__n") >= 3)
      .withColumn("__c1", lit(1L) + floor(hv(":a") * (col("__n") - 1) / lit(65536)).cast("long"))
      .withColumn("__c2", lit(1L) + floor(hv(":b") * (col("__n") - 1) / lit(65536)).cast("long"))
      .withColumn("__lo", least(col("__c1"), col("__c2")))
      .withColumn("__hi", greatest(col("__c1"), col("__c2")))
    val psm = array_join(concat(
      array(lit(preTok)), slice(col("__ts"), lit(1), col("__lo")),
      array(lit(sufTok)), slice(col("__ts"), col("__hi") + 1, col("__n") - col("__hi")),
      array(lit(midTok)), slice(col("__ts"), col("__lo") + 1, col("__hi") - col("__lo"))),
      " ")
    base.select(col(idCol),
      when(col("__ap"), psm).otherwise(array_join(col("__ts"), " ")).as("fim_text"),
      col("__ap").as("fim_applied"),
      when(col("__ap"), col("__lo")).otherwise(col("__n")).as("n_prefix"),
      when(col("__ap"), col("__hi") - col("__lo")).otherwise(lit(0L)).as("n_middle"),
      when(col("__ap"), col("__n") - col("__hi")).otherwise(lit(0L)).as("n_suffix"))
  }

  /**
   * Jensen–Shannon divergence of each group's unigram distribution from
   * the corpus distribution (Lin 1991) — the symmetric, bounded
   * ([0, ln 2]) "how far is this source's language from the mix"
   * monitor: [[graft.ops.Select]]'s mixing weights move it, a crawl
   * source going off-distribution spikes it, and unlike PSI it needs no
   * binning and unlike KL it is finite when a source misses terms.
   *
   * Computed over the terms PRESENT in each group plus a closed-form
   * absent-mass correction: for a term the group lacks, p = 0 and the
   * M = q/2 midpoint makes its contribution exactly ½·q·ln 2 — so
   * JSD = ½Σ_present[p·ln(2p/(p+q)) + q·ln(2q/(p+q))] + ½·ln2·(1−Σ_present q),
   * and NO group×vocab outer join is ever materialized.
   *
   * `minDf` caps the vocabulary by global term count (rare terms carry
   * ~zero JSD mass but dominate the join width); probabilities are
   * renormalized over the kept vocabulary on both sides.
   *
   * Output: one row per group — group, n_tokens (kept-vocab tokens),
   * n_terms (distinct kept terms in the group), jsd, jsd_norm = jsd/ln2
   * (6 dp). Scale shape: one aggregate to (group, term), one to term
   * grain, an equi-join on term (vocab-sized), one aggregate to group
   * grain. Nothing document-grain crosses a shuffle after tokenize.
   */
  def jsDivergence(df: DataFrame, textCol: String, groupCol: String,
      minDf: Long = 1L): DataFrame = {
    require(minDf >= 1, "minDf must be >= 1")
    val tok = df.select(col(groupCol).as("group"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val global = tok.groupBy("term").agg(count(lit(1)).as("__ct"))
      .filter(col("__ct") >= minDf)
    val kept = tok.join(global, "term")
    val byGroup = kept.groupBy("group", "term")
      .agg(count(lit(1)).as("__cgt"), first(col("__ct")).as("__ct"))
    val all = Window.partitionBy()
    val wg = Window.partitionBy(col("group"))
    val scored = byGroup
      // total kept tokens: sum __ct once per term — attribute to the
      // first group row of each term
      .withColumn("__rt", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("group"))))
      .withColumn("__tg", sum(col("__cgt")).over(wg).cast("double"))
      .withColumn("__t",
        sum(when(col("__rt") === 1, col("__ct"))).over(all).cast("double"))
      .withColumn("__p", col("__cgt") / col("__tg"))
      .withColumn("__q", col("__ct") / col("__t"))
      .withColumn("__m", (col("__p") + col("__q")) / 2)
      .withColumn("__term_jsd",
        (col("__p") * log(col("__p") / col("__m")) +
          col("__q") * log(col("__q") / col("__m"))) / 2)
    scored.groupBy("group")
      .agg(sum(col("__cgt")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("__term_jsd")).as("__present"),
        sum(col("__q")).as("__qsum"))
      .select(col("group"), col("n_tokens"), col("n_terms"),
        round(col("__present") +
          (lit(1.0) - col("__qsum")) * lit(math.log(2.0) / 2), 6).as("jsd"),
        round((col("__present") +
          (lit(1.0) - col("__qsum")) * lit(math.log(2.0) / 2)) /
          lit(math.log(2.0)), 6).as("jsd_norm"))
  }
}

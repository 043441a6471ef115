package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance fuzzy matching with length blocking — the record-linkage /
 * fuzzy-dedup step of entity-resolution pipelines (near-identical product
 * names, author strings, typo'd titles). Reference analogue: the
 * categorical-value consolidation CASPR leaves to upstream cleaning
 * (`caspr/utils/spark/preprocess.py` caps cardinality but never merges
 * near-duplicate values); this operator closes that gap Spark-first.
 *
 * Scale shape: the naive formulation is an O(n²) cross join. Because
 * `levenshtein(a, b) <= d` implies `|len(a) - len(b)| <= d`, blocking on
 * string LENGTH is lossless: the probe side emits one copy per candidate
 * length in `[len - d, len + d]` (a fixed 2d+1 fan-out, d is small) and the
 * join becomes a hash equi-join on the length key — each true pair meets on
 * EXACTLY one key (the build row's own length), so no post-join dedup is
 * needed. At corpus scale the quadratic work only survives WITHIN a length
 * class; real-world name-length histograms spread mass across dozens of
 * classes, and a skewed class is AQE-splittable since the join is a plain
 * shuffle join. `levenshtein` is Spark's codegen'd built-in (same dynamic
 * program DuckDB runs, hence oracle-checkable).
 */
object Fuzzy {

  /**
   * All pairs (a from `left`, b from `right`) with
   * `levenshtein(a, b) <= maxDist`, length-blocked. Output:
   * `(name_a, name_b, dist)` — one row per distinct value pair.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8, s"maxDist must be in [1, 8], got $maxDist")
    val a = left.select(col(leftCol).as("name_a")).distinct()
      .withColumn("_blk", length(col("name_a")))
    val b = right.select(col(rightCol).as("name_b")).distinct()
      .withColumn("_blk", explode(sequence(
        length(col("name_b")) - maxDist, length(col("name_b")) + maxDist)))
    a.join(b, "_blk")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist")
  }

  /**
   * Near-duplicate value pairs within one column (self fuzzy-join,
   * canonical `name_a < name_b` orientation so each unordered pair
   * appears once).
   */
  def fuzzyPairs(df: DataFrame, keyCol: String, maxDist: Int): DataFrame =
    fuzzyJoin(df, df, keyCol, keyCol, maxDist)
      .filter(col("name_a") < col("name_b"))

  /**
   * Near-duplicate value pairs via SYMMETRIC-DELETE blocking (Garbe's
   * SymSpell): every distinct value emits itself plus its delete-1
   * (and, for maxDist 2, delete-2) variants as blocking keys; any two
   * strings within edit distance d share at least one key, so the
   * candidate set is exact — candidates then verify with one
   * levenshtein. Same output contract as [[fuzzyPairs]] (and
   * spec-checked EQUAL to it): `(name_a, name_b, dist)`, canonical
   * `name_a < name_b`.
   *
   * This is the UNIFORM-LENGTH antidote: [[fuzzyPairs]] blocks on
   * length, which degenerates to ONE block when every key has the same
   * length — 15k same-length ids meant 225M candidate levenshteins;
   * deletion keys block on CONTENT (~L keys per value at d=1,
   * ~L²/2 at d=2, with L capped at `prefixLen` by TWO-WINDOW SymSpell
   * truncation — untagged first-P and last-P windows — so long keys
   * cannot blow up the key table AND a shared prefix cannot collapse
   * the blocking), so candidates are only pairs that actually share a
   * near-identical spelling. `maxBucket` caps pathological key groups
   * (the shingle-df-cap family — a bucket that large means a degenerate
   * id scheme, and its pairs still surface via their other keys unless
   * every shared key is hot); the cap is counted with a groupBy
   * (partial agg below the exchange) and applied as a broadcast
   * anti-join of the tiny over-cap key list — the r11-hardened shape,
   * never a window that would funnel a hot key's occurrence list into
   * one task.
   */
  def fuzzyPairsDeletes(df: DataFrame, keyCol: String, maxDist: Int,
      maxBucket: Int = 10000, prefixLen: Int = 24): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"symmetric-delete blocking supports maxDist 1..2, got $maxDist")
    require(prefixLen > 2 * maxDist,
      s"prefixLen must exceed 2*maxDist, got $prefixLen")
    val values = df.select(col(keyCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
    val s = col("name")
    // TWO-WINDOW SymSpell truncation: deletion keys derive from the
    // FIRST `prefixLen` chars and (for longer values) the LAST
    // `prefixLen` chars, tagged per window. Full-string keys would emit
    // ~V^2/2 keys of ~V bytes at d=2 (quadratic rows, CUBIC bytes —
    // catastrophic on document text); one window alone is bounded but
    // COLLAPSES on shared-prefix corpora (URL-style ids: every true
    // pair's keys derive from the common prefix, so the whole group
    // lands in maxBucket-hot buckets and pairs are dropped). Two
    // windows keep the bound (<= P^2 keys of <= P bytes) AND the
    // discriminating content: any single edit touches at most one
    // window in its own alignment (front = left-aligned, back =
    // right-aligned), so a pair within distance d shares either an
    // untouched window's self-key or a <=d-deletion key of the edited
    // window — the standard SymSpell argument per window. When a
    // shared-prefix group makes the FRONT buckets hot, the cap drops
    // them and the BACK keys still carry every true pair (and vice
    // versa); only a corpus hot in BOTH windows at once (> 2P-char
    // strings differing only in the middle) degrades, which is the
    // documented residual. The levenshtein verification filters the
    // extra candidates truncation admits.
    def windowKeys(win: Column): Column = {
      val L = length(win)
      def del1(str: Column, len: Column): Column =
        transform(sequence(lit(1), len),
          i => concat(str.substr(lit(1), i - 1), str.substr(i + 1, len)))
      val d1 = when(L >= 1, del1(win, L))
        .otherwise(array().cast("array<string>"))
      // delete-2: remove positions i < j in one expression pass
      val d2 =
        if (maxDist < 2) array().cast("array<string>")
        else when(L >= 2, flatten(transform(sequence(lit(1), L - 1), i =>
          transform(sequence(i + 1, L), j =>
            concat(win.substr(lit(1), i - 1),
              win.substr(i + 1, j - i - 1),
              win.substr(j + 1, L))))))
          .otherwise(array().cast("array<string>"))
      concat(array(win), d1, d2)
    }
    val front = windowKeys(s.substr(lit(1), lit(prefixLen)))
    // back keys emit UNCONDITIONALLY (for a value <= P chars the back
    // window IS the whole value, and the shared array_distinct below
    // collapses the duplicate set — short values pay NOTHING): a short
    // value in a shared-prefix corpus would otherwise have only
    // hot-capped front keys while its longer near-duplicates carry
    // discriminating back keys. Keys are deliberately UNTAGGED so a
    // short value's whole-string keys can meet a long value's
    // back-window keys; cross-window coincidences only ADD candidates,
    // which the levenshtein verification filters and maxBucket caps.
    val back = windowKeys(
      s.substr(greatest(length(s) - prefixLen + 1, lit(1)),
        lit(prefixLen)))
    val keyed = values
      .select(s, explode(array_distinct(concat(front, back))).as("__k"))
    // hot-key cap: groupBy-count (a hot deletion key pre-combines map-side,
    // never funneling its full occurrence list into one task) + broadcast
    // anti-join of the over-cap list (≤ totalKeys/maxBucket entries by
    // construction). Exchange reuse dedupes the shared distinct+explode
    // subtree between the count branch and the join branch at runtime.
    val overCap = keyed.groupBy(col("__k"))
      .agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") > maxBucket)
      .select(col("__k"))
    val capped = keyed.join(broadcast(overCap), Seq("__k"), "left_anti")
      .select(col("name"), col("__k"))
    val a = capped.select(col("name").as("name_a"), col("__k"))
    val b = capped.select(col("name").as("name_b"), col("__k"))
    a.join(b, "__k")
      .filter(col("name_a") < col("name_b"))
      .select("name_a", "name_b").distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
  }

  /**
   * Fuzzy consolidation: map every distinct value to the canonical
   * (lexicographically minimum) representative of its near-duplicate
   * cluster — single-link over [[fuzzyPairs]] edges, components resolved
   * by the SAME min-label propagation the document pipeline uses
   * ([[Dedup.dedupGroups]] is value-type-agnostic). Singletons map to
   * themselves via the left join + coalesce, so the output is a total
   * `(name, canon)` mapping ready to apply as a broadcast replace join.
   */
  def canonicalize(df: DataFrame, keyCol: String, maxDist: Int): DataFrame = {
    val values = df.select(col(keyCol).as("name")).distinct()
    val groups = Dedup.dedupGroups(fuzzyPairs(df, keyCol, maxDist),
      aCol = "name_a", bCol = "name_b")
      .select(col("doc_id").as("name"), col("canonical_id"))
    values.join(groups, Seq("name"), "left")
      .select(col("name"), coalesce(col("canonical_id"), col("name")).as("canon"))
  }

  /**
   * Fellegi–Sunter record-linkage scoring (Fellegi & Sunter 1969, the
   * probabilistic-matching standard behind every serious MDM/ER
   * system): given candidate pairs with per-field agreement flags and
   * DECLARED (m, u) probabilities per field — m = P(agree | match),
   * u = P(agree | non-match), from labeled data or domain priors — the
   * match weight is Σ over fields of ln(m/u) on agreement and
   * ln((1−m)/(1−u)) on disagreement (null agreement contributes 0, the
   * standard missing-field convention), classified against the
   * (lower, upper) decision bounds into 'non_match' / 'possible' /
   * 'match'.
   *
   * Deliberately the DECLARED-parameter form, not EM: deterministic,
   * oracle-checkable, and what production linkage runs once m/u are
   * calibrated; the per-field log-weights are computed HERE (one JVM)
   * and exposed via [[fsWeights]] so an external oracle applies the
   * identical literals — no libm ln in the data path, the
   * [[graft.ops.Experiment.sprt]] contract.
   *
   * Scale shape: a narrow projection over the candidate-pair stream —
   * the expensive part is pair GENERATION, which stays with the capped
   * blocking joins ([[fuzzyPairs]], [[Dedup]] LSH). Composes:
   * fuzzyPairs → attribute join → fsScore → [[Dedup.dedupGroups]] on
   * the accepted matches → [[goldenRecord]].
   */
  def fsScore(pairs: DataFrame, fields: Seq[(String, Double, Double)],
      lower: Double, upper: Double): DataFrame = {
    require(lower <= upper, "need lower <= upper")
    val ws = fsWeights(fields)
    val weight = fields.zip(ws).map { case ((c, _, _), (wa, wd)) =>
      when(col(c) === true, lit(wa))
        .when(col(c) === false, lit(wd))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    pairs.withColumn("fs_weight", round(weight, 6))
      .withColumn("fs_class",
        when(col("fs_weight") >= upper, lit("match"))
          .when(col("fs_weight") < lower, lit("non_match"))
          .otherwise(lit("possible")))
  }

  /** The per-field (agree, disagree) log-weights of [[fsScore]] —
    * shared with external oracles so both engines sum identical
    * literals. */
  def fsWeights(fields: Seq[(String, Double, Double)]): Seq[(Double, Double)] = {
    fields.foreach { case (c, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"field $c: need 0 < u < m < 1")
    }
    fields.map { case (_, m, u) =>
      (math.log(m / u), math.log((1 - m) / (1 - u)))
    }
  }

  /**
   * Golden-record survivorship: collapse the duplicate rows of an
   * entity into ONE canonical row with per-field conflict resolution —
   * the merge step that follows [[canonicalize]] / [[Dedup.dedupGroups]]
   * in an MDM pipeline. Two policies:
   *  - `recencyFields`: the latest NON-NULL value by (`tsCol`,
   *    `tiebreakCol`) wins — stale rows fill gaps but never overwrite
   *    fresher data;
   *  - `majorityFields`: the most frequent non-null value wins, ties
   *    broken by the smallest value (deterministic mode).
   * Output: `entityCol`, every resolved field (original names), and
   * `n_records` merged. Null only when the field is null across ALL of
   * the entity's records.
   *
   * Scale shape: recency resolves in ONE groupBy(entity) pass — each
   * field is a max over a (ts, tiebreak, value) struct whose null-value
   * rows sort first (struct ordering is field-lexicographic, nulls
   * smallest), so no window and no second shuffle; majority fields each
   * add a (entity, value)-grain count + a per-entity max-struct pick,
   * joined back on entity. All joins are entity-grain (post-agg, small).
   */
  def goldenRecord(df: DataFrame, entityCol: String, tsCol: String,
      tiebreakCol: String, recencyFields: Seq[String],
      majorityFields: Seq[String] = Nil): DataFrame = {
    require(recencyFields.nonEmpty || majorityFields.nonEmpty,
      "need at least one field to resolve")
    val recencyAggs = recencyFields.map { f =>
      max(struct(
        when(col(f).isNotNull, col(tsCol)).as("t"),
        when(col(f).isNotNull, col(tiebreakCol)).as("k"),
        col(f).as("v"))).getField("v").as(f)
    }
    val base = df.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_records"), recencyAggs: _*)
    majorityFields.foldLeft(base) { (acc, f) =>
      // (entity, value) counts, then min value among max-count rows —
      // the counts subtree appears twice but is one ReusedExchange.
      val counts = df.filter(col(f).isNotNull)
        .groupBy(col(entityCol), col(f)).agg(count(lit(1)).as("__c"))
      val top = counts.groupBy(col(entityCol)).agg(max(col("__c")).as("__mx"))
      val pick = counts.join(top, Seq(entityCol))
        .filter(col("__c") === col("__mx"))
        .groupBy(col(entityCol)).agg(min(col(f)).as(f))
      acc.join(pick, Seq(entityCol), "left")
    }
  }
}

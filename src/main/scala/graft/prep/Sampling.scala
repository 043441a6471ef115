package graft.prep

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/**
 * Splits and class-balance sampling (SURVEY.md §2.G).
 */
object Sampling {

  /** G3/G4 train/val/test random split by fractions (reference split_data,
    * preprocess.py:324-337; sklearn twin at data/load.py:69). */
  def split(df: DataFrame, fractions: Seq[Double], seed: Long = 42L): Array[DataFrame] = {
    require(math.abs(fractions.sum - 1.0) < 1e-9, "fractions must sum to 1")
    df.randomSplit(fractions.toArray, seed)
  }

  /**
   * G5 TRUE SMOTE-NC (reference smote(), preprocess.py:365-385 — imblearn
   * SMOTENC with `auto` strategy): every non-majority class is topped up to
   * the majority count with SYNTHETIC rows. Recipe per synthetic row,
   * exactly imblearn's:
   *  - pick a random minority row x; find its k nearest minority
   *    neighbors under SMOTENC's mixed metric: squared Euclidean over the
   *    continuous features plus `med²` per mismatched categorical, where
   *    `med` is the median of the per-continuous-feature standard
   *    deviations within the class;
   *  - continuous features: x + U(0,1) · (z − x) for one random neighbor z
   *    (per-feature lerp — the synthetic point lies on the segment);
   *  - categorical features: the MOST FREQUENT category among the k
   *    neighbors (ties broken toward the nearer neighbor — deterministic;
   *    imblearn breaks ties by value order, a wash for unordered cats).
   *
   * Distributed shape: k-NN is quadratic, so the class is hash-assigned
   * (content hash, so membership is reproducible) into blocks of ~4k
   * expected rows and neighbors are searched WITHIN the block
   * (locality-approximate k-NN — the standard distributed-SMOTE
   * tradeoff; at small class sizes there is one block and the result is
   * exact imblearn semantics). One light counting job sizes per-block
   * synthesis quotas by largest-remainder apportionment, so the output
   * class counts equal the majority count EXACTLY. All randomness is
   * (seed, block, class)-derived — deterministic re-runs.
   *
   * Output columns: catCols (original types) ++ contCols (as double) ++
   * labelCol; original rows pass through, synthetic rows appended.
   * A single-row class degenerates to replication (no neighbors exist).
   */
  def smoteNC(df: DataFrame, labelCol: String, catCols: Seq[String],
      contCols: Seq[String], k: Int = 5, seed: Long = 42L,
      maxBlock: Int = 4096): DataFrame = {
    val base = df.select(
      (catCols.map(col) ++ contCols.map(c => col(c).cast("double").as(c))
        :+ col(labelCol)): _*)
    val schema = base.schema
    val enc = Encoders.row(schema)
    val counts = base.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.getLong(1)))
    require(counts.nonEmpty, "smoteNC: empty input")
    val maxN = counts.map(_._2).max
    val nCat = catCols.size
    val nCont = contCols.size
    val spark = df.sparkSession

    val synthetic = counts.filter(_._2 < maxN).map { case (label, n) =>
      val need = maxN - n
      val cls = base.filter(col(labelCol) <=> lit(label))
      // med: median of within-class cont stddevs (the SMOTENC cat penalty).
      // stddev_pop, not _samp: imblearn computes np.std(ddof=0) over the
      // class (SMOTENC.fit_resample), and an inflated penalty can flip
      // neighbor selection at small class sizes.
      val med =
        if (nCont == 0) 1.0
        else {
          val devs = cls.select(contCols.map(c => stddev_pop(col(c))): _*)
            .head().toSeq.map {
              case d: java.lang.Double if !d.isNaN => d.doubleValue()
              case _ => 0.0
            }.sorted
          val m = devs.size
          if (m == 0) 1.0
          else if (m % 2 == 1) devs(m / 2)
          else (devs(m / 2 - 1) + devs(m / 2)) / 2
        }
      val nBlocks = math.max(1, ((n + maxBlock - 1) / maxBlock).toInt)
      // block id = content hash of the row (NOT a physical partition id:
      // stage-level partition numbering shifts under union/AQE, and
      // shuffle-fetch order is nondeterministic — a content-derived block
      // makes membership, quotas and draws reproducible run-to-run)
      val withBlock = cls.withColumn("__block",
        pmod(xxhash64((schema.fieldNames.toIndexedSeq.map(col) :+ lit(seed)): _*),
          lit(nBlocks.toLong)).cast("int"))
      // per-block row counts -> largest-remainder quotas summing to `need`
      val blockCounts = withBlock.groupBy(col("__block"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val exact = blockCounts.map { case (b, c) => (b, need.toDouble * c / n) }
      val floors = exact.map { case (b, e) => (b, e.toLong) }
      var rem = need - floors.map(_._2).sum
      val quotas = scala.collection.mutable.LinkedHashMap(floors.toIndexedSeq: _*)
      // distribute the remainder by descending fractional part (id tiebreak)
      for ((b, _) <- exact.sortBy { case (b, e) => (-(e - e.toLong), b) }
           if rem > 0) { quotas(b) += 1; rem -= 1 }
      val quotasB = spark.sparkContext.broadcast(quotas.toMap)
      val labelSalt = if (label == null) 0L else label.hashCode.toLong
      val blockIdx = nCat + nCont + 1 // __block appended after label

      withBlock.repartition(nBlocks, col("__block")).mapPartitions { it =>
        // a physical partition may hold several hash-blocks; synthesize
        // per block with block-seeded RNG over a canonically-sorted array
        it.toArray.groupBy(_.getInt(blockIdx)).iterator.flatMap {
          case (block, unsorted) =>
            val rows = unsorted.sortBy(r => (r.hashCode, r.toString))
            val quota = quotasB.value.getOrElse(block, 0L)
            if (rows.isEmpty || quota == 0L) Iterator.empty
            else {
              val rng = new java.util.Random(
                seed * 1000003L + block * 7919L + labelSalt)
              val cont = rows.map(r => Array.tabulate(nCont) { j =>
                if (r.isNullAt(nCat + j)) 0.0 else r.getDouble(nCat + j) })
              val m2 = med * med
              (0L until quota).iterator.map { _ =>
                val i = rng.nextInt(rows.length)
                if (rows.length == 1) // degenerate: replicate (sans __block)
                  Row.fromSeq(rows(0).toSeq.dropRight(1))
                else {
                  val xs = cont(i)
                  // k nearest in-block neighbors under the SMOTENC metric
                  val nb = (rows.indices.filter(_ != i).map { j =>
                    var d2 = 0.0
                    val zs = cont(j)
                    var c = 0
                    while (c < nCont) { val dlt = xs(c) - zs(c); d2 += dlt * dlt; c += 1 }
                    c = 0
                    while (c < nCat) {
                      if (rows(i).get(c) != rows(j).get(c)) d2 += m2
                      c += 1
                    }
                    (d2, j)
                  }).sorted.take(math.min(k, rows.length - 1)).map(_._2)
                  val z = cont(nb(rng.nextInt(nb.length)))
                  val gap = rng.nextDouble()
                  val contVals = Array.tabulate(nCont)(c => xs(c) + gap * (z(c) - xs(c)))
                  // cat: most frequent among the k neighbors, nearer-first ties
                  val catVals = Array.tabulate(nCat) { c =>
                    val freq = scala.collection.mutable.LinkedHashMap[Any, Int]()
                    nb.foreach { j =>
                      val v = rows(j).get(c)
                      freq(v) = freq.getOrElse(v, 0) + 1
                    }
                    freq.maxBy(_._2)._1 // LinkedHashMap: first-inserted wins ties
                  }
                  Row.fromSeq((catVals ++ contVals.map(_.asInstanceOf[Any]))
                    .toIndexedSeq :+ rows(i).get(nCat + nCont))
                }
              }
            }
        }
      }(enc)
    }

    synthetic.foldLeft(base)(_ unionByName _)
  }

  /**
   * G5 scale-friendly class rebalance (the lightweight alternative to
   * [[smoteNC]] — SURVEY §7.3):
   *  - stratified up-sampling with replacement to equalize class counts
   *    (sampleBy with per-class fractions), and
   *  - class weights (weightCol for MLlib heads).
   */
  def oversampleMinority(df: DataFrame, labelCol: String, seed: Long = 42L): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    val maxN = counts.values.max
    counts.foldLeft(df.limit(0)) { case (acc, (label, n)) =>
      val cls = df.filter(col(labelCol) <=> lit(label))
      val up = if (n >= maxN) cls
        else cls.union(cls.sample(withReplacement = true, (maxN - n).toDouble / n, seed))
      acc.unionByName(up)
    }
  }

  /** Per-row class weight column: weight = total / (nClasses * classCount). */
  def withClassWeights(df: DataFrame, labelCol: String,
      weightCol: String = "class_weight"): DataFrame = {
    val counts = df.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val total = df.count().toDouble
    val k = counts.count().toDouble
    df.join(broadcast(counts), Seq(labelCol))
      .withColumn(weightCol, lit(total) / (lit(k) * col("n"))).drop("n")
  }

  /**
   * Deterministic weighted sample WITHOUT replacement: the Gumbel top-k
   * trick (key = ln w + Gumbel noise; the arg-top-k IS a weighted draw
   * without replacement, P(pick) ∝ weight) with a CONTENT-DERIVED
   * uniform — the salted-md5 family of [[graft.ops.Text.hashSplit]] —
   * instead of an RNG, so re-runs, retries and engines agree
   * row-for-row. This is [[graft.ops.Dsir]]'s selection mechanism
   * exposed standalone: "subsample the corpus ∝ quality score"
   * without the importance-LM machinery.
   *
   * Keys are rounded to 6 dp before ranking with an id tiebreak, so the
   * cut is engine-stable (`q_weighted_sample` hash-matches). Selection
   * is invariant under weight RESCALING (ln(c·w) shifts every key
   * equally — spec-pinned), exactly as a ∝-sampler must be. `weightCol`
   * must be strictly positive; top-k compiles to
   * TakeOrderedAndProject (per-partition heap, no global sort).
   */
  def weightedTake(df: DataFrame, idCol: String, weightCol: String, k: Int,
      salt: String = "wtake"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit("#" + salt))), 1, 4), 16, 10).cast("long").cast("double")
    val u = (h + lit(0.5d)) / lit(65536.0d)
    df.withColumn("sel_key",
        round(log(col(weightCol).cast("double")) - log(-log(u)), 6))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(k)
  }
}

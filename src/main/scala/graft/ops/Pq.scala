package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou et al. 2011) for embedding compression and
 * asymmetric-distance (ADC) similarity search — the missing tier between
 * the exact paths ([[Vectors.bruteTopK]], [[IvfIndex]]) and 100 TB: a
 * d-dim float vector (d×4 bytes) compresses to m small integer codes
 * (m bytes at k ≤ 256), so a billion-vector corpus fits in cluster memory
 * and an ANN scan reads codes, never raw vectors.
 *
 * All operator math is pure Catalyst (the codebook rides the plan as
 * literal arrays, per-subspace argmin and ADC lookups are codegen'd
 * zip_with/aggregate folds — same pattern as [[IvfIndex]]'s probe); the
 * only Scala-side compute is the per-subspace KMeans fit in [[Pq.fit]].
 *
 * Composition: IVF-PQ = [[IvfIndex]] cell probe to shortlist, ADC over
 * the shortlist's codes to rank — both sides stay equi-joins.
 */
final case class PqCodebook(centroids: Array[Array[Array[Double]]]) {
  /** m subspaces × k codes × (d/m) dims. */
  val m: Int = centroids.length
  val k: Int = centroids.head.length
  val subDim: Int = centroids.head.head.length
  require(centroids.forall(s => s.length == k && s.forall(_.length == subDim)),
    "ragged codebook")

  /** Squared L2 between `vec`'s j-th subvector and centroid (j, c) — a
    * codegen'd one-pass [[graft.functions.VecL2Sq]] expression with the
    * SAME accumulation order (left-to-right squared-diff sum) as the HOF
    * fold and the oracle replay, so results are bit-identical and argmin
    * ties break identically (encode evaluates this m×k times per row). */
  private[ops] def subDist2(vec: Column, j: Int, c: Int): Column =
    graft.functions.VecL2Sq.vecL2Sq(
      slice(vec, j * subDim + 1, subDim),
      array(centroids(j)(c).map(lit).toIndexedSeq: _*))

  /** Nearest-code id for subspace j (min distance, code-id tiebreak). */
  private[ops] def subCode(vec: Column, j: Int): Column =
    element_at(array_sort(array((0 until k).map(c =>
      struct(subDist2(vec, j, c).as("d2"), lit(c).as("code"))): _*)), 1)
      .getField("code")
}

object Pq {

  /**
   * Fit a codebook: one KMeans per subspace over the corpus's sliced
   * subvectors (m small driver-coordinated jobs at fit time — queries
   * never re-cluster). k ≤ 256 keeps one code per byte.
   */
  def fit(corpus: DataFrame, m: Int, k: Int,
      vecCol: String = "embedding", seed: Long = 42L): PqCodebook = {
    import org.apache.spark.ml.clustering.KMeans
    val d = corpus.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    val cents = (0 until m).map { j =>
      val feats = corpus.select(
        org.apache.spark.ml.functions.array_to_vector(
          slice(col(vecCol), j * sub + 1, sub).cast("array<double>"))
          .as("features"))
      new KMeans().setK(k).setSeed(seed + j).setFeaturesCol("features")
        .fit(feats).clusterCenters.map(_.toArray)
    }
    PqCodebook(cents.toArray)
  }

  /** Deterministic data-derived codebook: code i of subspace j is the j-th
    * subvector of the corpus row with id `codeIds(i)` (no clustering —
    * exists so the full encode/ADC arithmetic is engine-replayable; real
    * deployments use [[fit]]). */
  def codebookFromRows(corpus: DataFrame, idCol: String, vecCol: String,
      codeIds: Seq[Long], m: Int): PqCodebook = {
    val rows = corpus.filter(col(idCol).isin(codeIds: _*))
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val d = rows.values.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    PqCodebook((0 until m).map(j =>
      codeIds.map(id => rows(id).slice(j * sub, j * sub + sub)).toArray).toArray)
  }

  /** Persist a fitted codebook — the [[IvfIndex.save]] pattern for the
    * PQ tier: fit offline once, [[loadCodebook]] per serving session.
    * One (subspace, code, centroid) row per entry. */
  def save(cb: PqCodebook, spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import spark.implicits._
    (for (j <- 0 until cb.m; c <- 0 until cb.k)
      yield (j, c, cb.centroids(j)(c).toSeq))
      .toDF("j", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def loadCodebook(spark: org.apache.spark.sql.SparkSession,
      dir: String): PqCodebook = {
    val rows = spark.read.parquet(dir).orderBy("j", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    PqCodebook((0 until m).map(j =>
      rows.filter(_.getInt(0) == j).sortBy(_.getInt(1))
        .map(_.getSeq[Double](2).toArray)).map(_.toArray).toArray)
  }

  /** Encode vectors to m-byte codes: (id, codes array<int>). This is the
    * compressed corpus representation — ~(4d)/m× smaller than the floats. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: PqCodebook): DataFrame =
    df.select(col(idCol),
      array((0 until cb.m).map(j => cb.subCode(col(vecCol), j)): _*).as("codes"))

  /**
   * Asymmetric-distance top-k: each query's exact subvectors against the
   * corpus's codes — distance ≈ Σ_j d²(q_j, centroid[j][codes_j]). The
   * query side precomputes its m×k distance table once per query row and
   * is broadcast; the corpus side streams codes only (the PQ scan). Output
   * ranks ascending by approximate distance, corpus-id tiebreak.
   */
  def adcTopK(queries: DataFrame, qId: String,
      corpusCodes: DataFrame, cId: String,
      cb: PqCodebook, k: Int, vecCol: String = "embedding"): DataFrame = {
    // m×k lookup table as one nested literal-driven expression per query
    val qTab = array((0 until cb.m).map(j =>
      array((0 until cb.k).map(c => cb.subDist2(col(vecCol), j, c)): _*)): _*)
    val q = queries.select(col(qId), qTab.as("_qtab"))
    val joined = broadcast(q).crossJoin(corpusCodes)
    val ad2 = (0 until cb.m).map(j =>
      element_at(element_at(col("_qtab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col(qId)).orderBy(col("ad2").asc, col(cId).asc)
    joined.select(col(qId), col(cId), round(ad2, 6).as("ad2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("ad2"), col("rnk").cast("long").as("rnk"))
  }

  /**
   * IVF-PQ: the billion-scale composition — the [[IvfIndex]] coarse
   * quantizer shortlists nProbe cells per query (equi-join on cell, no
   * corpus scan), and ADC ranks the shortlist from codes alone. The
   * corpus side of the join carries (id, cell, codes): a few bytes per
   * vector, so the shuffled/broadcast working set is the compressed
   * index, never the raw floats. At nProbe = nCells this equals
   * [[adcTopK]] exactly (spec-pinned), the same equivalence argument the
   * IVF-Flat oracle uses.
   */
  /** Residual of each assigned vector from its cell centroid — the input
    * PQ quantizes in residual IVF-PQ. Pure `zip_with`; the centroid matrix
    * rides the plan as literals indexed by the row's cell. */
  def residuals(assigned: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val centsLit = array(centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    assigned.withColumn("residual",
      zip_with(col(vecCol).cast("array<double>"),
        element_at(centsLit, col("cell") + 1), (x, c) => x - c))
  }

  /**
   * RESIDUAL IVF-PQ (the canonical FAISS IVFADC structure): the corpus is
   * coarsely quantized by the IVF centroids, PQ encodes each vector's
   * RESIDUAL from its centroid, and at query time the ADC table is built
   * from the QUERY'S residual against each probed cell's centroid — so
   * the fine quantizer only has to cover the (much tighter) residual
   * distribution, the standard accuracy win over [[ivfAdcTopK]]'s
   * raw-vector encoding. ad2 ≈ ||q − centroid_cell − dec(codes)||².
   *
   * Scale shape: identical to [[ivfAdcTopK]] — queries (with their
   * per-probed-cell m×k tables) broadcast, corpus streams (cell, codes)
   * only; the residual arithmetic is m×k extra codegen'd subtractions per
   * (query, probe), nothing per corpus row.
   */
  def ivfAdcResidualTopK(queries: DataFrame, qId: String, ivf: IvfIndex,
      codes: DataFrame, cId: String, cb: PqCodebook, k: Int, nProbe: Int,
      vecCol: String = "embedding"): DataFrame = {
    val centsLit = array(ivf.centroids.map(c =>
      array(c.map(lit).toIndexedSeq: _*)).toIndexedSeq: _*)
    val probes = ivf.probe(queries, nProbe, qId)
    val qres = zip_with(col(vecCol).cast("array<double>"),
      element_at(centsLit, col("cell") + 1), (x, c) => x - c)
    val q = queries.join(probes, qId)
      .select(col(qId), col("cell"),
        array((0 until cb.m).map(j =>
          array((0 until cb.k).map(c2 => cb.subDist2(qres, j, c2)): _*)): _*)
          .as("_qtab"))
    val corpus = ivf.assigned.select(col(ivf.cId).as(cId), col("cell"))
      .join(codes, cId)
    val ad2 = (0 until cb.m).map(j =>
      element_at(element_at(col("_qtab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col(qId)).orderBy(col("ad2").asc, col(cId).asc)
    broadcast(q).join(corpus, Seq("cell"))
      .select(col(qId), col(cId), round(ad2, 6).as("ad2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("ad2"), col("rnk").cast("long").as("rnk"))
  }

  def ivfAdcTopK(queries: DataFrame, qId: String, ivf: IvfIndex,
      corpusCodes: DataFrame, cId: String, cb: PqCodebook,
      k: Int, nProbe: Int, vecCol: String = "embedding"): DataFrame = {
    val qTab = array((0 until cb.m).map(j =>
      array((0 until cb.k).map(c => cb.subDist2(col(vecCol), j, c)): _*)): _*)
    val probes = ivf.probe(queries, nProbe, qId)
    val q = queries.select(col(qId), qTab.as("_qtab"))
      .join(probes, qId)
    val corpus = ivf.assigned.select(col(ivf.cId).as(cId), col("cell"))
      .join(corpusCodes, cId)
    val ad2 = (0 until cb.m).map(j =>
      element_at(element_at(col("_qtab"), j + 1),
        element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col(qId)).orderBy(col("ad2").asc, col(cId).asc)
    broadcast(q).join(corpus, Seq("cell"))
      .select(col(qId), col(cId), round(ad2, 6).as("ad2"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("ad2"), col("rnk").cast("long").as("rnk"))
  }
}

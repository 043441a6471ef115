package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (SURVEY.md §7.5):
 * brute-force cosine top-k (exact baseline), sign-LSH bucketing (the scale
 * path), and cosine near-duplicate pairs.
 *
 * Embeddings are `array<float>`; all arithmetic is promoted to double via
 * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs,
 * no MLlib Vector conversion on the hot path.
 */
object Vectors {

  /** Sequential-fold dot product in double precision (HOF formulation;
    * kept as the readable reference — the hot path uses [[cosine]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the codegen'd [[graft.functions.VecCosine]] expression:
    * one imperative pass per pair instead of three interpreted HOF folds,
    * same left-to-right accumulation order (bit-identical to the HOF
    * version and the DuckDB oracle). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VecCosine.vecCosine(a, b)

  /**
   * Exact top-k cosine neighbors of each query vector against the corpus.
   * Brute force = one join + per-query window rank; the correctness
   * baseline any ANN variant is measured against. At scale the corpus side
   * stays partitioned; only the (small) query set is broadcast.
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "qid", cId: String = "cid", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId), col(vecCol).as("qe"))
    val c = corpus.select(col(cId), col(vecCol).as("ce"))
    val scored = broadcast(q).crossJoin(c)
      .select(col(qId), col(cId), round(cosine(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /**
   * Sign-LSH bucket id from `nPlanes` coordinate-difference hyperplanes:
   * bit p = [v(p) > v(p + offset)]. A valid (if simple) LSH family for
   * cosine on centered vectors; the point here is the scale shape: bucket
   * assignment is a narrow projection, and ANN search becomes an equi-join
   * on `bucket` instead of a cross join — the IVF/LSH "coarse quantizer"
   * pattern.
   *
   * Minimum dimension for full discrimination is nPlanes + offset (40 with
   * defaults); shorter vectors are still safe — out-of-range planes
   * contribute a 0 bit instead of throwing under ANSI mode (the outer
   * size() guard short-circuits the element_at).
   */
  def signBucket(vec: Column, nPlanes: Int = 8, offset: Int = 32): Column =
    (1 to nPlanes).map { p =>
      when(size(vec) >= lit(p + offset),
        when(element_at(vec, p) > element_at(vec, p + offset), lit(1L << (p - 1)))
          .otherwise(lit(0L)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Bucketed ANN: top-k within the query's LSH bucket — plus, with
   * `nProbe > 1`, the nProbe-1 adjacent buckets at Hamming distance 1
   * (classic multi-probe LSH: the most likely buckets for a near-miss are
   * those differing in exactly one hyperplane bit). Probing explodes only
   * the QUERY side (nProbe rows per query, still broadcast-sized); the
   * corpus stays one row per vector and the search remains an equi-join on
   * `bucket`. Recall rises with nProbe with no change to the plan shape.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "qid", cId: String = "cid", vecCol: String = "embedding",
      nProbe: Int = 1, nPlanes: Int = 8): DataFrame = {
    require(nProbe >= 1 && nProbe <= nPlanes + 1,
      s"nProbe must be in [1, nPlanes + 1 = ${nPlanes + 1}]")
    val base = signBucket(col(vecCol), nPlanes)
    val probes = array((0 until nProbe).map { i =>
      if (i == 0) base else base.bitwiseXOR(lit(1L << (i - 1)))
    }: _*)
    val q = queries.select(col(qId), col(vecCol).as("qe"),
      explode(probes).as("bucket"))
    val c = corpus.select(col(cId), col(vecCol).as("ce"),
      signBucket(col(vecCol), nPlanes).as("bucket"))
    // no dedup needed: a corpus vector lives in exactly one bucket and the
    // probe buckets of a query are pairwise distinct, so each (query,
    // candidate) pair surfaces at most once
    val scored = broadcast(q).join(c, Seq("bucket"))
      .select(col(qId), col(cId), round(cosine(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /**
   * IVF-style ANN: a KMeans coarse quantizer partitions the corpus into
   * `nCells` cells; each query searches only its `nProbe` nearest cells.
   * The standard inverted-file index shape (FAISS IVF-Flat): cell
   * assignment is a narrow pass, search is an equi-join on cell id, and
   * recall/cost trades off via nProbe without changing the plan shape.
   * Centroids are k x d — broadcast-sized at any corpus scale.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int,
      nProbe: Int = 2, qId: String = "qid", cId: String = "cid",
      vecCol: String = "embedding", seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vectors => MlVectors}
    val toVec = udf((a: Seq[Float]) => MlVectors.dense(a.map(_.toDouble).toArray))
    val corpusFeats = corpus.withColumn("features", toVec(col(vecCol)))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell").fit(corpusFeats)
    val centers = km.clusterCenters.map(_.toArray)
    val c = km.transform(corpusFeats)
      .select(col(cId), col(vecCol).as("ce"), col("cell"))
    // query -> its nProbe nearest cells, via a small literal centroid table
    val bc = queries.sparkSession.sparkContext.broadcast(centers)
    val probeCells = udf { (v: Seq[Float]) =>
      val x = v.map(_.toDouble).toArray
      bc.value.zipWithIndex.map { case (ctr, i) =>
        var s = 0.0; var j = 0
        while (j < x.length) { val d = x(j) - ctr(j); s += d * d; j += 1 }
        (s, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }
    val q = queries.select(col(qId), col(vecCol).as("qe"),
      explode(probeCells(col(vecCol))).as("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .select(col(qId), col(cId), round(cosine(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /**
   * Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= tau).
   * All-pairs within LSH buckets — same candidate-bounding idea as
   * [[Dedup.minhashLshPairs]]; exact within-bucket verification.
   */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      tau: Double, bucketed: Boolean = true): DataFrame = {
    val withB =
      if (bucketed) df.select(col(idCol), col(vecCol), signBucket(col(vecCol)).as("bucket"))
      else df.select(col(idCol), col(vecCol), lit(0L).as("bucket"))
    val a = withB.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = withB.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= tau)
  }
}

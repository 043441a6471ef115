package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Persistable IVF-Flat index (SURVEY.md §7.5 scale path): the KMeans coarse
 * quantizer runs ONCE at `fit`, and every subsequent [[IvfIndex.topK]] is a
 * pure equi-join on the cell id — no re-clustering per query batch (the
 * FAISS fit/search split; [[Vectors.ivfTopK]] keeps the one-shot
 * convenience shape and delegates here).
 *
 * Artifacts are plain parquet under one directory (the
 * [[graft.ml.Persist]] convention):
 *   centroids/   (cell, centroid array<double>) — k x d, broadcast-sized
 *   corpus/      (id, vec, cell) partitioned BY CELL, so a probed query
 *                join can dynamic-partition-prune to the nProbe cells it
 *                actually touches instead of scanning the full corpus
 */
final case class IvfIndex(centroids: Array[Array[Double]],
    assigned: DataFrame, cId: String, vecCol: String) {

  /** Top-k cosine neighbors of each query among its `nProbe` nearest
    * cells. Only the (small) query side is broadcast and exploded; the
    * corpus stays one row per vector, equi-joined on `cell`.
    *
    * The nearest-cell probe is pure Catalyst (no Scala UDF): the k x d
    * centroid matrix rides the plan as literal arrays, each squared L2
    * distance is a codegen'd `zip_with`+`aggregate` fold, and
    * `array_sort` over (distance, cell) structs picks the nProbe nearest
    * (lexicographic struct order = distance first, cell-id tiebreak —
    * identical to the former udf's stable sort). */
  /** (d2, cell) structs for every centroid, sorted ascending — pure
    * Catalyst (codegen'd zip_with + aggregate folds; lexicographic struct
    * order = distance first, cell-id tiebreak, matching both the former
    * udf's stable sort and MLlib KMeans' first-minimum assignment). */
  private def sortedCellDists(vec: org.apache.spark.sql.Column) = {
    val dists = centroids.zipWithIndex.map { case (ctr, i) =>
      val ctrLit = array(ctr.map(lit).toIndexedSeq: _*)
      val d2 = aggregate(
        zip_with(vec, ctrLit, (a, b) => {
          val d = a.cast("double") - b; d * d
        }),
        lit(0.0d), (acc, x) => acc + x)
      struct(d2.as("d2"), lit(i).as("cell"))
    }
    array_sort(array(dists.toIndexedSeq: _*))
  }

  /** Assign rows to their nearest FROZEN centroid (no re-clustering). */
  private def assignToCells(vectors: DataFrame): DataFrame =
    vectors.select(col(cId), col(vecCol),
      element_at(sortedCellDists(col(vecCol)), 1).getField("cell").as("cell"))

  /**
   * Incremental add: production corpora APPEND — new vectors are assigned
   * to the EXISTING centroids (one narrow codegen pass, no KMeans job, no
   * shuffle) and unioned into the corpus. Centroids are deliberately
   * frozen: cell quality degrades only as the data distribution drifts,
   * the standard IVF operational tradeoff (refit with [[IvfIndex.fit]]
   * when recall decays). Spec-checked: add-then-query at full probe
   * equals brute force over the grown corpus.
   */
  def add(vectors: DataFrame): IvfIndex =
    copy(assigned = assigned.select(col(cId), col(vecCol), col("cell"))
      .unionByName(assignToCells(vectors)))

  /** Incremental add against a SAVED index: append only the new vectors'
    * cell-partitioned parquet (centroids untouched) — the on-disk twin of
    * [[add]]; [[IvfIndex.load]] then serves the grown corpus. */
  def appendTo(dir: String, vectors: DataFrame): Unit =
    assignToCells(vectors).write.mode("append")
      .partitionBy("cell").parquet(s"$dir/corpus")

  /** Expand each query to its `nProbe` nearest cells: (qId, cell) — the
    * shortlist generator shared by [[topK]] (IVF-Flat) and
    * [[Pq.ivfAdcTopK]] (IVF-PQ). Pure Catalyst; one row per probe. */
  def probe(queries: DataFrame, nProbe: Int, qId: String = "qid"): DataFrame =
    queries.select(col(qId),
      explode(slice(sortedCellDists(col(vecCol)), 1, nProbe)).as("p"))
      .select(col(qId), col("p.cell").as("cell"))

  def topK(queries: DataFrame, k: Int, nProbe: Int = 2,
      qId: String = "qid"): DataFrame = {
    val probes = slice(sortedCellDists(col(vecCol)), 1, nProbe)
    val q = queries.select(col(qId), col(vecCol).as("qe"),
      explode(probes).as("p"))
      .select(col(qId), col("qe"), col("p.cell").as("cell"))
    val c = assigned.select(col(cId), col(vecCol).as("ce"), col("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .select(col(qId), col(cId),
        round(Vectors.cosine(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col(qId)).orderBy(col("cos").desc, col(cId).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qId), col(cId), col("cos"), col("rnk").cast("long").as("rnk"))
  }

  /** Write centroids + cell-partitioned corpus; see class doc. */
  def save(dir: String): Unit = {
    val spark = assigned.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (ctr, i) => (i, ctr.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/corpus")
  }
}

object IvfIndex {

  /** One KMeans job over the corpus -> (centroids, cell-assigned corpus).
    * The assigned frame is persisted by the caller (or [[IvfIndex.save]]d)
    * for repeated query workloads. */
  /**
   * Build an index around EXPLICIT centroids (no KMeans): corpus rows are
   * assigned by the same pure-Catalyst argmin the incremental [[IvfIndex.add]]
   * path uses. Production use: refit-free rebuilds from saved centroids;
   * test/oracle use: fully deterministic cell structure (the semDedup
   * seed-centroid pattern), which is what lets residual IVF-PQ be
   * hash-checked cross-engine.
   */
  def fromCentroids(centroids: Array[Array[Double]], corpus: DataFrame,
      cId: String = "cid", vecCol: String = "embedding"): IvfIndex = {
    val empty = corpus.filter(lit(false))
      .select(col(cId), col(vecCol), lit(0).as("cell"))
    IvfIndex(centroids, empty, cId, vecCol).add(corpus)
  }

  def fit(corpus: DataFrame, nCells: Int, cId: String = "cid",
      vecCol: String = "embedding", seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    // built-in Catalyst expression, not a Scala UDF (COVERAGE §2.M)
    val corpusFeats = corpus.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell").fit(corpusFeats)
    IvfIndex(km.clusterCenters.map(_.toArray),
      km.transform(corpusFeats).select(col(cId), col(vecCol), col("cell")),
      cId, vecCol)
  }

  def load(spark: SparkSession, dir: String, cId: String = "cid",
      vecCol: String = "embedding"): IvfIndex = {
    val ctr = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    IvfIndex(ctr, spark.read.parquet(s"$dir/corpus"), cId, vecCol)
  }
}

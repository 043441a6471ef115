package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Count-min sketch: one-sided error, exactness without collisions,
  * weighted counts, and the heavy-hitter threshold/ranking. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is never below the true count; exact at generous width") {
    val rows = Seq.fill(40)("hot") ++ (1 to 10).map(i => s"k$i")
    val df = rows.map(Tuple1(_)).toDF("k")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Sketch.heavyHitters(df, "k", minCount = 1L, depth = 3, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: est ${est(k)} < truth $c")
    }
    // 11 distinct keys into depth-3 x 4096 cells: collisions essentially
    // impossible, so the sketch is exact
    assert(est == truth)
  }

  test("narrow width forces collision overshoot, still one-sided") {
    val df = (1 to 100).map(i => s"k$i").map(Tuple1(_)).toDF("k")
    val est = Sketch.heavyHitters(df, "k", minCount = 1L, depth = 2, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 100)
    assert(est.values.forall(_ >= 1L))
    assert(est.values.exists(_ > 1L), "100 keys in 8 cells must collide")
  }

  test("weighted sketch sums the weight column") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("k", "bytes")
    val cms = Sketch.countMin(df, "k", depth = 3, width = 1024,
      weightCol = Some("bytes"))
    val est = Sketch.estimate(cms, df.select("k").distinct(), "k",
      depth = 3, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") == 12L && est("b") == 1L)
  }

  test("heavyHitters applies the threshold and ranks est desc, key asc") {
    val rows = Seq.fill(9)("x") ++ Seq.fill(9)("a") ++ Seq.fill(3)("z") ++ Seq("y")
    val df = rows.map(Tuple1(_)).toDF("k")
    val hh = Sketch.heavyHitters(df, "k", minCount = 3L, depth = 3, width = 2048)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.toSeq == Seq(("a", 9L), ("x", 9L), ("z", 3L)))
  }
}

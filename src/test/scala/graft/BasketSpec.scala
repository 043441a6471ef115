package graft

import org.apache.spark.sql.functions._
import graft.ops.{Basket, Fuzzy}

/** Hand-computed market-basket mining + golden-record survivorship. */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  // b1 {x,y,z} (x repeated), b2 {x,y}, b3 {x,y}, b4 {x}, b5 {z,w},
  // plus a null-item row that must be ignored
  private def baskets = Seq[(java.lang.Long, String)](
    (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
    (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"),
    (4L, "x"), (5L, "z"), (5L, "w"), (5L, null)
  ).toDF("basket", "item")

  test("frequentItems: distinct-basket support, repeats and nulls ignored") {
    val out = Basket.frequentItems(baskets, "basket", "item", 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x" -> 4L, "y" -> 3L, "z" -> 2L)) // w support 1 pruned
  }

  test("frequentPairs: hand-computed supports; maxBasket drops the big basket") {
    val out = Basket.frequentPairs(baskets, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("x", "y") -> 3L)) // xz, yz, zw all support 1
    // basket 1 has 3 frequent items; cap 2 drops it -> xy support falls to 2
    val capped = Basket.frequentPairs(baskets, "basket", "item", 2L,
      maxBasket = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped == Map(("x", "y") -> 2L))
  }

  test("associationRules: confidence and lift, both directions") {
    val out = Basket.associationRules(baskets, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // 5 baskets; supp(x)=4, supp(y)=3, supp(xy)=3
    assert(out(("x", "y")) == (3L, 0.75, 1.25))
    assert(out(("y", "x")) == (3L, 1.0, 1.25))
    assert(out.size == 2)
    // minConfidence filters the weaker direction
    val conf = Basket.associationRules(baskets, "basket", "item", 2L,
      minConfidence = 0.9).collect()
    assert(conf.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("y", "x")))
  }

  test("goldenRecord: recency fills from stale, majority mode with min tie-break") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq[(java.lang.Long, Long, java.sql.Timestamp, java.lang.Double, String, String)](
      // entity 1: newest row has null phone -> phone survives from older
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0, "p1", "gold"),
      (1L, 2L, ts("2024-01-02 10:00:00"), 20.0, null, "gold"),
      (1L, 3L, ts("2024-01-03 10:00:00"), null, null, "silver"),
      // entity 2: tie on segment counts -> min value wins; same-ts rows
      // break on the id tiebreak (id 5 is later)
      (2L, 4L, ts("2024-01-01 10:00:00"), 1.0, "a", "silver"),
      (2L, 5L, ts("2024-01-01 10:00:00"), 2.0, "b", "bronze"),
      // entity 3: all-null field stays null
      (3L, 6L, ts("2024-01-01 10:00:00"), null, null, "gold")
    ).toDF("cust", "id", "ts", "balance", "phone", "segment")
    val out = Fuzzy.goldenRecord(df, "cust", "ts", "id",
        recencyFields = Seq("balance", "phone"),
        majorityFields = Seq("segment"))
      .collect().map(r => r.getAs[Long]("cust") -> r).toMap
    val e1 = out(1L)
    assert(e1.getAs[Long]("n_records") == 3L)
    assert(e1.getAs[Double]("balance") == 20.0) // newest non-null
    assert(e1.getAs[String]("phone") == "p1")   // only non-null
    assert(e1.getAs[String]("segment") == "gold") // 2 gold vs 1 silver
    val e2 = out(2L)
    assert(e2.getAs[Double]("balance") == 2.0)  // id tiebreak: 5 wins
    assert(e2.getAs[String]("phone") == "b")
    assert(e2.getAs[String]("segment") == "bronze") // 1-1 tie, min value
    val e3 = out(3L)
    assert(e3.getAs[java.lang.Double]("balance") == null &&
      e3.getAs[String]("phone") == null)
  }

  test("frequentPairs plan: Apriori semi-joins precede the basket self-join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plan = Basket.frequentPairs(li, "l_orderkey", "l_partkey", 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join pruning:\n$plan")
    // shuffles hash keys only: no sort-merge cartesian fallback
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

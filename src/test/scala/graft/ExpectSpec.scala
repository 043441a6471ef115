package graft

import org.apache.spark.sql.functions._
import graft.ops.Expect
import graft.ops.Expect._

/** Hand-computed verdicts for the data-quality expectations suite. */
class ExpectSpec extends SparkSpec {
  import spark.implicits._

  private def byKey(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      (r.getAs[String]("check_name"), r.getAs[String]("target")) ->
        (Option(r.getAs[java.lang.Double]("value")).map(_.toDouble),
          r.getAs[String]("op"), r.getAs[Boolean]("passed"))
    }.toMap

  test("report: completeness, uniqueness, range, set, pattern — hand-computed") {
    val df = Seq[(java.lang.Long, String, java.lang.Double, String)](
      (1L, "a", 10.0, "x-1"),
      (2L, "b", 20.0, "y-2"),
      (2L, null, 120.0, "zz"),   // dup id, null cat, out-of-range, no match
      (null, "a", null, "x-9")   // null id, null val
    ).toDF("id", "cat", "v", "code")
    val out = byKey(Expect.report(df, Seq(
      Complete("cat", 0.7),
      Complete("id", 1.0),
      Unique(Seq("id")),
      InRange("v", 0, 100, 0.9),
      InSet("cat", Seq("a", "b")),
      Matches("code", "^[a-z]-", 0.5))))
    assert(out(("complete", "cat")) == (Some(0.75), "ge", true))
    assert(out(("complete", "id")) == (Some(0.75), "ge", false))
    // 2 distinct ids over 3 non-null id rows
    assert(out(("unique", "id")) == (Some(0.666667), "ge", false))
    // 2 of 3 non-null v inside [0,100]
    assert(out(("in_range", "v")) == (Some(0.666667), "ge", false))
    assert(out(("in_set", "cat")) == (Some(1.0), "ge", true))
    // substring-match semantics: x-1, y-2 match; zz, x-9 don't... x-9 DOES
    assert(out(("matches", "code")) == (Some(0.75), "ge", true))
  }

  test("report: empty input fails closed; multi-column unique tuple grain") {
    val empty = Seq.empty[(java.lang.Long, String)].toDF("id", "cat")
    val out = byKey(Expect.report(empty, Seq(Complete("cat"), Unique(Seq("id")))))
    assert(out(("complete", "cat")) == (None, "ge", false))
    assert(out(("unique", "id")) == (None, "ge", false))
    // (a,1),(a,1),(a,2): pair distinct 2/3; null member drops the row
    val df = Seq[(String, java.lang.Long)](("a", 1L), ("a", 1L), ("a", 2L),
      ("b", null)).toDF("k", "sub")
    val o2 = byKey(Expect.report(df, Seq(Unique(Seq("k", "sub")))))
    assert(o2(("unique", "k,sub")) == (Some(0.666667), "ge", false))
  }

  test("referential + orphans: null FKs excluded, per-key pre-agg counts rows") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "r1"), (1L, "r2"), (9L, "r3"), (9L, "r4"), (9L, "r5"),
      (null, "r6")).toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val rep = byKey(Expect.referential(child, "fk", parent, "pk",
      maxOrphanRatio = 0.5))
    // 3 orphan ROWS (key 9) over 5 non-null-FK rows
    assert(rep(("referential", "fk->pk")) == (Some(0.6), "le", false))
    val orph = Expect.orphans(child, "fk", parent, "pk")
      .select("payload").as[String].collect().toSet
    assert(orph == Set("r3", "r4", "r5"))
    // clean FK passes at threshold 0
    val clean = byKey(Expect.referential(
      child.filter(col("fk") === 1L), "fk", parent, "pk"))
    assert(clean(("referential", "fk->pk")) == (Some(0.0), "le", true))
  }

  test("freshness: age vs asOf; empty table fails closed") {
    val df = Seq("2024-01-01 00:00:00", "2024-01-10 12:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val ok = byKey(Expect.freshness(df, "ts", "2024-01-11 12:00:00", 86400L))
    assert(ok(("freshness", "ts")) == (Some(86400.0), "le", true))
    val stale = byKey(Expect.freshness(df, "ts", "2024-01-13 00:00:00", 86400L))
    assert(stale(("freshness", "ts"))._3 == false)
    val empty = df.filter(col("ts").isNull)
    assert(byKey(Expect.freshness(empty, "ts", "2024-01-01 00:00:00", 1L))
      .apply(("freshness", "ts")) == (None, "le", false))
  }

  test("report plan: one scan, no join; approxDistinct keeps it expand-free") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
    val checks = Seq[Check](Complete("o_custkey"), Unique(Seq("o_orderkey")),
      InRange("o_totalprice", 0, 200000, 0.9))
    val exact = Expect.report(df, checks)
      .queryExecution.executedPlan.toString
    assert(!exact.contains("Join"), s"single-pass report must not join:\n$exact")
    val approx = Expect.report(df, checks, approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!approx.contains("Expand"),
      s"approxDistinct must avoid the Expand plan:\n$approx")
    // both scans of the parquet appear exactly once
    assert(approx.split("FileScan").length - 1 == 1)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CorpusIo

class CorpusIoSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  test("jsonl ingest: good lines parse, broken lines quarantine, drift nulls") {
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    val f = new java.io.File(dir, "part0.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "hello world", "source": "web"}
        |{"doc_id": 2, "text": "second doc", "source": "books"}
        |{"doc_id": 3, "source": "web"}
        |this line is not json at all {{{
        |{"doc_id": "not-a-number", "text": "bad type", "source": "web"}
        |""".stripMargin)
    val r = CorpusIo.readJsonl(spark, f.getAbsolutePath, docSchema)
    val good = r.good.collect().map(x => (x.get(0), x.get(1), x.get(2)))
    assert(good.length == 3)
    assert(good.contains((1L, "hello world", "web")))
    assert(good.contains((3L, null, "web")))           // missing field -> null
    assert(r.good.columns.toSeq == Seq("doc_id", "text", "source"))
    val bad = r.bad.collect().map(_.getString(0))
    assert(bad.length == 2)                            // broken + bad-type
    assert(bad.exists(_.contains("not json at all")))
  }

  test("bucketed tables: co-located join and keyed agg plan ZERO exchanges") {
    import spark.implicits._
    import graft.sources.Bucketed
    val feats = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("uid", "feat")
    val labels = (1 to 100).map(i => (i.toLong, i % 2)).toDF("uid", "label")
    // force the big-join planning path (tiny fixtures would broadcast) and
    // freeze the static plan (AQE wrapper hides the subtree)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketed.writeBucketed(feats, "bk_feats", Seq("uid"), 4, Seq("uid"))
      Bucketed.writeBucketed(labels, "bk_labels", Seq("uid"), 4, Seq("uid"))
      val joined = Bucketed.readTable(spark, "bk_feats")
        .join(Bucketed.readTable(spark, "bk_labels"), "uid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 100)
      val agg = Bucketed.readTable(spark, "bk_feats").groupBy($"uid")
        .agg(sum($"feat"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "keyed agg over a bucketed table must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bk_feats")
      spark.sql("DROP TABLE IF EXISTS bk_labels")
    }
  }

  test("partitioned corpus write: round trip + partition pruning in the scan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "web", "train"), (2L, "b", "web", "test"),
      (3L, "c", "books", "train"), (4L, "d", "books", "train")
    ).toDF("doc_id", "text", "source", "split")
    val dir = Files.createTempDirectory("graft-corpus").toFile.getAbsolutePath
    val path = CorpusIo.writeCorpus(docs, s"$dir/corpus",
      partitionCols = Seq("source", "split"))
    val back = CorpusIo.readCorpus(spark, path)
    assert(back.count() == 4)
    assert(back.select(sum($"doc_id")).as[Long].head() == 10L)

    val pruned = back.filter($"source" === "web" && $"split" === "train")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      (scan.contains("isnotnull(source") || scan.contains("source#")),
      s"expected partition filters in scan:\n$scan")
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(1L))
    // pruning really skipped files: only the one matching partition dir read
    val files = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .flatMap(_.files).length
    }.sum
    assert(files == 1, s"expected 1 file after pruning, got $files")
  }
  test("jsonFieldCoverage: per-key coverage over ALL rows, invalid rows count in the denominator") {
    import spark.implicits._
    val df = Seq(
      """{"a": 1, "b": 2}""", """{"a": 3}""", """not json""", """{"b": 4}"""
    ).toDF("js")
    val cov = CorpusIo.jsonFieldCoverage(df, "js")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(cov == Map("a" -> ((2L, 0.5)), "b" -> ((2L, 0.5))))
  }
}

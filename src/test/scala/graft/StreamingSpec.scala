package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

/** Streaming extension: drive the file stream synchronously on testdata. */
class StreamingSpec extends SparkSpec {

  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("windowed type counts over the stream match the batch aggregate") {
    val events = EventStream.readEvents(spark, streamDir)
    val agg = EventStream.windowedTypeCounts(events, window = "24 hours")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val total = spark.sql("SELECT SUM(n) FROM win_counts").head().getLong(0)
      assert(total == 1000) // sf0.001 events row count
      val types = spark.sql("SELECT COUNT(DISTINCT event_type) FROM win_counts")
        .head().getLong(0)
      assert(types == 5)
    } finally q.stop()
  }

  test("streaming exact dedup matches the batch groups on the documents stream") {
    val dir = Files.createTempDirectory("graft_docs_stream")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docsStream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(dir.toString)
    val dec = EventStream.streamingExactDedup(spark, docsStream, "text", "doc_id")
    val q = dec.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dedup_stream").collect()
      val batch = graft.ops.Dedup.exactGroups(
        graft.core.Tables.load(spark, sf, "documents"), "text", "doc_id").collect()
      // every doc decided exactly once; kept count = number of batch groups
      assert(rows.length == batch.map(_.getLong(2)).sum)
      assert(rows.count(_.getBoolean(2)) == batch.length)
      // per content hash, all members point at ONE canonical id that is a
      // member of that hash's group
      val byHash = rows.groupBy(_.getString(1))
      assert(byHash.forall { case (_, rs) => rs.map(_.getLong(3)).distinct.length == 1 })
      val batchGroups = batch.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byHash.keySet == batchGroups.keySet)
    } finally q.stop()
  }

  test("stateful latest-N sequences: bounded per-entity state, newest first") {
    val events = EventStream.readEvents(spark, streamDir)
    val seqs = EventStream.latestNSequences(spark, events, n = 5)
    val q = seqs.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("user_seqs").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM user_seqs").collect()
      assert(rows.length == 15) // one state row per user at sf0.001
      assert(rows.forall(_.getInt(1) == 5)) // every user has >= 5 events
      assert(rows.forall(r => r.getSeq[String](2).size == 5))
    } finally q.stop()
  }
}

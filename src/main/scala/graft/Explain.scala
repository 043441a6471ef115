package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for plan-shape auditing. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_pipeline_e2e", "q_e1_pivot", "q_b1_window_filter",
        "q_f1_encode_join", "q_dedup_minhash_lsh", "q_ann_brute")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"/tmp/explain_$n.txt"), s)
      println(s"wrote /tmp/explain_$n.txt")
    }
    spark.stop()
  }
}

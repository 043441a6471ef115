package graft
import org.apache.spark.sql.SparkSession
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    SparkEntry.queries(args(0))(spark, args(1)).show(false)
    println(f"elapsed ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}

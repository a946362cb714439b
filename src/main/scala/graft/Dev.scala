package graft
import org.apache.spark.sql.SparkSession
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // driver smoke: entry rows > 0
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    spark.stop()
  }
}

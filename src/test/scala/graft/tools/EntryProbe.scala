package graft.tools
import org.apache.spark.sql.SparkSession
object EntryProbe {
  def main(args: Array[String]): Unit = {
    // deliberately vanilla: what the driver's t1 smoke session might look like
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}

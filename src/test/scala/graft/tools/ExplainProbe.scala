package graft.tools
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q13 filter pushdown ===")
    graft.operators.Analytics.purchaseEvents(spark, dir).explain("formatted")
    println("=== q12 multiway join ===")
    graft.operators.Analytics.revenueByNation(spark, dir).explain("formatted")
    spark.stop()
  }
}

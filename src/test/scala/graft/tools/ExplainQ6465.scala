package graft.tools
object ExplainQ6465 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q66 decontaminate ===")
    println(graft.operators.Dedup.decontaminate(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}

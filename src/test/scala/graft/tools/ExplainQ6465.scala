package graft.tools
object ExplainQ6465 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q64 lsh ===")
    println(graft.operators.Similarity.embeddingNearDupLsh(spark, dir, 0.5, 4, 8)
      .queryExecution.executedPlan.toString)
    println("=== q65 substring ===")
    println(graft.operators.Dedup.substringDedup(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}

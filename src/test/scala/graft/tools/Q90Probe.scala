package graft.tools
object Q90Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (i <- 1 to 6) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q90_stream_denorm_full_outer")(spark, dir).count()
      println(f"[probe] run$i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}

package graft.tools
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()
    time("pairs (exactNearDuplicates) cold") {
      graft.operators.Dedup.exactNearDuplicates(spark, dir).write.format("noop").mode("overwrite").save() }
    time("pairs warm") {
      graft.operators.Dedup.exactNearDuplicates(spark, dir).write.format("noop").mode("overwrite").save() }
    time("clusters (dedupClusters) warm1") {
      graft.operators.Dedup.dedupClusters(spark, dir).write.format("noop").mode("overwrite").save() }
    time("clusters warm2") {
      graft.operators.Dedup.dedupClusters(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}

package graft.tools
object TypeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(tag: String)(f: => Unit): Unit =
      try { f; println(s"$tag -> NO ERROR (bad)") }
      catch { case e: Throwable => println(s"$tag -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse("").take(110)}") }
    p("P1 blake2b on string") { spark.sql("SELECT graft_blake2b('abc')").collect() }
    p("P2 cosine on float arrays") { spark.sql("SELECT graft_cosine_sim(array(1.0F), array(2.0F))").collect() }
    p("P3 cosine length mismatch") {
      spark.sql("SELECT graft_cosine_sim(array(1.0D,2.0D), array(2.0D))").collect() }
    p("P4 shingles on ints") { spark.sql("SELECT graft_shingles(array(1,2,3), 3)").collect() }
    // q01 plan after broadcast-default change: Spark should still pick BHJ by size
    val plan = graft.SparkEntry.queries("q01_denorm_inner")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    println("P5 q01 auto-broadcast=" + plan.contains("BroadcastHashJoin"))
    spark.stop()
  }
}

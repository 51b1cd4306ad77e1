package graft.tools
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val bf = graft.operators.Similarity.embeddingNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.operators.Similarity.embeddingNearDupLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE bf=${bf.size} lsh=${lsh.size} lsh_subset=${lsh.subsetOf(bf)} hit=${(bf intersect lsh).size}")
    val plan = graft.operators.Analytics.customerOrderExistence(spark, dir)
      .queryExecution.executedPlan.toString
    println("PROBE semi=" + plan.contains("LeftSemi") + " anti=" + plan.contains("LeftAnti"))
    spark.stop()
  }
}

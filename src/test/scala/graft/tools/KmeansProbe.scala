package graft.tools
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val t0 = System.nanoTime()
    val bf = graft.operators.Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.Similarity.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = graft.operators.Similarity.ivfTopKTrained(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) = (bf intersect s).size.toDouble / bf.size
    println(f"PROBE static-IVF recall=${recall(ivf)}%.3f trained-IVF recall=${recall(trained)}%.3f wall=${(System.nanoTime()-t0)/1e9}%.1fs")
    println("PROBE stateTtl-gone=" + (!scala.io.Source.fromFile("/root/repo/src/main/scala/graft/streaming/StreamDenormalize.scala").mkString.contains("stateTtl")))
    spark.stop()
  }
}

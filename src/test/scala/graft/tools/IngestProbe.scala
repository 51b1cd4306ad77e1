package graft.tools
import org.apache.spark.sql.SparkSession
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // staging happens on first call; 2nd/3rd calls are the steady state
    time("run1 (staging+stream)")(graft.operators.Dedup.streamIngestNearDup(spark, dir).count())
    time("run2 (stream only)")(graft.operators.Dedup.streamIngestNearDup(spark, dir).count())
    time("run3 (stream only)")(graft.operators.Dedup.streamIngestNearDup(spark, dir).count())
    spark.stop()
  }
}

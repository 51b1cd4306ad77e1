package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import java.util.concurrent.ConcurrentLinkedQueue
object IngestProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm run
    graft.operators.Dedup.streamIngestNearDup(spark, dir).count()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?").take(80)))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) rows.add(f"job ${j.jobId}%4d ${(System.nanoTime()-s._1)/1e9}%6.2f s  ${s._2}")
      }
    })
    val t0 = System.nanoTime()
    graft.operators.Dedup.streamIngestNearDup(spark, dir).count()
    println(f"[probe] total: ${(System.nanoTime()-t0)/1e9}%.2f s")
    Thread.sleep(1000)
    rows.forEach(r => println("[probe] " + r))
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("pqCodebooks")(graft.operators.Similarity.pqCodebooks(spark, dir))
    time("pqCodebooks again")(graft.operators.Similarity.pqCodebooks(spark, dir))
    time("pqResidualCodebooks")(graft.operators.Similarity.pqResidualCodebooks(spark, dir))
    spark.stop()
  }
}

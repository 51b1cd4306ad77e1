package graft.tools
import org.apache.spark.sql.functions._
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = e.select(graft.functions.cosine_sim(col("v"), col("v")).as("c"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("HAS_LOOP=" + code.contains("getDouble"))
    println("HAS_SQRT=" + code.contains("Math.sqrt"))
    val snip = code.linesIterator.filter(l => l.contains("sqrt") || l.contains("getDouble")).take(4).mkString("\n")
    println("SNIP>>>\n" + snip)
    println(df.queryExecution.executedPlan.toString.take(400))
    spark.stop()
  }
}

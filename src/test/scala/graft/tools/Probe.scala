package graft.tools
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def p(tag: String)(f: => Unit): Unit =
      try f catch { case e: Throwable => println(s"$tag -> ${String.valueOf(e.getMessage).linesIterator.nextOption().getOrElse(e.getClass.getName)}") }
    p("PROBE1 size=65") { spark.sql("SELECT graft_blake2b(CAST('x' AS BINARY), 65)").show() }
    p("PROBE2 nonliteral") { spark.sql("SELECT graft_blake2b(CAST('x' AS BINARY), 1+7)").show() }
    println("PROBE3 default size: " + spark.sql("SELECT hex(graft_blake2b(CAST('32545513' AS BINARY)))").collect().head.getString(0))
    p("PROBE4 n=0") { spark.sql("SELECT graft_kafka_partition(CAST('x' AS BINARY), 0)").show() }
    spark.stop()
  }
}

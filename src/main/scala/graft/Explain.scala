package graft

/** Plan-inspection aid: print the formatted physical plan of one or
  * more registered queries without executing them (beyond what plan
  * construction itself requires — trained-artifact queries train).
  *
  *   sbt "runMain graft.Explain q79_ann_ivfpq [more names…] [sfDir]"
  *
  * The last argument is treated as the sf dir when it starts with '/'.
  * This is the loop behind PLANS.md: look at the plan, fix the shape,
  * pin it in PlanSpec.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dirs, names) = args.partition(_.startsWith("/"))
    val sfDir = dirs.lastOption.getOrElse("/root/testdata/sf0.001")
    require(names.nonEmpty,
      s"usage: graft.Explain <queryName>... [sfDir]; valid names: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"==== $name ($sfDir) ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

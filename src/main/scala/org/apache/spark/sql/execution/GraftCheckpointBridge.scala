package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Internal-API bridge (the [[org.apache.spark.sql.avro.GraftAvroBridge]]
  * pattern): rebuild a checkpointed frame's [[LogicalRDD]] WITHOUT its
  * origin-plan constraint set.
  *
  * Why this exists: `Dataset.localCheckpoint` deliberately carries the
  * source plan's constraints across the materialization boundary
  * (SPARK-39748) so the optimizer loses nothing. For graft's artifact
  * caches that inheritance is exactly wrong: artifacts are built from
  * wide derivations (16-ary hashed-embedding aggregates, array_position
  * bucket rules, digest expressions), and every join/filter planned
  * ABOVE the artifact re-feeds those trees into the constraint fixpoint
  * — measured on q180 at sf0.1, `PruneFilters` +
  * `InferFiltersFromConstraints` ground through 34 s of pure driver
  * plan time per invocation (RuleExecutor.dumpTimeSpent; 0 effective
  * runs) against checkpointed inputs that execute in 0.3 s. Origin
  * STATS are kept — size estimates drive broadcast planning — but the
  * constraint set is dropped, which only costs the optimizer inferred
  * predicates an artifact consumer could derive from its own explicit
  * filters anyway.
  */
object GraftCheckpointBridge {
  def dropOriginConstraints(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: LogicalRDD =>
        val s = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(s,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            s, Some(lr.stats), None))
      case _ => df
    }
}

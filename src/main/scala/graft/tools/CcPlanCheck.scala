package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: in a fused jump round, the three references to the
  * checkpointed label frame all require hashpartitioning(id), so the
  * physical plan must materialize that exchange ONCE and reuse it —
  * the jump lookup rides the propagation join's shuffle for free.
  */
object CcPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(1, 1000).select(col("id").as("src"), (col("id") + 1).as("dst"))
      .unionAll(spark.range(1, 1000).select((col("id") + 1).as("src"), col("id").as("dst")))
      .localCheckpoint()
    val labels = spark.range(1, 1001).select(col("id"), greatest(col("id") - 1, lit(1L)).as("component"))
      .localCheckpoint()
    val pulled = edges.join(labels, col("dst") === col("id"))
      .groupBy(col("src")).agg(min(col("component")).as("__nbr"))
    val prop = labels.join(pulled, col("id") === col("src"), "left")
      .select(col("id"),
        least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"),
        (coalesce(col("__nbr"), col("component")) < col("component")).as("__changed"))
    val lookup = labels.select(col("id").as("__jid"), col("component").as("__jcomp"))
    val next = prop.join(lookup, prop("component") === col("__jid"), "left")
      .select(prop("id"),
        coalesce(col("__jcomp"), prop("component")).as("component"),
        (prop("__changed") ||
          coalesce(col("__jcomp"), prop("component")) < prop("component")).as("__changed"))
    next.filter(col("__changed")).count()
    val plan = next.filter(col("__changed")).queryExecution.executedPlan.toString
    println(s"EXCHANGES=${"Exchange hashpartitioning".r.findAllIn(plan).length}")
    println(s"REUSED=${"ReusedExchange".r.findAllIn(plan).length}")
    println(plan.linesIterator.filter(l => l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}

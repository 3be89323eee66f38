package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contiguous global indexing: exact ROW_NUMBER semantics without the
  * single-partition window — contiguity, order-correctness,
  * invariance to the input's physical layout, and the no-global-sort
  * plan property.
  */
class GlobalIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df = {
    import spark.implicits._
    // shuffled insert order, duplicate sort values (ties broken by id)
    (0L until 3000L).map(i => ((i * 2654435761L) % 3000L, (i % 97).toInt))
      .toDF("id", "weight")
  }

  test("indices are exactly 0..N-1, ordered like ROW_NUMBER") {
    val indexed = GlobalIndex.assign(df, Seq("weight", "id"), numPartitions = 7)
    val n = indexed.count()
    assert(n == 3000)
    assert(indexed.agg(min("idx"), max("idx"), countDistinct("idx")).head()
      .toSeq == Seq(0L, 2999L, 3000L))
    // exact agreement with the window ROW_NUMBER on every row
    val expected = df.withColumn("expected_idx",
      row_number().over(Window.orderBy(col("weight"), col("id"))) - 1)
    val joined = indexed.join(expected, Seq("id", "weight"))
    assert(joined.filter(col("idx") =!= col("expected_idx")).isEmpty)
  }

  test("assignment is invariant to input partitioning") {
    val a = GlobalIndex.assign(df.repartition(13), Seq("weight", "id"))
      .select("id", "idx")
    val b = GlobalIndex.assign(df.coalesce(1), Seq("weight", "id"), numPartitions = 3)
      .select("id", "idx")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("assignPersisted matches assign exactly (footer-count protocol)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gidx")
      .toFile.getAbsolutePath + "/t"
    val a = GlobalIndex.assign(df, Seq("weight", "id"), numPartitions = 7)
      .select("id", "idx")
    val b = GlobalIndex.assignPersisted(df, Seq("weight", "id"), dir,
      numPartitions = 7).select("id", "idx")
    assert(b.agg(min("idx"), max("idx"), countDistinct("idx")).head()
      .toSeq == Seq(0L, 2999L, 3000L))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("plan has no single-partition global sort") {
    val indexed = GlobalIndex.assign(df, Seq("weight", "id"), numPartitions = 7)
    val plan = indexed.queryExecution.executedPlan.toString
    // the scalable shape: a range exchange, not a window over
    // SinglePartition (which is what ROW_NUMBER() OVER (ORDER BY...) plans to)
    assert(plan.contains("rangepartitioning") || plan.contains("REPARTITION_BY_RANGE")
      || plan.toLowerCase.contains("range"), s"no range exchange in:\n$plan")
    assert(!plan.contains("Window "), s"unexpected window operator in:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition exchange in:\n$plan")
  }
}

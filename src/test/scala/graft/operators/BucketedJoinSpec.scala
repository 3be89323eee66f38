package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (the q46 claim): two tables written
  * `bucketBy(n, key)` join on that key with NO Exchange on either
  * side — the shuffle a repeated fact-to-fact join would otherwise
  * pay on every run is paid once at write time.
  */
class BucketedJoinSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("join of co-bucketed tables plans with no Exchange; result is exact") {
    val tmp = Files.createTempDirectory("graft-bktspec").toFile
    tmp.deleteOnExit()
    import spark.implicits._
    val a = (0L until 20000L).map(i => (i % 3000L, i)).toDF("k", "a_val")
    val b = (0L until 5000L).map(i => (i % 3000L, i * 2)).toDF("k", "b_val")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bktspec")
    spark.sql("DROP TABLE IF EXISTS graft_bktspec.ta")
    spark.sql("DROP TABLE IF EXISTS graft_bktspec.tb")
    a.write.mode("overwrite").option("path", s"$tmp/ta")
      .bucketBy(4, "k").sortBy("k").saveAsTable("graft_bktspec.ta")
    b.write.mode("overwrite").option("path", s"$tmp/tb")
      .bucketBy(4, "k").sortBy("k").saveAsTable("graft_bktspec.tb")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bktspec.ta")
        .join(spark.table("graft_bktspec.tb"), "k")
      joined.count() // finalize AQE
      val plan = joined.queryExecution.executedPlan
      val exchanges = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join should not shuffle, found:\n${exchanges.mkString("\n")}")
      // exactness vs the plain join
      val expected = a.join(b, "k").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

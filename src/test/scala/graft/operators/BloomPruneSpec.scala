package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomMightContain

/** Bloom-pruned joins: exactness against the plain joins (the
  * one-sided-error argument made executable), probe determinism, and
  * the plan shape the 100 TB story depends on — the probe filter
  * sits on the big side BELOW the exact join, and the
  * definitely-clean anti leg reaches its union with NO join at all.
  */
class BloomPruneSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def big = {
    import spark.implicits._
    (0L until 5000L).map(i => (i, s"k${i % 1300}")).toDF("row_id", "key")
  }

  private def small = {
    import spark.implicits._
    // every third key, plus keys absent from big
    (0 until 700).map(i => s"k${i * 3}").toDF("key")
  }

  test("semiJoin equals the plain left-semi join") {
    val pruned = BloomPrune.semiJoin(big, small, Seq("key"), expectedItems = 1000L)
    val plain = big.join(small.distinct(), Seq("key"), "left_semi")
    assert(pruned.count() == plain.count())
    assert(pruned.select("row_id").except(plain.select("row_id")).isEmpty)
    assert(plain.select("row_id").except(pruned.select("row_id")).isEmpty)
  }

  test("antiJoin equals the plain left-anti join, columns preserved") {
    val pruned = BloomPrune.antiJoin(big, small, Seq("key"), expectedItems = 1000L)
    // USING joins front the key column — realign before the positional except
    val plain = big.join(small.distinct(), Seq("key"), "left_anti")
      .select(big.columns.map(col): _*)
    assert(pruned.columns.toSeq == big.columns.toSeq)
    assert(pruned.count() == plain.count())
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
  }

  test("exactness survives an undersized filter (inflated fpp, never wrong rows)") {
    val pruned = BloomPrune.antiJoin(big, small, Seq("key"), expectedItems = 10L)
    val plain = big.join(small.distinct(), Seq("key"), "left_anti")
      .select(big.columns.map(col): _*)
    assert(pruned.count() == plain.count())
    assert(pruned.except(plain).isEmpty)
  }

  test("probe is deterministic and one-sided: every true member passes") {
    val bytes = BloomPrune.buildFilter(small, Seq("key"), expectedItems = 1000L)
    val probed = small.distinct()
      .withColumn("hit", BloomMightContain(BloomPrune.keyHash(Seq("key")), bytes))
    // no false negatives, by construction
    assert(probed.filter(!col("hit")).isEmpty)
    // fpp holds loosely on non-members (sized filter, 1% nominal)
    val nonMembers = big.select(col("key")).distinct()
      .join(small.distinct(), Seq("key"), "left_anti")
      .withColumn("hit", BloomMightContain(BloomPrune.keyHash(Seq("key")), bytes))
    val n = nonMembers.count()
    val fp = nonMembers.filter(col("hit")).count()
    assert(fp <= math.max(5L, n / 10), s"false-positive burst: $fp of $n")
  }

  test("plan: probe filter sits below the exact join; clean anti leg joins nothing") {
    // AdaptiveSparkPlanHelper.collect traverses through AQE wrappers
    def collectPlans(p: SparkPlan): Seq[SparkPlan] = collect(p) { case n => n }
    // range-backed inputs: LocalRelation inputs would let
    // ConvertToLocalRelation evaluate the probe at optimization time,
    // hiding the runtime plan shape a real scan gets
    val bigR = spark.range(5000)
      .select(col("id").as("row_id"), concat(lit("k"), col("id") % 1300).as("key"))
    val smallR = spark.range(700)
      .select(concat(lit("k"), col("id") * 3).as("key"))
    val semi = BloomPrune.semiJoin(bigR, smallR, Seq("key"), expectedItems = 1000L)
      .queryExecution.executedPlan
    val semiStr = semi.toString
    assert(semiStr.contains("bloom_might_contain"),
      "probe filter missing from the semi-join plan")
    // the probe must appear strictly below the join operator: walk down
    // from the topmost join and find the filter inside its left subtree
    val joins = collectPlans(semi).filter(_.nodeName.toLowerCase.contains("join"))
    assert(joins.nonEmpty)
    assert(joins.exists(_.children.headOption.exists(
        _.toString.contains("bloom_might_contain"))),
      "bloom probe is not on the join's stream side")

    // anti: the definitely-clean leg is a join-free scan+filter
    val anti = BloomPrune.antiJoin(bigR, smallR, Seq("key"), expectedItems = 1000L)
      .queryExecution.executedPlan
    val union = collectPlans(anti).find(_.nodeName.toLowerCase.contains("union"))
    assert(union.isDefined, "anti plan lost its two-leg union")
    val legs = union.get.children
    assert(legs.exists(l => !l.toString.toLowerCase.contains("join")),
      "definitely-clean leg should not pay any join")
  }
}

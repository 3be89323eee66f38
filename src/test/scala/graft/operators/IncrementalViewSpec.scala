package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import IncrementalView._

/** Incremental view maintenance: the algebraic fold must equal the
  * direct aggregate over the concatenated batches — for any batch
  * split, including empty and single-row batches, and groups that
  * appear in only some batches.
  */
class IncrementalViewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def data = {
    import spark.implicits._
    (0 until 2000).map(i => (s"g${i % 7}", (i * 31 % 997).toLong)).toDF("g", "v")
  }

  private val specs = Seq(
    countRows("n"), sumOf(col("v"), "s"), minOf(col("v"), "lo"), maxOf(col("v"), "hi"))

  private def direct = data.groupBy("g")
    .agg(count(lit(1)).cast("long").as("n"), sum("v").as("s"),
      min("v").as("lo"), max("v").as("hi"))

  test("fold over arbitrary batch splits equals the direct aggregate") {
    for (nb <- Seq(1, 3, 10)) {
      val batches = (0 until nb).map(b => data.filter(pmod(col("v"), lit(nb)) === b))
      val folded = IncrementalView.refreshAll(batches, Seq("g"), specs)
      assert(folded.except(direct).isEmpty && direct.except(folded).isEmpty,
        s"fold diverged at $nb batches")
    }
  }

  test("groups absent from some batches merge correctly; empty batches are no-ops") {
    val b1 = data.filter(col("g") === "g1")
    val empty = data.filter(lit(false))
    val b2 = data.filter(col("g") =!= "g1")
    val folded = IncrementalView.refreshAll(Seq(b1, empty, b2), Seq("g"), specs)
    assert(folded.except(direct).isEmpty && direct.except(folded).isEmpty)
  }

  test("merge input sizes are group-cardinality, not corpus-sized") {
    // state after batch 1 has ≤ |groups| rows — the refresh never
    // carries corpus rows forward
    val s1 = IncrementalView.merge(None,
      IncrementalView.aggregate(data, Seq("g"), specs), Seq("g"), specs)
    assert(s1.count() == 7)
  }
}

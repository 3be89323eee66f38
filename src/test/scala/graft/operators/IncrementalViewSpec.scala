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

  // ── signed (Z-set) maintenance ──────────────────────────────────────

  private def signed(rows: Seq[(String, Long, Int)]) = {
    import spark.implicits._
    rows.toDF("g", "v", "__sign")
  }

  test("signed fold: retractions subtract; an emptied group disappears") {
    val d0 = signed(Seq(("a", 10L, 1), ("a", 20L, 1), ("b", 5L, 1)))
    val s0 = IncrementalView.mergeSigned(None, d0, "__sign", Seq("g"),
      "n", Seq("s" -> col("v")))
    assert(s0.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == Set(("a", 2L, 30L), ("b", 1L, 5L)))
    // retract one 'a' row and ALL of 'b'
    val d1 = signed(Seq(("a", 10L, -1), ("b", 5L, -1), ("c", 7L, 1)))
    val s1 = IncrementalView.mergeSigned(Some(s0), d1, "__sign", Seq("g"),
      "n", Seq("s" -> col("v")))
    assert(s1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == Set(("a", 1L, 20L), ("c", 1L, 7L))) // b vanished
  }

  test("over-retraction surfaces as a negative count, never a silent drop") {
    val s0 = IncrementalView.mergeSigned(None,
      signed(Seq(("a", 10L, 1))), "__sign", Seq("g"), "n", Seq("s" -> col("v")))
    val s1 = IncrementalView.mergeSigned(Some(s0),
      signed(Seq(("a", 10L, -1), ("a", 10L, -1))), "__sign", Seq("g"),
      "n", Seq("s" -> col("v")))
    assert(s1.collect().map(r => r.getLong(1)).toSeq == Seq(-1L))
  }

  test("min/max repair recomputes ONLY retracted-from groups, exactly") {
    import spark.implicits._
    val mmSpecs = Seq(minOf(col("v"), "lo"), maxOf(col("v"), "hi"))
    val base0 = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val view0 = IncrementalView.aggregate(base0, Seq("g"), mmSpecs)
    // delta retracts a's MAX (the non-algebraic case) and b entirely
    val delta = signed(Seq(("a", 20L, -1), ("b", 5L, -1), ("b", 9L, -1)))
    val live = Seq(("a", 10L)).toDF("g", "v")
    val repaired = IncrementalView.repairMinMax(view0, live, delta, "__sign",
      Seq("g"), mmSpecs)
    assert(repaired.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("a", 10L, 10L))) // a's max fell back to 10; b gone
  }

  test("signed fold + repair equals the direct aggregate over the live set") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val inserts = (0 until 500).map(i => (s"g${i % 5}", rnd.nextInt(1000).toLong))
    val retractIdx = rnd.shuffle(inserts.indices.toList).take(200).toSet
    val live = inserts.zipWithIndex.collect {
      case (r, i) if !retractIdx.contains(i) => r
    }
    val d0 = signed(inserts.map { case (g, v) => (g, v, 1) })
    val d1 = signed(inserts.zipWithIndex.collect {
      case ((g, v), i) if retractIdx.contains(i) => (g, v, -1)
    })
    val alg = IncrementalView.mergeSigned(
      Some(IncrementalView.mergeSigned(None, d0, "__sign", Seq("g"),
        "n", Seq("s" -> col("v")))),
      d1, "__sign", Seq("g"), "n", Seq("s" -> col("v")))
    val mmSpecs = Seq(minOf(col("v"), "lo"), maxOf(col("v"), "hi"))
    val liveDf = live.toDF("g", "v")
    val mm = IncrementalView.repairMinMax(
      IncrementalView.aggregate(d0, Seq("g"), mmSpecs), liveDf, d1, "__sign",
      Seq("g"), mmSpecs)
    val got = alg.join(mm, Seq("g"))
    val want = liveDf.groupBy("g").agg(count(lit(1)).cast("long").as("n"),
      sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch contracts: one-sided error on random corpora,
  * merge ≡ sketch-of-concatenation (the property that lets per-day
  * sketches roll up), exactness when the width dominates the key
  * universe, and the broadcast probe shape.
  */
class CountMinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpus(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // Zipf-ish: low ids dominate
    (1 to n).map(_ => s"w${(math.sqrt(rnd.nextInt(400)).toInt)}").toDF("word")
  }

  test("estimates are one-sided: est >= exact for every key, absent keys -> 0") {
    import spark.implicits._
    val c = corpus(1, 2000)
    val sk = CountMin.build(c, "word", depth = 4, width = 64) // narrow: force collisions
    val probes = ((0 to 20).map(i => s"w$i") :+ "absent").toDF("word")
    val est = CountMin.estimate(sk, probes, "word", 4, 64)
    val exact = c.groupBy("word").agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, est("k") === exact("word"), "left")
      .select(col("k"), col("est"), coalesce(col("exact"), lit(0L)).as("exact"))
      .collect()
    assert(joined.length == 22)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"${r.getString(0)}: est ${r.getLong(1)} < exact ${r.getLong(2)}"))
    assert(joined.find(_.getString(0) == "absent").isDefined)
  }

  test("merge of part-sketches == sketch of the concatenation") {
    val a = corpus(2, 1500)
    val b = corpus(3, 900)
    val merged = CountMin.merge(Seq(
      CountMin.build(a, "word", 4, 128),
      CountMin.build(b, "word", 4, 128)))
    val whole = CountMin.build(a.unionByName(b), "word", 4, 128)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("width >> distinct keys: estimates are exact (no collisions to absorb)") {
    import spark.implicits._
    val c = corpus(4, 1000) // ~20 distinct keys
    val sk = CountMin.build(c, "word", 4, 1 << 16)
    val probes = c.select("word").distinct()
    val bad = CountMin.estimate(sk, probes, "word", 4, 1 << 16)
      .join(c.groupBy("word").agg(count(lit(1)).as("exact")),
        col("k") === col("word"))
      .filter(col("est") =!= col("exact"))
    assert(bad.count() == 0)
  }

  test("inner product is one-sided: est >= exact join size, exact when width dominates") {
    import spark.implicits._
    val a = corpus(6, 3000)
    val b = corpus(7, 1200)
    val exact = a.join(b, "word").count()
    // narrow sketch: collisions guaranteed, estimate must stay >= exact
    val narrow = CountMin.innerProduct(
      CountMin.build(a, "word", 4, 32),
      CountMin.build(b, "word", 4, 32), 4).collect()(0).getLong(0)
    assert(narrow >= exact, s"narrow $narrow < exact $exact")
    // wide sketch: ~20 distinct keys in 2^16 cells -> no collisions,
    // every row's dot product IS the true inner product
    val wide = CountMin.innerProduct(
      CountMin.build(a, "word", 4, 1 << 16),
      CountMin.build(b, "word", 4, 1 << 16), 4).collect()(0).getLong(0)
    assert(wide == exact, s"wide $wide != exact $exact")
  }

  test("inner product of disjoint key sets reaches 0 through the row spine") {
    import spark.implicits._
    // wide sketches of disjoint singletons: no (row, cell) collides, the
    // dots relation is EMPTY — only the 0..depth-1 spine lets the min
    // see the zero rows (an inner-join-only estimator would return no
    // rows or a garbage min here)
    val est = CountMin.innerProduct(
      CountMin.build(Seq("only_a").toDF("word"), "word", 4, 1 << 16),
      CountMin.build(Seq("only_b").toDF("word"), "word", 4, 1 << 16), 4)
      .collect()(0).getLong(0)
    assert(est == 0L)
  }

  test("inner product is symmetric and rejects non-sketch relations") {
    import spark.implicits._
    val sa = CountMin.build(corpus(8, 800), "word", 4, 64)
    val sb = CountMin.build(corpus(9, 600), "word", 4, 64)
    assert(CountMin.innerProduct(sa, sb, 4).collect()(0).getLong(0) ==
      CountMin.innerProduct(sb, sa, 4).collect()(0).getLong(0))
    intercept[IllegalArgumentException] {
      CountMin.innerProduct(sa, Seq(("x", 1L)).toDF("word", "c"), 4)
    }
  }

  test("probe joins broadcast the sketch side, never shuffling the key set") {
    val c = corpus(5, 500)
    val sk = CountMin.build(c, "word", 4, 256)
    val plan = CountMin.estimate(sk, c.select("word"), "word", 4, 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }
}

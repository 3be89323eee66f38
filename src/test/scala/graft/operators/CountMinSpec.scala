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

  // ── sketch-driven skew planning (SkewJoin.sketchHotKeys/PlannedJoin) ──

  private def skewed(nCold: Int, coldEach: Int, hotEach: Int) = {
    import spark.implicits._
    val cold = (1 to nCold).flatMap(i => Seq.fill(coldEach)(i.toLong))
    (cold ++ Seq.fill(hotEach)(0L)).toDF("k")
  }

  test("sketchHotKeys finds exactly the planted heavy key at a wide width") {
    import spark.implicits._
    val big = skewed(nCold = 50, coldEach = 10, hotEach = 500)
    val dim = (0 to 60).map(_.toLong).toDF("k") // includes keys absent from big
    val sk = CountMin.build(big, "k", 4, 1024)
    val hot = SkewJoin.sketchHotKeys(sk, dim, "k",
      minCount = 100L, depth = 4, width = 1024)
    assert(hot == Seq(Seq(0L)), hot.toString)
  }

  test("a narrow (collision-heavy) sketch can only over-salt, never miss") {
    import spark.implicits._
    val big = skewed(nCold = 50, coldEach = 10, hotEach = 500)
    val dim = (0 to 60).map(_.toLong).toDF("k")
    val sk = CountMin.build(big, "k", 2, 4) // 8 cells for 51 keys
    val hot = SkewJoin.sketchHotKeys(sk, dim, "k",
      minCount = 100L, depth = 2, width = 4)
    assert(hot.contains(Seq(0L)), s"one-sided error still missed the hot key: $hot")
  }

  test("sketchPlannedJoin is exactly the plain join, hot or not") {
    import spark.implicits._
    val big = skewed(nCold = 30, coldEach = 8, hotEach = 300)
      .withColumn("payload", col("k") * 7)
    val dim = (0 to 40).map(i => (i.toLong, s"seg${i % 3}")).toDF("k", "seg")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "seg").collect()
        .map(_.toString).sorted.toSeq
    val plain = canon(big.join(dim, Seq("k")))
    // threshold low enough to fire the hybrid path
    assert(canon(SkewJoin.sketchPlannedJoin(big, dim, "k",
      minHotCount = 100L, saltBuckets = 4)) == plain)
    // threshold too high: detector returns nothing, plain-join fallback
    assert(canon(SkewJoin.sketchPlannedJoin(big, dim, "k",
      minHotCount = 10000L, saltBuckets = 4)) == plain)
  }

  test("heaviestKeyBound bounds every key from above; 0 for an empty sketch") {
    import spark.implicits._
    val big = skewed(nCold = 50, coldEach = 10, hotEach = 500)
    val sk = CountMin.build(big, "k", 4, 1024)
    val bound = CountMin.heaviestKeyBound(sk)
    val trueMax = big.groupBy("k").count().agg(max("count")).head().getLong(0)
    assert(bound >= trueMax, s"bound $bound < true max $trueMax")
    // wide sketch, 51 keys: the hot row-max is the hot key itself
    assert(bound <= trueMax + 50L * 10L, s"bound $bound implausibly loose")
    assert(CountMin.heaviestKeyBound(
      CountMin.build(Seq.empty[Long].toDF("k"), "k", 4, 64)) == 0L)
  }

  test("a clearing bound skips hot-key detection: the candidate probe never runs") {
    import spark.implicits._
    // uniform big side: every key 10x, so the row-max bound is far
    // below the threshold and NO key can be hot
    val big = (0 until 50).flatMap(k => Seq.fill(10)(k.toLong)).toDF("k")
      .withColumn("payload", col("k") * 7)
    // poisoned dimension KEY: any evaluation of the candidate probe
    // (sketchHotKeys collects eagerly) throws; the lazily-returned
    // plain join is never materialized here
    val poisonedDim = spark.range(5)
      .select(expr("CAST(raise_error('candidate probe ran under a clearing bound') AS BIGINT)").as("k"))
    val out = SkewJoin.sketchPlannedJoin(big, poisonedDim, "k",
      minHotCount = 100L, saltBuckets = 4)
    assert(out.columns.contains("k"), "plain-join plan expected")
    // and with a REAL dimension the result is exactly the plain join
    val dim = (0 to 60).map(i => (i.toLong, s"seg${i % 3}")).toDF("k", "seg")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "seg").collect().map(_.toString).sorted.toSeq
    assert(canon(SkewJoin.sketchPlannedJoin(big, dim, "k",
      minHotCount = 100L, saltBuckets = 4)) == canon(big.join(dim, Seq("k"))))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Compaction, Constraints, Sampling}
import graft.sources.SnapshotStore

/** Model-based property tests for the round-8 platform operators:
  * each operator is replayed by a driver-side reference model on
  * seeded-random inputs and must agree exactly.
  */
class AnalyticsPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("constraints agree with a driver-side model on random null-riddled data") {
    import Constraints.Rule._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val rows: Seq[(java.lang.Long, String, java.lang.Double)] =
        (1 to 300).map { _ =>
          val k: java.lang.Long =
            if (rnd.nextInt(10) == 0) null else Long.box(rnd.nextInt(40).toLong)
          val s = if (rnd.nextInt(10) == 0) null
            else Seq("F", "O", "P", "X", "Y")(rnd.nextInt(5))
          val v: java.lang.Double =
            if (rnd.nextInt(10) == 0) null else Double.box(rnd.nextInt(200) - 50.0)
          (k, s, v)
        }
      val df = rows.toDF("k", "status", "v")
      val got = Constraints.audit(df, Seq(
          NotNull("k"), Unique(Seq("k")), InSet("status", Seq("F", "O", "P")),
          InRange("v", 0.0, 100.0)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      val ks = rows.map(_._1).filter(_ != null).map(_.longValue)
      assert(got("not_null(k)") == rows.count(_._1 == null))
      assert(got("unique(k)") == ks.size - ks.distinct.size)
      assert(got("in_set(status)") ==
        rows.map(_._2).count(s => s != null && !Seq("F", "O", "P").contains(s)))
      assert(got("in_range(v)") ==
        rows.map(_._3).count(v => v != null && (v < 0.0 || v > 100.0)))
    }
  }

  test("snapshot store: random commit sequences keep history and reads coherent") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dir = Files.createTempDirectory("graft-snapprop").toFile
    dir.deleteOnExit()
    val st = new SnapshotStore(spark, dir.getAbsolutePath + "/t")
    var model = Vector.empty[(Long, Int)] // (version, rows)
    (0 until 6).foreach { i =>
      val n = rnd.nextInt(50) + 1
      val v = st.commit((0 until n).map(_.toLong).toDF("x"), commitTsMillis = i * 100L)
      model :+= (v, n)
      assert(v == i.toLong)
      assert(st.readLatest().count() == n)
    }
    assert(st.history().map(t => (t._1, t._3)) == model.map(t => (t._1, t._2.toLong)))
    // every generation still readable with its own row count
    model.foreach { case (v, n) => assert(st.read(v).count() == n) }
    // random as-of points resolve to the floor version
    (0 until 10).foreach { _ =>
      val ts = rnd.nextInt(600).toLong
      val expect = model.filter(_._1 * 100 <= ts).lastOption
      expect match {
        case Some((_, n)) => assert(st.asOf(ts).count() == n)
        case None => intercept[IllegalArgumentException](st.asOf(ts))
      }
    }
  }

  test("weighted sample: ranks contiguous per stratum, subset of input, w<=0 excluded") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (1 to 400).map(i =>
      (i.toLong, s"s${rnd.nextInt(7)}", rnd.nextInt(12).toLong - 1))
    val df = rows.toDF("id", "stratum", "w")
    val got = Sampling.weightedSample(df, "id", "w", "stratum", 4)
      .select("stratum", "sample_rank", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val eligible = rows.filter(_._3 > 0).groupBy(_._2)
    got.groupBy(_._1).foreach { case (s, xs) =>
      val expect = math.min(4, eligible.getOrElse(s, Nil).size)
      assert(xs.map(_._2).sorted.toSeq == (1 to expect), s"ranks not contiguous in $s")
    }
    val byId = rows.map(r => r._1 -> r).toMap
    got.foreach { case (s, _, id) =>
      assert(byId(id)._2 == s && byId(id)._3 > 0)
    }
  }

  test("tokenBudgetAdmit: NULL domains form their own partition (≡ naive window model)") {
    import spark.implicits._
    val rows: Seq[(String, Long, Long, Long)] = Seq(
      ("a", 1L, 90L, 40L), ("a", 2L, 80L, 40L), ("a", 3L, 70L, 40L),
      (null, 4L, 95L, 50L), (null, 5L, 60L, 50L), (null, 6L, 50L, 50L))
    val df = rows.toDF("domain", "id", "quality", "tokens")
    val got = Sampling.tokenBudgetAdmit(df, "domain", "id", "quality", "tokens",
        budget = 100L, bucketWidth = 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    // driver model: per domain (NULL its own), quality desc, admit while cum <= budget
    val expect = rows.groupBy(_._1).flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(d => (-d._3, d._2)).takeWhile { d => cum += d._4; cum <= 100L }
        .map(_._2)
    }.toSet
    assert(expect == Set(1L, 2L, 4L, 5L), "model sanity")
    assert(got == expect)
  }

  test("compaction preserves random tables and respects the file budget") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    (1 to 2).foreach { _ =>
      val n = rnd.nextInt(3000) + 500
      val target = rnd.nextInt(900) + 100
      val dir = Files.createTempDirectory("graft-compprop").toFile
      dir.deleteOnExit()
      val path = dir.getAbsolutePath + "/t"
      val data = (0 until n).map(i => (rnd.nextInt(100000).toLong, i.toLong))
      data.toDF("k", "payload").repartition(17)
        .write.mode("overwrite").parquet(path)
      val rep = Compaction.compact(spark, path, col("k"), target.toLong)
      assert(rep.rows == n)
      assert(rep.filesAfter <= math.ceil(n.toDouble / target).toInt + 1)
      val back = spark.read.parquet(path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(back.toSeq == data.sorted)
    }
  }
}

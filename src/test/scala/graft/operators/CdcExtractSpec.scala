package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MorStore

/** CDC extraction: the diff is minimal (unchanged keys emit nothing),
  * complete (replaying it onto the old snapshot reproduces the new
  * one exactly — via a real MorStore commit), and null-safe.
  */
class CdcExtractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (Long, Option[Long], String)*) = {
    import spark.implicits._
    rows.toDF("k", "v", "tag")
  }

  test("diff emits exactly the inserts, updates, deletes; unchanged keys nothing") {
    val old = df((1L, Some(10L), "a"), (2L, Some(20L), "b"), (3L, Some(30L), "c"))
    val nw = df((1L, Some(10L), "a"), (2L, Some(21L), "b"), (4L, Some(40L), "d"))
    val ch = CdcExtract.changes(old, nw, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(ch == Set((2L, "U"), (3L, "D"), (4L, "U")))
  }

  test("null-safe compare: null -> value and value -> null are changes; null==null is not") {
    val old = df((1L, None, "a"), (2L, Some(2L), "b"), (3L, None, "c"))
    val nw = df((1L, None, "a"), (2L, None, "b"), (3L, Some(3L), "c"))
    val ch = CdcExtract.changes(old, nw, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(ch == Set((2L, "U"), (3L, "U")))
  }

  test("replay onto a MoR mirror reproduces the new snapshot exactly (random model)") {
    import java.nio.file.Files
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      def snap() = df((1L to 30L).flatMap(k =>
        if (rnd.nextBoolean()) Some((k, Some(rnd.nextInt(5).toLong),
          s"t${rnd.nextInt(3)}")) else None): _*)
      val v0 = snap().localCheckpoint()
      val v1 = snap().localCheckpoint()
      val v2 = snap().localCheckpoint()
      val root = Files.createTempDirectory(s"graft-cdcx$trial").toFile
        .getAbsolutePath + "/t"
      val st = new MorStore(spark, root, Seq("k"))
      st.commitBase(v0, 0L)
      st.commitDelta(CdcExtract.changes(v0, v1, Seq("k")), 1L)
      st.commitDelta(CdcExtract.changes(v1, v2, Seq("k")), 2L)
      val got = st.read()
      assert(got.exceptAll(v2).isEmpty && v2.exceptAll(got).isEmpty,
        s"trial $trial: mirror diverged")
    }
  }

  test("schema mismatch and key-only tables are rejected") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      CdcExtract.changes(a, Seq((1L, 2L)).toDF("k", "w"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      CdcExtract.changes(Seq(Tuple1(1L)).toDF("k"),
        Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    }
  }
}

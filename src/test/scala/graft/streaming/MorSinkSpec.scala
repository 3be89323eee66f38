package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MorStore

/** MorSink: a real Structured Streaming run commits one DELTA per
  * micro-batch (base never rewritten), periodic compaction folds the
  * stack without changing state, and redelivered batch ids no-op.
  */
class MorSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/t"
  }

  private def asMap(st: MorStore): Map[Long, Long] =
    st.read().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stream of CDC deltas applies exactly once; compaction preserves state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val st = new MorStore(spark, freshDir("morsink"), Seq("k"))
    st.commitBase(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), -1L)
    val q = MorSink.attach(
      ms.toDF().toDF("k", "v", "__op"), st, freshDir("morsink-ckpt"),
      compactEvery = 2)
    try {
      ms.addData((3L, 30L, "U"), (1L, 11L, "U")); q.processAllAvailable() // batch 0
      ms.addData((2L, 0L, "D"), (4L, 40L, "U")); q.processAllAvailable()  // batch 1 + compact
      ms.addData((3L, 31L, "U")); q.processAllAvailable()                 // batch 2 on compacted base
    } finally q.stop()
    assert(asMap(st) == Map(1L -> 11L, 3L -> 31L, 4L -> 40L))
    // compaction happened mid-stream: a base generation exists after the deltas
    val kinds = st.generations().map(_._2)
    assert(kinds.count(_ == "base") >= 2, s"no mid-stream compaction in $kinds")
  }

  test("compactEvery bounds the uncompacted delta stack over a long stream") {
    import spark.implicits._
    val st = new MorStore(spark, freshDir("morsink-bound"), Seq("k"))
    st.commitBase(Seq((0L, 0L)).toDF("k", "v"), -1L)
    val compactEvery = 3
    for (b <- 0 until 10) {
      MorSink.appendBatch(st,
        Seq((b + 1L, b * 10L, "U")).toDF("k", "v", "__op"),
        b.toLong, compactEvery = compactEvery)
      // invariant AT EVERY POINT mid-stream, not just at the end: the
      // read path never resolves more than compactEvery deltas
      val gens = st.generations()
      val lastBase = gens.filter(_._2 == "base").map(_._1).max
      val pending = gens.count { case (g, k) => k == "delta" && g > lastBase }
      assert(pending <= compactEvery,
        s"after batch $b: $pending uncompacted deltas > $compactEvery")
    }
    assert(asMap(st) == (0L to 10L).map(k => k -> (if (k == 0) 0L else (k - 1) * 10L)).toMap)
  }

  test("redelivered batch id is a cross-restart no-op") {
    import spark.implicits._
    val st = new MorStore(spark, freshDir("morsink-redeliver"), Seq("k"))
    st.commitBase(Seq((1L, 10L)).toDF("k", "v"), -1L)
    val d0 = Seq((2L, 20L, "U")).toDF("k", "v", "__op")
    assert(MorSink.appendBatch(st, d0, 0L) >= 0L)
    assert(MorSink.appendBatch(st, d0, 0L) == -1L)
    assert(asMap(st) == Map(1L -> 10L, 2L -> 20L))
  }

  test("a restarted handle seeds from the persisted mark: old ids no-op, new ids commit") {
    import spark.implicits._
    val dir = freshDir("morsink-mark")
    val st = new MorStore(spark, dir, Seq("k"))
    st.commitBase(Seq((1L, 10L)).toDF("k", "v"), -1L)
    (0L until 4L).foreach { b =>
      assert(MorSink.appendBatch(st,
        Seq((b + 2L, b * 100L, "U")).toDF("k", "v", "__op"), b) >= 0L)
    }
    // the mark is durable, not just in-memory
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_maxbatch")))
    // restart: a FRESH handle over the same root (the lazy cache is
    // gone) — redelivered ids still no-op, the next id still commits
    val restarted = new MorStore(spark, dir, Seq("k"))
    val replay = Seq((99L, 99L, "U")).toDF("k", "v", "__op")
    (0L until 4L).foreach(b =>
      assert(MorSink.appendBatch(restarted, replay, b) == -1L,
        s"batch $b replayed after restart"))
    assert(MorSink.appendBatch(restarted,
      Seq((9L, 900L, "U")).toDF("k", "v", "__op"), 4L) >= 0L)
    assert(asMap(restarted) ==
      Map(1L -> 10L, 2L -> 0L, 3L -> 100L, 4L -> 200L, 5L -> 300L, 9L -> 900L))
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotStore

/** SnapshotSink: a real Structured Streaming run commits one store
  * generation per micro-batch, redelivered batches no-op (exactly
  * once), and the stream result equals the batch fold the w13 oracle
  * replays.
  */
class SnapshotSinkSpec extends AnyFunSuite {

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

  test("stream commits one generation per micro-batch; result equals the fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val store = new SnapshotStore(spark, freshDir("snapsink-store"))
    val q = SnapshotSink.attach(
      ms.toDF().toDF("event_id", "user_id"), store, freshDir("snapsink-ckpt"))
    try {
      ms.addData((1L, 10L), (2L, 10L)); q.processAllAvailable()
      ms.addData((3L, 11L)); q.processAllAvailable()
      ms.addData((4L, 12L), (5L, 12L)); q.processAllAvailable()
    } finally q.stop()

    assert(store.loggedVersions().size == 3)
    assert(store.readLatest().count() == 5)
    // generation i is the stream's committed prefix after batch i
    assert(store.read(0).count() == 2)
    assert(store.read(1).count() == 3)
    // fold equivalence: same batches through appendBatch directly
    val fold = new SnapshotStore(spark, freshDir("snapsink-fold"))
    Seq(Seq((1L, 10L), (2L, 10L)), Seq((3L, 11L)), Seq((4L, 12L), (5L, 12L)))
      .zipWithIndex.foreach { case (rows, id) =>
        SnapshotSink.appendBatch(fold,
          rows.toDF("event_id", "user_id"), id.toLong)
      }
    val a = store.readLatest().orderBy("event_id").collect().toSeq
    val b = fold.readLatest().orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("redelivered batch id is a no-op (exactly-once on crash replay)") {
    import spark.implicits._
    val store = new SnapshotStore(spark, freshDir("snapsink-replay"))
    val b0 = Seq((1L, 10L), (2L, 10L)).toDF("event_id", "user_id")
    val b1 = Seq((3L, 11L)).toDF("event_id", "user_id")
    assert(SnapshotSink.appendBatch(store, b0, 0L) == 0L)
    assert(SnapshotSink.appendBatch(store, b1, 1L) == 1L)
    // crash replay: batch 1 arrives again
    assert(SnapshotSink.appendBatch(store, b1, 1L) == -1L)
    assert(store.loggedVersions().size == 2)
    assert(store.readLatest().count() == 3)
    assert(store.readLatest().agg(sum("event_id")).head().getLong(0) == 6L)
  }

  test("foldBatch maintains an algebraic summary: fold applies exactly once per batch") {
    import spark.implicits._
    val store = new SnapshotStore(spark, freshDir("snapsink-foldb"))
    // non-append fold: per-key running sum (state stays key-sized)
    val fold: (Option[org.apache.spark.sql.DataFrame],
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      (prev, b) => {
        val bs = b.groupBy("k").agg(sum("v").as("s"))
        prev.map(_.unionByName(bs).groupBy("k").agg(sum("s").as("s")))
          .getOrElse(bs)
      }
    val b0 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val b1 = Seq(("a", 10L)).toDF("k", "v")
    assert(SnapshotSink.foldBatch(store, b0, 0L, fold) == 0L)
    assert(SnapshotSink.foldBatch(store, b1, 1L, fold) == 1L)
    // crash replay: the fold must NOT double-apply (a replayed append
    // merely duplicates rows; a replayed fold would corrupt the sums)
    assert(SnapshotSink.foldBatch(store, b1, 1L, fold) == -1L)
    val got = store.readLatest().orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 11L), ("b", 2L)))
    // state stays summary-sized: 2 rows, not 3 events
    assert(store.readLatest().count() == 2)
  }
}

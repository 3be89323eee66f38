package graft

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcStateStream
import graft.streaming.CdcStateStream.{Change, StateEvent}

/** Stateful streaming CDC view: net-change emission, late-batch
  * suppression, cross-batch state via checkpoint restart.
  */
class CdcStateStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def runStream(batches: Seq[Seq[Change]]): Seq[Seq[StateEvent]] = {
    import spark.implicits._
    val root = Files.createTempDirectory("state").toString
    val results = Seq.newBuilder[Seq[StateEvent]]
    batches.zipWithIndex.foreach { case (batch, i) =>
      // one parquet file per micro-batch, one stream restart per batch —
      // proves the keyed state survives via the checkpoint (memory sink
      // can't recover checkpoints, so collect through foreachBatch)
      batch.toDS().write.parquet(s"$root/in/b$i")
      val collected = new java.util.concurrent.ConcurrentLinkedQueue[StateEvent]()
      val src = spark.readStream
        .schema(spark.read.parquet(s"$root/in/b$i").schema)
        .option("maxFilesPerTrigger", 1000)
        .parquet(s"$root/in/*")
        .as[Change]
      val q = CdcStateStream.netChanges(src)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: Dataset[StateEvent], _: Long) =>
          b.collect().foreach(collected.add)
        }
        .start()
      q.awaitTermination(120000)
      results += collected.toArray(Array.empty[StateEvent]).toSeq
    }
    results.result()
  }

  test("net-change view: upserts, deletes, within-batch dedup, late batch loses") {
    val out = runStream(Seq(
      // batch 0: two versions of key 1 (newest wins), insert key 2
      Seq(
        Change(1L, "I", 100L, 0L, "one-v1"),
        Change(1L, "U", 200L, 1L, "one-v2"),
        Change(2L, "I", 100L, 2L, "two")),
      // batch 1: delete key 2; stale update for key 1 (older loadTs) must lose
      Seq(
        Change(2L, "D", 300L, 0L, "two"),
        Change(1L, "U", 150L, 1L, "one-stale")),
      // batch 2: nothing effectively new for key 1 (same payload, newer ts)
      Seq(
        Change(1L, "U", 400L, 0L, "one-v2"))))

    assert(out(0).map(e => (e.key, e.event, e.payload)).sortBy(_._1) ==
      Seq((1L, "upsert", "one-v2"), (2L, "upsert", "two")))
    assert(out(1).map(e => (e.key, e.event)) == Seq((2L, "delete")))
    assert(out(2).isEmpty) // unchanged payload ⇒ no net change
  }

  test("cross-batch load-timestamp tie: delete still wins (full cascade staleness)") {
    val out = runStream(Seq(
      // batch 0 installs the row at loadTs 100, seq 5
      Seq(Change(1L, "I", 100L, 5L, "one")),
      // batch 1 delivers a delete with the SAME loadTs but lower seq —
      // the cascade says delete wins a load-timestamp tie, and cross-file
      // seq comparison is meaningless (it restarts per file)
      Seq(Change(1L, "D", 100L, 3L, "one"))))
    assert(out(0).map(e => (e.key, e.event)) == Seq((1L, "upsert")))
    assert(out(1).map(e => (e.key, e.event)) == Seq((1L, "delete")))
  }

  test("delete of unknown key emits nothing; reinsert after delete emits upsert") {
    val out = runStream(Seq(
      Seq(Change(9L, "D", 100L, 0L, "ghost")),
      Seq(Change(9L, "I", 200L, 0L, "nine"))))
    assert(out(0).isEmpty)
    assert(out(1).map(e => (e.key, e.event, e.payload)) == Seq((9L, "upsert", "nine")))
  }
}

package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.sources.TableCatalog

/** Property-based check of the unified index's cross-family contract:
  * for ANY interleaving of ingest batches, deletes, redeliveries, and
  * fraction-triggered compactions, (a) the membership invariant holds
  * at every generation, (b) both families' live id sets equal an
  * independent sequential interpreter's surviving ≥1-token docs, and
  * (c) phrase serving from the live positions-free index matches the
  * interpreter's corpus — whether tombstones are currently masked or
  * folded is invisible.
  */
class UnifiedIndexPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  sealed trait Step
  case class Ingest(docs: List[(Long, String)]) extends Step
  case class Delete(ids: List[Long]) extends Step
  case object RedeliverLast extends Step

  private val words = Vector("alpha", "beta", "merge", "scan", "", "x")
  private def textGen: Gen[String] = for {
    n <- Gen.choose(0, 5)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
  } yield ws.mkString(" ")

  // ids are drawn fresh per ingest from a counter the driver owns, so
  // every doc lands in exactly one batch (the maintenance contract)
  private def stepsGen: Gen[List[Step]] = {
    var nextId = 0L
    def ingest: Gen[Step] = for {
      n <- Gen.choose(1, 4)
      texts <- Gen.listOfN(n, textGen)
    } yield Ingest(texts.map { t => nextId += 1; (nextId, t) })
    def delete: Gen[Step] = for {
      n <- Gen.choose(1, 3)
      ids <- Gen.listOfN(n, Gen.choose(1L, math.max(1L, nextId)))
    } yield Delete(ids.distinct)
    Gen.listOfN(6, Gen.frequency(3 -> ingest, 2 -> delete,
      1 -> Gen.const(RedeliverLast)))
  }

  private def samples[T](gen: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("streaming binding: a real foreachBatch stream maintains both families") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val cat = new TableCatalog(spark, java.nio.file.Files
      .createTempDirectory("graft-unistream").toFile.getAbsolutePath + "/cat")
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-unistream-ckpt").toFile.getAbsolutePath)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        UnifiedIndex.commitBatch(cat, batch, id); ()
      }
      .start()
    try {
      ms.addData(1L -> "alpha beta gamma", 2L -> "the quick fox")
      q.processAllAvailable()
      ms.addData(3L -> "merge scan filter")
      q.processAllAvailable()
    } finally q.stop()
    assert(cat.loggedGenerations() == Seq(0L, 1L))
    (0L to 1L).foreach(g => assert(UnifiedIndex.membershipConsistent(cat, Some(g))))
    assert(cat.read("doclen").count() == 3)
    assert(cat.read("sizes").count() == 3)
    // a crash-replay of micro-batch 1 through the same sink no-ops
    assert(UnifiedIndex.commitBatch(cat,
      Seq(3L -> "merge scan filter").toDF("doc_id", "text"), 1L) == -1L)
  }

  test("any interleaving: families stay in lockstep and serve the interpreter's corpus") {
    samples(stepsGen, 6).zipWithIndex.foreach { case (steps, i) =>
      val cat = new TableCatalog(spark, java.nio.file.Files
        .createTempDirectory(s"graft-uniprop$i").toFile.getAbsolutePath + "/cat")
      // the independent interpreter: id -> text of live docs
      var model = Map.empty[Long, String]
      var batchId = 0L
      var last: Option[(Boolean, Any)] = None // (isIngest, payload)
      steps.foreach {
        case Ingest(docs) =>
          UnifiedIndex.commitBatch(cat, docs.toDF("doc_id", "text"), batchId)
          model ++= docs
          last = Some((true, docs)); batchId += 1
        case Delete(ids) =>
          UnifiedIndex.delete(cat, ids.toDF("doc_id"), batchId)
          model --= ids
          last = Some((false, ids)); batchId += 1
        case RedeliverLast =>
          // crash-replay of the previous micro-batch: must no-op and
          // must NOT disturb the model
          last.foreach {
            case (true, docs: List[(Long, String)] @unchecked) =>
              assert(UnifiedIndex.commitBatch(cat,
                docs.toDF("doc_id", "text"), batchId - 1) == -1L)
            case (false, ids: List[Long] @unchecked) =>
              assert(UnifiedIndex.delete(cat,
                ids.toDF("doc_id"), batchId - 1) == -1L)
            case _ => ()
          }
        }
      val built = cat.latestGeneration()
        .exists(g => cat.tableVersions(g).contains("sizes"))
      if (!built) () // no ingest ever happened: nothing to serve
      else {
        // sometimes fold the tombstones: serving must not change
        if (i % 2 == 0)
          IndexMaintenance.compactUnifiedIfNeeded(cat, 1000L, threshold = 1e-9)
        // (a) lockstep at every surviving generation
        cat.loggedGenerations().foreach { g =>
          assert(UnifiedIndex.membershipConsistent(cat, Some(g)),
            s"sample $i: generation $g tore the families apart")
        }
        // (b) both live id sets == interpreter's ≥1-token survivors
        val expected = model.collect {
          case (id, t) if t.trim.split("\\s+").exists(_.nonEmpty) => id
        }.toSet
        val (_, _, sizes) = UnifiedIndex.lshLive(cat)
        val (_, dl) = UnifiedIndex.postingsLive(cat)
        val gateIds = sizes.select("id").collect().map(_.getLong(0)).toSet
        val retrIds = dl.select("doc_id").collect().map(_.getLong(0)).toSet
        assert(gateIds == expected, s"sample $i: gate ids diverged")
        assert(retrIds == expected, s"sample $i: retrieval ids diverged")
        // (c) doclen values match the interpreter's token counts
        val dlMap = dl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val expDl = model.collect {
          case (id, t) if t.trim.split("\\s+").exists(_.nonEmpty) =>
            id -> t.trim.split("\\s+").count(_.nonEmpty).toLong
        }
        assert(dlMap == expDl.toMap, s"sample $i: doc lengths diverged")
      }
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CdcDedup, CdcMerge}

/** Property-based check of the CDC core invariant (SURVEY §5; reference:
  * CRITICAL_FIX_DUPLICATES_ON_MERGE.md:60-63): applying a CDC log through
  * dedup+merge matches an independent sequential interpreter of the same
  * semantics — file-by-file and concatenated — and reapplying a
  * delete-free batch is a no-op.
  *
  * (Merge-level idempotency cannot hold for *unmatched deletes*: the
  * reference's unconditional NOT MATCHED INSERT re-inserts them on
  * replay, which is exactly why file-level exactly-once comes from the
  * ledger — covered in PipelineSpec.)
  */
class CdcPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  case class Op(key: Long, op: String, payload: Long)
  type CdcFile = List[Op]

  val genOp: Gen[Op] = for {
    key <- Gen.choose(1L, 8L) // small key space forces collisions
    op <- Gen.oneOf("I", "U", "D")
    payload <- Gen.choose(0L, 999L)
  } yield Op(key, op, payload)

  val genFile: Gen[CdcFile] = Gen.listOfN(8, genOp)
  val genUpsertFile: Gen[CdcFile] =
    Gen.listOfN(8, genOp.map(o => if (o.op == "D") o.copy(op = "U") else o))
  val genLog: Gen[List[CdcFile]] = Gen.listOfN(3, genFile)

  /** Deterministic sampling in place of scalatest+scalacheck glue (the
    * scalatestplus bridge artifact is not in the offline cache).
    */
  def samples[T](gen: Gen[T], n: Int, seed: Long = 42L): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  val initialState: Map[Long, Long] = Map(1L -> -1L, 2L -> -2L, 3L -> -3L)

  /** Interpreter of one file batch: per key, winner by (Op priority D>U>I,
    * then file row order; load_timestamp is constant within a file);
    * winner D removes a present key and *inserts* an absent one (the
    * unconditional NOT MATCHED INSERT, handler.py:608-613); else upsert.
    */
  def interpretFile(state: Map[Long, Long], file: CdcFile): Map[Long, Long] = {
    val winners = file.zipWithIndex.groupBy(_._1.key).map { case (k, ops) =>
      k -> ops.maxBy { case (o, idx) =>
        (o.op match { case "D" => 3; case "U" => 2; case "I" => 1; case _ => 0 }, idx)
      }._1
    }
    winners.foldLeft(state) { case (st, (k, o)) =>
      if (o.op == "D") { if (st.contains(k)) st - k else st + (k -> o.payload) }
      else st + (k -> o.payload)
    }
  }

  def toDf(state: Map[Long, Long]): DataFrame = {
    import spark.implicits._
    state.toSeq.toDF("id", "payload")
  }

  /** One file as staging: constant per-file load_timestamp increasing with
    * file number (DMS write time), ingestion_seq = row order.
    */
  def fileDf(file: CdcFile, fileNo: Int): DataFrame = {
    import spark.implicits._
    file.zipWithIndex.map { case (o, idx) =>
      (o.key, o.payload, o.op,
        java.sql.Timestamp.valueOf(f"2026-01-${fileNo + 1}%02d 00:00:00"),
        idx.toLong)
    }.toDF("id", "payload", "Op", "load_timestamp", "ingestion_seq")
  }

  def applyFile(target: DataFrame, file: CdcFile, fileNo: Int): DataFrame = {
    val dedup = CdcDedup.dedup(fileDf(file, fileNo), Seq("id"), gate = true)
    CdcMerge(target, dedup, Seq("id"))
  }

  def stateOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("property: sequential file application ≡ independent interpreter") {
    samples(genLog, 8).foreach { log =>
      val expected = log.foldLeft(initialState)(interpretFile)
      val actual = log.zipWithIndex.foldLeft(toDf(initialState)) {
        case (df, (f, i)) => applyFile(df, f, i)
      }
      assert(stateOf(actual) == expected, s"log=$log")
    }
  }

  test("property: one concatenated batch ≡ cross-file cascade interpreter") {
    samples(genLog, 8, seed = 4242L).foreach { log =>
      // across files, load_timestamp decides: only the LAST file touching
      // a key contributes its (per-file) winner; apply those winners once
      val expected = {
        val lastFileNo = log.zipWithIndex.flatMap { case (f, i) =>
          f.map(o => o.key -> i)
        }.toMap
        lastFileNo.foldLeft(initialState) { case (st, (k, i)) =>
          interpretFile(st, log(i).filter(_.key == k))
        }
      }
      val union = log.zipWithIndex.map { case (f, i) => fileDf(f, i) }
        .reduce(_.unionAll(_))
      val dedup = CdcDedup.dedup(union, Seq("id"), gate = true)
      val batched = CdcMerge(toDf(initialState), dedup, Seq("id"))
      assert(stateOf(batched) == expected, s"log=$log")
    }
  }

  test("property: reapplying a delete-free batch is a no-op") {
    samples(genUpsertFile, 8, seed = 777L).foreach { file =>
      val once = applyFile(toDf(initialState), file, 0)
      val twice = applyFile(once, file, 0)
      assert(stateOf(once) == stateOf(twice), s"file=$file")
    }
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifetime contract of [[CacheScope]]: the default
  * process-owned scope keeps operator-internal persists alive (the
  * historical behavior the bench/driver rely on, clearing between
  * queries), while [[CacheScope.scoped]] releases every relation the
  * block's operator calls persisted — on success AND on failure.
  * Assertions stay on state this spec owns (tracked counts and
  * storage levels of its own frames): suites share the JVM-wide
  * session, so global cache-manager checks would race other suites.
  */
class CacheScopeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "an entirely different document about spark query planning")
    ).toDF("doc_id", "text")
  }

  test("scoped releases the persists an operator acquired; result stays correct") {
    val (pairs, scope) = CacheScope.scoped { implicit cs =>
      val out = TextDedup.minhashLshPairs(docs, "doc_id", "text").collect()
      // shingles + candidates go through the scope (band keys are
      // operator-owned and already released internally)
      assert(cs.trackedCount == 2)
      (out, cs)
    }
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(scope.trackedCount == 0) // release() drained the tracked list
  }

  test("scoped releases on the failure path too") {
    val df = docs
    intercept[RuntimeException] {
      CacheScope.scoped { cs =>
        cs.persist(df)
        df.count()
        assert(df.storageLevel != StorageLevel.NONE)
        throw new RuntimeException("boom")
      }
    }
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("process-owned default keeps caches (historical contract)") {
    val df = docs
    CacheScope.processOwned.persist(df)
    df.count()
    assert(df.storageLevel != StorageLevel.NONE) // nothing auto-releases it
    assert(CacheScope.processOwned.trackedCount == 0) // and nothing ever will
    df.unpersist()
  }
}

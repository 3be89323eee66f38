package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifetime contract of [[CacheScope]]: the default
  * process-owned scope keeps operator-internal persists alive (the
  * historical behavior the bench/driver rely on, clearing between
  * queries), while [[CacheScope.scoped]] releases every relation the
  * block's operator calls persisted — on success AND on failure.
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
    val pairs = CacheScope.scoped { implicit cs =>
      val out = TextDedup.minhashLshPairs(docs, "doc_id", "text").collect()
      // shingles + candidates go through the scope (band keys are
      // operator-owned and already released internally)
      assert(cs.trackedCount == 2)
      out
    }
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // nothing the scope tracked survives it: the SQL cache holds no
    // entries from this block (the fixture session is spec-local, so
    // any surviving entry would be ours)
    assert(spark.sharedState.cacheManager.isEmpty)
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
    spark.catalog.clearCache()
    TextDedup.containmentPairsPrefix(docs, "doc_id", "text").collect()
    // shingle + candidate relations persist past the call by design
    assert(!spark.sharedState.cacheManager.isEmpty)
    spark.catalog.clearCache()
  }
}

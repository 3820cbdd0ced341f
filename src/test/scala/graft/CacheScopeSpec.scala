package graft

import org.apache.spark.storage.StorageLevel

/** The query-scoped cache lifecycle: operators register persisted
  * intermediates, the query runner drains them post-action. */
class CacheScopeSpec extends SparkSpec {

  test("persist registers at MEMORY_AND_DISK; drain releases; re-use recomputes safely") {
    val df = spark.range(1000).toDF("id")
    CacheScope.persist(df)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(df.count() == 1000)
    CacheScope.drain()
    assert(df.storageLevel == StorageLevel.NONE)
    // a drained frame is still usable — it just recomputes from lineage
    assert(df.count() == 1000)
    // drain is idempotent and empty-safe
    CacheScope.drain()
  }

  test("drain releases every frame registered since the last drain") {
    val a = spark.range(10).toDF("a")
    val b = spark.range(20).toDF("b")
    CacheScope.persist(a)
    CacheScope.persist(b)
    CacheScope.drain()
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
  }
}

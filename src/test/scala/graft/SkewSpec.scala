package graft

import graft.relational.Skew
import org.apache.spark.sql.functions._

/** Salted join/aggregation must be result-identical to the naive forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (1) with 500 rows, long tail of singletons
  private def big = ((1 to 500).map(i => (1L, s"v$i")) ++
    (2L to 50L).map(k => (k, s"w$k"))).toDF("k", "payload")
  private def small = Seq((1L, "one"), (2L, "two"), (7L, "seven")).toDF("k", "name")

  test("salted join equals plain join") {
    val plain = big.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("salted count equals plain count") {
    val plain = big.groupBy("k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    val salted = Skew.saltedCount(big, "k", salts = 8)
      .as[(Long, Long)].collect().toSet
    assert(salted == plain)
  }
}

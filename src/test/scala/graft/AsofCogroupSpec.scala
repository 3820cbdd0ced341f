package graft

import graft.relational.Relational

/** Tie semantics of the cogroup as-of merge: identical to the window
  * form's (ts_us, event_id) row ordering. */
class AsofCogroupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "event_id", "ts_us", "event_type")

  test("same-timestamp click counts only when its event_id is lower") {
    val d = ev(
      (1L, 1L, 100L, "click"),    // same ts, lower id -> counts for p2
      (1L, 2L, 100L, "purchase"),
      (1L, 3L, 100L, "click"),    // same ts, higher id -> not for p2
      (1L, 4L, 200L, "purchase"), // sees click 3 (ts 100 < 200)
      (2L, 5L, 50L, "purchase"))  // user 2 never clicked -> nulls
    val m = Relational.asofCogroup(d).collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
    assert(m(2L) === ((Some(100L), Some(0L))))
    assert(m(4L) === ((Some(100L), Some(100L))))
    assert(m(5L) === ((None, None)))
  }
}

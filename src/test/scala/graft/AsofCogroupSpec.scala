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

  test("funnel counts only ordered view -> click -> purchase progressions") {
    val d = ev(
      // user 1: full ordered funnel
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"), (1L, 3L, 300L, "purchase"),
      // user 2: click BEFORE first view -> stalls at the view stage
      (2L, 4L, 100L, "click"), (2L, 5L, 200L, "view"),
      // user 3: view then purchase but never clicks -> stalls after view
      (3L, 6L, 100L, "view"), (3L, 7L, 200L, "purchase"),
      // user 4: purchase before the click -> reaches click stage only
      (4L, 8L, 100L, "view"), (4L, 9L, 150L, "purchase"), (4L, 10L, 200L, "click"),
      // user 5: never views -> not in the funnel at all
      (5L, 11L, 100L, "purchase"))
    val r = Relational.funnelQuery(d).collect().head
    // viewed: 1,2,3,4; clicked at-or-after first view: 1,4 (user 2's
    // click predates their view); purchased after that click: 1 only
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 2L, 1L)))
  }

  test("trailing-hour RANGE frame includes all tied timestamps, drops the hour-old row") {
    val hour = 3600000000L
    val d = Seq(
      (1L, 1L, 0L, "view", 1.0),
      (1L, 2L, hour, "view", 2.0), // exactly 1h later: row 1 still in frame
      (1L, 3L, hour + 1, "view", 4.0), // 1h+1µs after row 1: row 1 drops
      (1L, 4L, hour + 1, "view", 8.0)) // tied ts: both tied rows share one frame
      .toDF("user_id", "event_id", "ts_us", "event_type", "value")
    val m = Relational.trailingHourValue(d).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(m(1L) === 1.0)
    assert(m(2L) === 3.0) // 1 + 2 (range is inclusive both ends)
    // rows 3 and 4 tie on ts: each frame holds rows 2, 3 AND 4 = 14
    assert(m(3L) === 14.0 && m(4L) === 14.0)
  }
}

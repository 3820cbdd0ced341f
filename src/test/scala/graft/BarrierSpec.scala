package graft

import graft.functions.Barrier
import graft.pipeline.{Quality, Stage}
import org.apache.spark.sql.functions._

/** The plan-barrier expression: value transparency, plan shape (the whole
  * point: filters must NOT be pushed below a barrier-wrapped projection),
  * and the events loader's dual physical encodings. */
class BarrierSpec extends SparkSpec {
  import spark.implicits._

  test("barrier is value-transparent, including nulls") {
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
      .select(Barrier(upper($"s")).as("u"))
    assert(df.as[Option[String]].collect().toSet == Set(Some("ABC"), None, Some("")))
  }

  test("a filter on a barrier-wrapped column stays above the projection") {
    // must be a file-backed source: a LocalRelation plan gets partially
    // evaluated by the optimizer and carries no Filter node at all
    val dir = java.nio.file.Files.createTempDirectory("graft-bar").toString
    Seq(("a", 1), ("bb", 2), ("ccc", 3)).toDF("s", "i")
      .write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val expensive = length(concat($"s", lit("x"))) // stand-in for a costly expr
    val plan = base.select($"i", Stage.once(expensive).as("len"))
      .filter($"len" >= 2)
      .queryExecution.optimizedPlan
    // without the barrier, PushDownPredicates rewrites this to
    // Filter(length(concat(...)) >= 2) directly over the relation and the
    // filter no longer references the projected attribute
    val filters = plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.nonEmpty)
    val referencesAlias = filters.exists(_.condition.references.exists(_.name == "len"))
    assert(referencesAlias, s"filter was inlined past the barrier:\n$plan")
  }

  test("barrier-wrapped quality reason equals the unwrapped cascade") {
    val docs = Seq(
      (1L, ("word " * 60).trim, "en", "s", 300L),
      (2L, "tiny", "en", "s", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val reasons = Quality.withReason(docs).select("doc_id", "reason")
      .as[(Long, String)].collect().toMap
    assert(reasons(2L) == "too_short")
    assert(Set("passed", "short_avg_word_length")(reasons(1L)))
  }

  test("events loader normalizes a timestamp-typed copy to the ns-long surface") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    // a Spark-written copy carries ts as TIMESTAMP_NTZ/TIMESTAMP, not INT64-nanos
    spark.sql(
      """SELECT 1L AS event_id, 7L AS user_id,
        |       timestamp'2026-01-02 03:04:05.123456' AS ts,
        |       'click' AS kind, 1.5 AS value, '{}' AS props""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts_ns").dataType.typeName == "long")
    val ns = ev.select("ts_ns").as[Long].head()
    val expectedUs = java.time.LocalDateTime
      .of(2026, 1, 2, 3, 4, 5, 123456000)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(ns == expectedUs.getEpochSecond * 1000000000L + 123456000L)
  }
}

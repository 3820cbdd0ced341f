package graft

/** Bucketing for co-located joins — the 100 TB pattern the brief calls
  * out: pre-bucket both sides on the join key so the join needs NO
  * exchange at read time (each bucket pair joins locally). */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val db = "graft_bucket_test" // lands in the suite's temp warehouse dir
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      val facts = (1L to 1000L).map(i => (i % 50, s"payload$i")).toDF("k", "p")
      val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "d")
      facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable(s"$db.facts_b")
      dims.write.mode("overwrite").bucketBy(8, "k")
        .saveAsTable(s"$db.dims_b")
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$db.facts_b").join(spark.table(s"$db.dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}

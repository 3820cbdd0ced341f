package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Contamination

/** Scale probe for the fuzzy decontamination tier's |bench| constant
  * (round-9 verdict #5): the gate corpus pins `BenchmarkDocs = 10`,
  * which cannot expose a cost proportional to the benchmark size — a
  * real eval suite is 10^4–10^5 items. This harness times
  * [[Contamination.fuzzyContaminationQuery]] at an arbitrary
  * `benchDocs`, and optionally the RETIRED `arrays_overlap` broadcast
  * nested-loop spelling (`--old`) for a before/after on the same data.
  *
  * Usage: runMain graft.ProbeContamination <dir> <benchDocs> [--old]
  * Prints one line: `probe_fuzzy dir=<dir> bench=<n> mode=<new|old> sec=<s> rows=<k>`.
  */
object ProbeContamination {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val benchDocs = args.lift(1).map(_.toInt).getOrElse(1000)
    val old = args.contains("--old")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val q =
      if (!old) Contamination.fuzzyContaminationQuery(docs, benchDocs)
      else {
        // the pre-round-10 plan, verbatim shape: broadcast nested-loop
        // with an arrays_overlap predicate over ALL (train, bench) pairs.
        val tri = docs.select(col("doc_id"), graft.functions.Trigrams(col("text")).as("ga"))
          .filter(size(col("ga")) > 0)
        val bench = tri.filter(col("doc_id") < benchDocs)
          .select(col("doc_id").as("bench_id"), col("ga").as("bga"))
        tri.filter(col("doc_id") >= benchDocs)
          .join(broadcast(bench), arrays_overlap(col("ga"), col("bga")))
          .select(col("doc_id"),
            size(array_intersect(col("ga"), col("bga"))).cast("double").as("inter"),
            (size(col("ga")) + size(col("bga"))).cast("double").as("sz"))
          .select(col("doc_id"), (col("inter") / (col("sz") - col("inter"))).as("jac"))
          .groupBy(col("doc_id"))
          .agg(max(col("jac")).as("max_jaccard"))
      }
    val t0 = System.nanoTime()
    q.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = q.count()
    println(f"probe_fuzzy dir=$dir bench=$benchDocs mode=${if (old) "old" else "new"} sec=$sec%.2f rows=$rows")
    spark.stop()
  }
}

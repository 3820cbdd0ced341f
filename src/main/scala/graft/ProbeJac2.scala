package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: jaccard stage timing after a preceding query (deleted after tuning). */
object ProbeJac2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfX")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    // the suspect predecessor
    time("dedup_exact")(
      pipeline.Dedup.queries("dedup_exact")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val trigramsUdf = udf(pipeline.NearDup.trigrams _)
    val gramsArr = docs.select(col("doc_id"), trigramsUdf(col("text")).as("ga"))
    val grams = gramsArr.withColumn("n", size(col("ga")))
      .select(col("doc_id"), col("n"), explode(col("ga")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("grams materialize")(grams.count())
    val gramDict = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .withColumn("gid", row_number().over(Window.orderBy(col("df"), col("g"))))
      .select("g", "gid")
    val gramsG = grams.join(gramDict, "g")
      .select(col("doc_id"), col("n"), col("gid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("gramsG materialize")(gramsG.count())
    val t = pipeline.NearDup.JaccardNumer.toDouble / pipeline.NearDup.JaccardDenom
    val prefix = gramsG
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("gid"))))
      .filter(col("rk") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select(col("doc_id"), col("gid"), col("n"), col("rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] prefix rows = ${time("prefix materialize")(prefix.count())}")
    val N = pipeline.NearDup.JaccardNumer
    val D = pipeline.NearDup.JaccardDenom
    val sumN = col("x.n") + col("y.n")
    val ubound = lit(1) + least(col("x.n") - col("x.rk"), col("y.n") - col("y.rk"))
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id") &&
          lit(N) * greatest(col("x.n"), col("y.n")) <= lit(D) * least(col("x.n"), col("y.n")) &&
          lit(D + N) * ubound >= lit(N) * sumN)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    val gidArr = gramsG.groupBy("doc_id")
      .agg(sort_array(collect_list(col("gid"))).as("ga"))
    val out = cand
      .join(broadcast(gidArr.select(col("doc_id").as("id_a"), col("ga").as("ga_a"))), "id_a")
      .join(broadcast(gidArr.select(col("doc_id").as("id_b"), col("ga").as("ga_b"))), "id_b")
      .withColumn("inter", size(array_intersect(col("ga_a"), col("ga_b"))))
      .filter(lit(D) * col("inter") >= lit(N) * (size(col("ga_a")) + size(col("ga_b")) - col("inter")))
      .groupBy(col("id_b").as("duplicate_id"))
      .agg(min(col("id_a")).as("original_id"))
    println(s"[probe] dups = ${time("cand+verify+agg")(out.count())}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation for the minhash LSH join (deleted after tuning). */
object ProbeMh {
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
    import pipeline.MinHash._
    val docs = Tables.documents(spark, dir)
    val sigs = signatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] sigs = ${time("sigs materialize")(sigs.count())}")
    val bandsExpr =
      s"""transform(sequence(0, ${NumBands - 1}), j ->
         |  aggregate(slice(sig, j * $RowsPerBand + 2, ${RowsPerBand - 1}),
         |            element_at(sig, j * $RowsPerBand + 1),
         |            (h, v) -> (h * $HashMult + v) % $P))""".stripMargin
    val bands = sigs.select(col("doc_id"), posexplode(expr(bandsExpr)).as(Seq("band", "bh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] bands = ${time("bands materialize")(bands.count())}")
    val candRaw = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    println(s"[probe] cand raw = ${time("cand raw")(candRaw.count())}")
    val cand = candRaw.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] cand distinct = ${time("cand distinct")(cand.count())}")
    val verified = cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("matches",
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"))
      .filter(col("matches") >= MinMatches)
    println(s"[probe] verified = ${time("verify")(verified.count())}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator (SCALE.md method, made repeatable): builds
  * `outDir` = `factor` x sfDir by replicating every table with shifted
  * keys, preserving join consistency (orders↔lineitem↔customer keep their
  * FK relationships inside each replica; dims pass through unchanged).
  *
  * Documents are made ADVERSARIAL for dedup: each base doc heads a
  * `factor`-member cluster — half the replicas are byte-identical copies
  * (exercising the identical-content representative collapse), half get
  * a distinct suffix (near-dup variants that must survive collapse and
  * still pair through the LSH/prefix joins).
  *
  * With `--skew-events`, one planted user receives every 10th event row
  * (10% of the table) — THE adversarial shape for the window/sessionize/
  * funnel family, whose per-user windows otherwise see near-uniform
  * user_id: a hot user's partition is 10% of the corpus on one task
  * unless AQE skew handling (or salting) engages.
  *
  * With `--skew-docs`, ONE language owns 90% of documents and ONE source
  * owns 100% — the adversarial shape for anything keyed on a data VALUE
  * whose cardinality doesn't grow with the corpus (per-language buckets/
  * aggregations, per-source prefix sums and mixtures). A plan whose
  * parallelism is bounded by language or source count serializes here;
  * the round-8 de-funnels (quality_lm_buckets' distributed rank,
  * pack_assignments' composite-key sharding) exist for exactly this
  * dataset. Deterministic (keyed on doc_id), dedup structure preserved
  * (lang/source are not dedup keys).
  *
  * Usage: runMain graft.ScaleGen <sfDir> <outDir> [factor=10]
  *        [--skew-events] [--skew-docs]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val skewEvents = args.contains("--skew-events")
    val skewDocs = args.contains("--skew-docs")
    val factor = args.drop(2).filterNot(_.startsWith("--"))
      .headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def load(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")

    /** Union `factor` copies with the named long columns shifted by
      * replica * (max+1) per key column — FK-consistent when parent and
      * child shift the same key by the same stride. */
    def replicate(df: DataFrame, shiftCols: Map[String, Long]): DataFrame =
      (0 until factor).map { i =>
        shiftCols.foldLeft(df) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ union _)

    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect()(0).getLong(0) + 1L

    // dims: pass through
    write(load("region"), "region")
    write(load("nation"), "nation")
    write(load("supplier"), "supplier")

    val part = load("part")
    write(replicate(part, Map("p_partkey" -> stride(part, "p_partkey"))), "part")

    val customer = load("customer")
    val custStride = stride(customer, "c_custkey")
    write(replicate(customer, Map("c_custkey" -> custStride)), "customer")

    val orders = load("orders")
    val orderStride = stride(orders, "o_orderkey")
    write(replicate(orders,
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)), "orders")

    val lineitem = load("lineitem")
    write(replicate(lineitem, Map("l_orderkey" -> orderStride)), "lineitem")

    val events = load("events")
    val eventsRep = replicate(events,
      Map("event_id" -> stride(events, "event_id"),
        "user_id" -> stride(events, "user_id")))
    // Hot-user remap: every 10th event_id lands on ONE user id beyond the
    // replicated range. Deterministic (keyed on event_id), preserves all
    // other columns, and keeps the remaining 90% near-uniform.
    val hotUser = stride(events, "user_id") * factor + 1L
    write(
      if (!skewEvents) eventsRep
      else eventsRep.withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) === 0, lit(hotUser))
          .otherwise(col("user_id"))),
      "events")

    val emb = load("embeddings")
    write(replicate(emb, Map("vec_id" -> stride(emb, "vec_id"))), "embeddings")

    // documents: factor-member clusters per base doc — replica 0 is the
    // base, odd replicas byte-identical, even replicas near-dup variants.
    val docs = load("documents")
    val docStride = stride(docs, "doc_id")
    val replicas = (0 until factor).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + lit(i * docStride))
      if (i == 0 || i % 2 == 1) shifted
      else shifted
        .withColumn("text", concat(col("text"), lit(s" probevariant${i}marker")))
        .withColumn("n_chars", length(col("text")))
    }
    // plus THE skew case for LSH dedup at 100 TB: one 10k-copy
    // boilerplate cluster (byte-identical docs) appended after the
    // replicas — it must collapse to a single representative before any
    // pair join, and enter connected components as one star, not a
    // 5x10^7-edge clique.
    val boilerCopies = 10000
    val boiler = spark.range(boilerCopies)
      .select(
        (col("id") + lit(factor * docStride)).as("doc_id"),
        lit("this is the standard boilerplate footer text repeated verbatim " +
          "across every mirrored shard of the crawl with enough words that " +
          "the shingle and trigram pipelines all engage fully").as("text"),
        lit("en").as("lang"),
        lit("boilerplate").as("source"))
      .withColumn("n_chars", length(col("text")))
      .select(docs.columns.toIndexedSeq.map(col): _*)
    val docsOut = replicas.reduce(_ union _).union(boiler)
    write(
      if (!skewDocs) docsOut
      else docsOut
        .withColumn("lang",
          when(pmod(col("doc_id"), lit(10)) =!= 0, lit("en")).otherwise(col("lang")))
        .withColumn("source", lit("theonesource")),
      "documents")

    println(s"wrote ${factor}x $sfDir -> $outDir")
    spark.stop()
  }
}

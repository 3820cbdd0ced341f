package graft

import graft.functions.MinHashSig
import graft.pipeline.MinHash
import org.apache.spark.sql.functions._

/** The native Catalyst minhash expression: value parity with the kernel,
  * codegen execution, and SQL registration via the extensions triple. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a", "", "MIXED Case   with\nnewlines\tand tabs")

  test("expression output matches the shared kernel exactly") {
    val rows = texts.toDF("text")
      .select(MinHashSig($"text").as("sig"))
      .as[Array[Int]].collect()
    texts.zip(rows).foreach { case (t, sig) =>
      assert(sig.sameElements(MinHash.signature(t)), s"mismatch for '$t'")
    }
  }

  test("expression runs inside a plan with other operators (codegen path)") {
    val df = texts.toDF("text")
      .withColumn("sig", MinHashSig($"text"))
      .withColumn("first_hash", element_at($"sig", 1))
      .filter($"first_hash".isNotNull)
    assert(df.count() == texts.length)
    // no ScalaUDF node: the expression plans natively
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("SQL form works once registered through the extensions triple") {
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    val sig = spark.sql("SELECT graft_minhash_sig('hello world') AS s")
      .as[Array[Int]].collect().head
    assert(sig.sameElements(MinHash.signature("hello world")))
  }

  test("winnow and trigram expressions match their kernels, no ScalaUDF") {
    val sample = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq(sample).toDF("text")
      .select(
        graft.functions.Winnow($"text").as("w"),
        graft.functions.Trigrams($"text").as("g"))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val row = df.collect().head
    val (n, checksum) = graft.pipeline.NearDup.winnow(sample)
    val w = row.getStruct(0)
    assert(w.getInt(0) == n && w.getLong(1) == checksum)
    assert(row.getSeq[String](1) == graft.pipeline.NearDup.trigrams(sample).toSeq)
  }

  test("BandHashes kernel equals the retired HOF banding spelling on random sigs") {
    val P = MinHash.P
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(50)(i =>
      (i.toLong, Array.fill(MinHash.NumPerm)((math.abs(rnd.nextLong()) % P).toInt)))
    val df = rows.toDF("doc_id", "sig")
    // sig elements are INT now — the HOF fold must run in BIGINT (the
    // kernel does), so the zero is cast up and promotion carries it.
    val hof = s"""transform(sequence(0, ${MinHash.NumBands - 1}), j ->
      |  aggregate(slice(sig, j * ${MinHash.RowsPerBand} + 2, ${MinHash.RowsPerBand - 1}),
      |            CAST(element_at(sig, j * ${MinHash.RowsPerBand} + 1) AS BIGINT),
      |            (h, v) -> (h * ${MinHash.HashMult} + v) % $P))""".stripMargin
    val got = df.select(col("doc_id"), graft.functions.BandHashes(col("sig")).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = df.select(col("doc_id"), expr(hof).as("b"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got === want)
  }

  test("JsonIntField matches get_json_object(..).cast('int') across JSON shapes") {
    val escapedKey = "{\"\\u006b\": 14}" // JSON-escaped spelling of key k
    val rows = Seq(
      """{"k": 69}""", """{"k":-7}""", """{"k": 0}""", """{ "k" : 42 }""",
      """{"k": "12"}""", """{"k": " +9 "}""", // quoted ints survive the cast
      """{"k": 12.5}""", """{"k": 1e3}""", """{"k": 12.0}""", // floats -> null
      """{"k": true}""", """{"k": null}""", """{"k": "abc"}""",
      """{"k": [1,2]}""", """{"k": {"x": 1}}""", // non-scalar -> null
      """{"j": 5}""", """{}""", """{"kk": 3}""", // absent key
      """{"a": "k", "k": 8}""", // key text inside an earlier STRING value
      """{"a": {"k": 5}, "k": 6}""", // nested same-name key is not top-level
      """{"a": [7, "{", "}"], "k": 10}""", // brackets inside array strings
      """{"es\"c": 1, "k": 11}""", // escaped quote in another key
      """{"k": 2147483647}""", """{"k": 2147483648}""", // INT.Max / overflow
      """{"k": -2147483648}""", """{"k": -2147483649}""",
      """not json""", """{"k": }""", """""", """  {"k": 13}  """,
      escapedKey)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val df = rows.toDF("id", "props")
    val got = df.select(col("id"),
        graft.functions.JsonIntField(col("props"), "k").as("k"))
      .as[(Long, Option[Int])].collect().toMap
    // try_cast, not cast: under ANSI a malformed int errors the job;
    // the kernel takes the non-failing form (null), which is what the
    // DuckDB-arbitrated queries need on clean data and strictly safer
    // on dirty data.
    val want = df.select(col("id"),
        expr("try_cast(get_json_object(props, '$.k') AS int)").as("k"))
      .as[(Long, Option[Int])].collect().toMap
    assert(got === want)
  }
}

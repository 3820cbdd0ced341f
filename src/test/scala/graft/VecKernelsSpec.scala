package graft

import graft.functions.{PlanesBucket, VecDot, VecL2}
import graft.relational.Similarity
import org.apache.spark.sql.functions._

/** Round-17 native vector kernels vs the retired HOF spellings: the
  * similarity family's oracle parity rests on LEFT-FOLD double
  * arithmetic being bit-identical between Spark and DuckDB, so the
  * kernel that replaced `aggregate(zip_with(...))` must reproduce the
  * HOF fold bit-for-bit — including its null/mismatch semantics (dot/L2
  * go null; the CASE-sum bucket goes 0). Random vectors, both signs,
  * zeros and subnormal-scale magnitudes included. */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Similarity.Dim
  private val planesFlat: Array[Double] = {
    val ps = Similarity.planes
    val out = new Array[Double](ps.length * dim)
    ps.indices.foreach(p => System.arraycopy(ps(p), 0, out, p * dim, dim))
    out
  }

  private def dotHof(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (s, v) -> s + v)"
  private def l2Hof(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (s, v) -> s + v)"
  private def bucketHof(emb: String, np: Int): String =
    (0 until np).map { p =>
      val arr = Similarity.planes(p).map(v => s"${v}D").mkString("array(", ", ", ")")
      val dot = s"aggregate(zip_with($emb, $arr, (x, s) -> CAST(x AS DOUBLE) * s), CAST(0 AS DOUBLE), (a, v) -> a + v)"
      s"(CASE WHEN $dot > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private val rnd = new scala.util.Random(41)
  private def randVec(): Array[Float] = Array.fill(dim) {
    val m = rnd.nextInt(4) match {
      case 0 => 1.0f
      case 1 => 1e-6f
      case 2 => 1e6f
      case _ => 0.0f // exact zeros exercise the sign boundary
    }
    (rnd.nextFloat() * 2 - 1) * m
  }
  private val vecs = Seq.fill(64)((randVec(), randVec()))

  test("VecDot and VecL2 are bit-identical to the HOF fold on random vectors") {
    val rows = vecs.toDF("a", "b")
      .select(
        VecDot($"a", $"b").as("kd"), expr(dotHof("a", "b")).as("hd"),
        VecL2($"a", $"b").as("kl"), expr(l2Hof("a", "b")).as("hl"))
      .as[(Double, Double, Double, Double)].collect()
    rows.foreach { case (kd, hd, kl, hl) =>
      assert(java.lang.Double.doubleToRawLongBits(kd) ==
        java.lang.Double.doubleToRawLongBits(hd), s"dot: $kd vs $hd")
      assert(java.lang.Double.doubleToRawLongBits(kl) ==
        java.lang.Double.doubleToRawLongBits(hl), s"l2: $kl vs $hl")
    }
  }

  test("PlanesBucket equals the HOF CASE-sum for 1, 8 and max planes") {
    val df = vecs.map(_._1).toDF("e")
    Seq(1, 8, Similarity.planes.length).foreach { np =>
      val rows = df.select(
          PlanesBucket($"e", np, planesFlat, dim).as("kb"),
          expr(bucketHof("e", np)).as("hb"))
        .as[(Int, Int)].collect()
      rows.foreach { case (kb, hb) => assert(kb == hb, s"np=$np: $kb vs $hb") }
    }
  }

  test("null and length-mismatch semantics match the HOF spellings") {
    val data = Seq(
      (Array.fill(dim)(0.5f), Array.fill(dim - 3)(0.5f)), // length mismatch
      (null.asInstanceOf[Array[Float]], Array.fill(dim)(0.5f)), // null array
      (Array.fill(dim)(0.5f), Array.fill(dim)(0.5f))) // control
    val rows = data.toDF("a", "b")
      .select(
        VecDot($"a", $"b").as("kd"), expr(dotHof("a", "b")).as("hd"),
        PlanesBucket($"a", 8, planesFlat, dim).as("kb"),
        expr(bucketHof("a", 8)).as("hb"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"dot nullability diverged: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
      // bucket never null; mismatch/null-array reads 0 on both spellings
      assert(!r.isNullAt(2) && !r.isNullAt(3) && r.getInt(2) == r.getInt(3), s"$r")
    }
  }

  test("a null ELEMENT inside the array matches the HOF spellings " +
      "(dot/L2 poisoned to null, bucket zeroed)") {
    // Array[Float]-derived columns carry containsNull=false, so the
    // null-element branch needs an explicit schema (round-18 advice).
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val t = ArrayType(FloatType, containsNull = true)
    val schema = StructType(Seq(StructField("a", t), StructField("b", t)))
    val full: Seq[Any] = Seq.fill(dim)(0.5f)
    val holed: Seq[Any] = full.updated(3, null)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(holed, full), Row(full, holed), Row(full, full)),
      schema)
    val rows = df.select(
        VecDot($"a", $"b").as("kd"), expr(dotHof("a", "b")).as("hd"),
        VecL2($"a", $"b").as("kl"), expr(l2Hof("a", "b")).as("hl"),
        PlanesBucket($"a", 8, planesFlat, dim).as("kb"),
        expr(bucketHof("a", 8)).as("hb"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"row $i dot nullability: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"row $i l2 nullability: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"row $i: $r")
      if (!r.isNullAt(2)) assert(r.getDouble(2) == r.getDouble(3), s"row $i: $r")
      assert(!r.isNullAt(4) && !r.isNullAt(5) && r.getInt(4) == r.getInt(5),
        s"row $i bucket: $r")
    }
    // the holed rows exercised the branch: dot/L2 null, a-holed bucket 0
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(2) && rows(0).getInt(4) == 0)
    assert(!rows(2).isNullAt(0))
  }

  test("PlanesBucketExpression equality is structural over the planes " +
      "content (plan reuse survives a fresh array instance)") {
    val copy = planesFlat.clone()
    val e1 = graft.functions.PlanesBucketExpression(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(dim)(0.5f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      8, planesFlat, dim)
    val e2 = e1.copy(planesFlat = copy)
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
    // construction guards fail loudly instead of mid-query
    intercept[IllegalArgumentException] {
      graft.functions.PlanesBucketExpression(e1.child, 32, planesFlat, dim)
    }
    intercept[IllegalArgumentException] {
      graft.functions.PlanesBucketExpression(e1.child, 8,
        new Array[Double](dim), dim) // too short for 8 planes
    }
  }

  test("kernels run codegen'd inside a plan, no higher-order aggregate left") {
    val df = vecs.toDF("a", "b")
      .withColumn("dot", VecDot($"a", $"b"))
      .withColumn("bucket", PlanesBucket($"a", 8, planesFlat, dim))
      .filter($"dot".isNotNull)
    assert(df.count() == vecs.length)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("zip_with"))
  }
}

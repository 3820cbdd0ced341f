package graft

import graft.pipeline.{Chunking, Sampling}
import org.apache.spark.sql.functions.col

/** Goldens for the sampling / split / chunking prep ops. */
class SamplingChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("hash buckets are stable, uniform-ish, and monotone in the rate") {
    val docs = (1L to 2000L).map(i => (i, s"src${i % 20}", "t t t"))
      .toDF("doc_id", "source", "text")
    val half = docs.filter(Sampling.hashBucket($"doc_id") <= "7f")
    val quarter = docs.filter(Sampling.hashBucket($"doc_id") <= "3f")
    val nHalf = half.count()
    val nQuarter = quarter.count()
    // 256-bucket uniformity at n=2000: generous ±10% bands
    assert(nHalf > 900 && nHalf < 1100, s"half=$nHalf")
    assert(nQuarter > 400 && nQuarter < 600, s"quarter=$nQuarter")
    // monotone: the quarter sample is a subset of the half sample
    assert(quarter.join(half, "doc_id", "left_anti").count() === 0)
    // stable: same ids selected on re-evaluation
    assert(half.agg(org.apache.spark.sql.functions.sum($"doc_id")).head.getLong(0)
      === half.agg(org.apache.spark.sql.functions.sum($"doc_id")).head.getLong(0))
  }

  test("split assignment is exhaustive and roughly 80/10/10") {
    val docs = (1L to 3000L).map(i => (i, "s", "x")).toDF("doc_id", "source", "text")
    val counts = Sampling.splitCountsQuery(docs)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts.values.sum === 3000L)
    assert(counts("train") > 2200 && counts("train") < 2600, counts.toString)
    assert(counts("val") > 150 && counts("val") < 450, counts.toString)
    assert(counts("test") > 150 && counts("test") < 450, counts.toString)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("quality-weighted sample matches a local brute-force recomputation and is non-trivial") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 5}", i * 3))
      .toDF("doc_id", "source", "n_chars")
    val kept = Sampling.qualityWeightedSampleQuery(docs)
      .collect().map(_.getLong(0)).toSet
    val expected = (1L to 400L).filter { i =>
      val u = Integer.parseInt(md5hex(i.toString).substring(0, 2), 16)
      val p = (i * 3).toDouble / (i * 3 + Sampling.QwMidpoint).toDouble
      u < math.floor(256.0 * p).toInt
    }.toSet
    assert(kept === expected)
    // soft sampling actually spans strata: some short docs in, some long docs out
    assert(kept.nonEmpty && kept.size < 400)
    assert((1L to 400L).toSet.diff(kept).exists(_ > 300L) || kept.exists(_ <= 100L))
  }

  test("source cap: matches a local md5-rank recomputation across partitions " +
      "and the cap bites") {
    // 3 sources x 200 docs, repartitioned so every (source, partition)
    // holds a slice — phase 1 must not lose any global top-cap doc.
    val rows = (1L to 600L).map(i => (i, s"src${i % 3}", "x"))
    val docs = rows.toDF("doc_id", "source", "text").repartition(7)
    val got = Sampling.sourceCapSampleQuery(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = rows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
      rs.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .take(Sampling.SourceCap).zipWithIndex
        .map { case (id, i) => (id, src, (i + 1).toLong) }
    }
    assert(got.toSet === want.toSet)
    // every source contributes exactly cap rows (200 candidates each)
    assert(got.groupBy(_._2).forall(_._2.length == Sampling.SourceCap))
  }

  test("split leakage: identical text straddling the train/test carve is reported") {
    // pick ids on each side of the carve by the same md5 rule the query uses
    val ids = (1L to 200L)
    val trainId = ids.find(i => md5hex(i.toString).substring(0, 2) <= "cc").get
    val testId = ids.find(i => md5hex(i.toString).substring(0, 2) > "e5").get
    val d = Seq(
      (trainId, "the leaked evaluation passage"),
      (testId, "the leaked evaluation passage"),
      (1000L, "an unrelated unique document"),
      (1001L, "another unrelated unique document")).toDF("doc_id", "text")
    val rows = Sampling.splitLeakageQuery(d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(1) === 2L) // n_docs
    assert(r.getLong(2) === 2L) // n_splits
    assert((r.getString(3), r.getString(4)) === (("test", "train")))
  }

  test("mix allocation: exact largest-remainder apportionment, targets sum to budget") {
    // weights: alpha -> 1 (no digits), b2 -> 3, c3 -> 4; W = 8, budget 10:
    // q = floor(10w/8) = (1, 3, 5); r = (2, 6, 0); sum q = 9 -> the one
    // leftover token goes to the largest remainder, b2.
    val d = Seq(
      (1L, "alpha", "one two three"),
      (2L, "b2", "four five"),
      (3L, "b2", "six"),
      (4L, "c3", "seven eight nine ten")).toDF("doc_id", "source", "text")
    val m = Sampling.mixAllocationQuery(d, budget = 10L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(m("alpha") === ((1L, 3L, 1L)))
    assert(m("b2") === ((3L, 3L, 4L)))
    assert(m("c3") === ((4L, 4L, 5L)))
    assert(m.values.map(_._3).sum === 10L)
  }

  test("mix allocation invariants: random corpora, targets sum to budget, each within 1 of quota") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 5) {
      val nSources = 2 + rnd.nextInt(8)
      val weights = (0 until nSources).map(_ => 1L + rnd.nextInt(97))
      val rows = for {
        (w, s) <- weights.zipWithIndex
        d <- 0 until (1 + rnd.nextInt(4))
      } yield ((s * 100 + d).toLong, s"g$w-$s", Seq.fill(1 + rnd.nextInt(9))("tok").mkString(" "))
      // weight parses as the FIRST digit run: "g42-3" -> 42 (+1 in the op)
      val budget = 1000L + rnd.nextInt(9000)
      val m = Sampling.mixAllocationQuery(rows.toDF("doc_id", "source", "text"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      val totalW = m.map(_._2).sum
      assert(m.map(_._3).sum === budget, s"trial $trial: targets must sum to the budget")
      m.foreach { case (src, w, target) =>
        val floorQuota = budget * w / totalW
        assert(target == floorQuota || target == floorQuota + 1,
          s"trial $trial/$src: target $target outside [floor, floor+1] of quota $floorQuota")
      }
    }
  }

  test("chunking covers the doc with the configured overlap") {
    // 100 words, C=32, S=24 -> k = 1 + ceil(68/24) = 4 chunks:
    // [1..32], [25..56], [49..80], [73..100]
    val words = (1 to 100).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val rows = Chunking.chunkQuery(docs).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3))).sortBy(_._1)
    assert(rows.length === 4)
    assert(rows.map(_._2).toSeq === Seq(32, 32, 32, 28))
    assert(rows(0)._3.startsWith("w1 w2 ") && rows(0)._3.endsWith(" w32"))
    assert(rows(1)._3.startsWith("w25 ") && rows(1)._3.endsWith(" w56"))
    assert(rows(3)._3.startsWith("w73 ") && rows(3)._3.endsWith(" w100"))
  }

  test("pack padding stats: windows and padding fraction") {
    // W=64: 100 words -> 2 windows (28 pad); 10 words -> 1 window (54 pad)
    val docs = Seq(
      (1L, "s", ("w " * 100).trim),
      (2L, "s", ("w " * 10).trim)).toDF("doc_id", "source", "text")
    val r = Chunking.packPaddingStatsQuery(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("total_words") === 110L)
    assert(r.getAs[Long]("n_windows") === 3L)
    assert(r.getAs[Double]("padding_frac") === (1.0 - 110.0 / 192.0))
  }

  test("pack assignment: running offsets and window indices per source") {
    // W=64. source s: doc1 40w (offset 0, win 0), doc2 50w (offset 40,
    // win 0), doc3 10w (offset 90, win 1). source t independent.
    val docs = Seq(
      (1L, "s", ("w " * 40).trim),
      (2L, "s", ("w " * 50).trim),
      (3L, "s", ("w " * 10).trim),
      (4L, "t", ("w " * 70).trim)).toDF("doc_id", "source", "text")
    val m = Chunking.packAssignmentsQuery(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) === ((0L, 0L)))
    assert(m(2L) === ((40L, 0L)))
    assert(m(3L) === ((90L, 1L)))
    assert(m(4L) === ((0L, 0L)))
  }

  test("pack assignment: SINGLE-source corpus matches a sequential prefix " +
      "sum and runs the running sum sharded, not per-source") {
    // the round-8 de-funnel exists for exactly this fixture: one source,
    // so the old PARTITION BY source window had parallelism 1. Word
    // counts vary and doc_ids are non-contiguous (stride 3) so bucket
    // boundaries fall mid-stream.
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { i =>
      val id = 1000L + i * 3
      (id, "only", ("w " * (1 + rnd.nextInt(20))).trim)
    }
    val docs = rows.toDF("doc_id", "source", "text")
    // sequential reference in driver code, independent of Spark windows
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, _, t) =>
      val n = t.split("\\s+").count(_.nonEmpty).toLong
      val off = acc; acc += n
      id -> ((off, off / Chunking.PackWindow))
    }.toMap
    val q = Chunking.packAssignmentsQuery(docs)
    val got = q.collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
    // plan shape: the corpus-stream running sum is keyed by the
    // (source, bkt) COMPOSITE — some window in the plan partitions on two
    // expressions. (The tiny per-shard carry window is source-keyed by
    // design; it runs over <= sources x (buckets+1) rows.)
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    var partitionArities = List.empty[Int]
    plan.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        partitionArities ::= w.partitionSpec.length
      case _ => ()
    }
    assert(partitionArities.contains(2),
      s"expected a (source, bkt)-sharded window, got arities $partitionArities")
    // and the shards are real: the stream is split by a RANGE exchange
    // on doc_id (sampled-quantile boundaries -> row-balanced shards).
    // The exchange lives inside the persisted frame's InMemoryRelation,
    // so the probe descends into cached plans.
    var hasRange = false
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Unit = p.foreach {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scan(a.initialPlan)
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        scan(s.relation.cachedPlan)
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] =>
        hasRange = true
      case _ => ()
    }
    scan(plan)
    assert(hasRange, "expected a RangePartitioning exchange sharding the stream")
  }

  test("pack assignment: CLUSTERED doc_id distribution (narrow band + far " +
      "outliers, the value-range-bucket pathology) still matches the " +
      "sequential prefix sum") {
    // under the old (doc_id - lo) div width bucketing, 500 of these 503
    // ids land in bucket 0 and the shard window re-serializes; range
    // partitioning samples quantiles, so shards stay row-balanced.
    val rnd = new scala.util.Random(11)
    val rows = ((0 until 500).map(i => 5000L + i) ++
        Seq(2000000000L, 3000000000L, 4000000000L))
      .map(id => (id, "only", ("w " * (1 + rnd.nextInt(9))).trim))
    val docs = rows.toDF("doc_id", "source", "text")
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (id, _, t) =>
      val n = t.split("\\s+").count(_.nonEmpty).toLong
      val off = acc; acc += n
      id -> ((off, off / Chunking.PackWindow))
    }.toMap
    val got = Chunking.packAssignmentsQuery(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
  }

  test("token-budget selection: greedy by the n_chars prior under half " +
      "the corpus words, equal to a sequential reference") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      val t = ("w " * (1 + rnd.nextInt(30))).trim
      (i.toLong, t, (100 + rnd.nextInt(900)).toLong) // n_chars independent of words
    }
    val docs = rows.toDF("doc_id", "text", "n_chars")
    val withWords = rows.map { case (id, t, nc) =>
      (id, nc, t.split("\\s+").count(_.nonEmpty).toLong) }
    val budget = withWords.map(_._3).sum / graft.pipeline.Sampling.BudgetDenom
    var acc = 0L
    val want = withWords.sortBy { case (id, nc, _) => (-nc, id) }
      .flatMap { case (id, _, w) =>
        acc += w; if (acc <= budget) Some(id -> ((w, acc))) else None
      }.toMap
    val got = graft.pipeline.Sampling.tokenBudgetQuery(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
    assert(got.nonEmpty && got.size < rows.size) // the budget actually bites
  }

  test("shuffle shards: rank matches a local md5-order recomputation; " +
      "positions are contiguous per shard; bucketing cannot leak into " +
      "the result") {
    // clustered ids + far outliers — the distribution that broke the
    // value-bucketed pack sharding (ADVICE r9)
    val ids = (100L to 700L) ++ Seq(5L, 9L, 1000000L, 2000000L)
    val docs = ids.map(i => (i, "t")).toDF("doc_id", "text")
    val got = Chunking.shuffleShardsQuery(docs)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    // local reference: shard + rank by (60-bit md5 prefix, doc_id)
    val hs = ids.map { i =>
      val h = java.lang.Long.parseLong(md5hex(i.toString).take(15), 16)
      (i, h)
    }
    val want = hs.groupBy(_._2 % Chunking.ShuffleShards).toSeq.flatMap {
      case (shard, members) =>
        members.sortBy { case (i, h) => (h, i) }.zipWithIndex.map {
          case ((i, _), r) => (i, shard.toInt, (r + 1).toLong)
        }
    }.sorted
    assert(got === want)
    // per-shard positions are exactly 1..n_s
    got.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.length.toLong), s"shard $s")
    }
    // associativity: a different bucket count is result-identical
    val got2 = Chunking.shuffleShardsQuery(docs, buckets = 2)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got2 === want)
  }

  test("chunking edges: short doc and empty doc") {
    val docs = Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text")
    val byDoc = Chunking.chunkQuery(docs).collect()
      .groupBy(_.getLong(0))
    assert(byDoc(1L).length === 1)
    assert(byDoc(1L).head.getString(3) === "a b c")
    assert(byDoc(2L).length === 1)
    assert(byDoc(2L).head.getInt(2) === 0)
    assert(byDoc(2L).head.getString(3) === "")
  }

  /** One doc per (lang, n_chars) pair — unimax only reads those columns. */
  private def langDocs(chars: Map[String, Long]) =
    chars.toSeq.zipWithIndex
      .map { case ((l, c), i) => (i.toLong, "x", l, c) }
      .toDF("doc_id", "text", "lang", "n_chars")

  /** Local greedy water-filling reference: smallest capacity first, each
    * language takes min(capacity, what an equal split of the remaining
    * budget would give), with the closed-form equal share spread by
    * largest remainder over the uncapped suffix — byte-for-byte the
    * semantics the query claims. */
  private def unimaxGreedy(chars: Map[String, Long], budget: Long,
      cap: Long = Sampling.UniMaxEpochCap): Map[String, Long] = {
    val ordered = chars.toSeq.map { case (l, c) => (l, c * cap) }
      .sortBy { case (l, cp) => (cp, l) }
    var rem = budget
    var k = ordered.size
    val out = scala.collection.mutable.Map[String, Long]()
    var i = 0
    // capped prefix: capacity <= rem/k, as the exact test cap*k <= rem
    while (i < ordered.size && ordered(i)._2 * k <= rem) {
      out(ordered(i)._1) = ordered(i)._2
      rem -= ordered(i)._2; k -= 1; i += 1
    }
    // uncapped suffix: equal split + first-(rem % k) get the extra char
    if (i < ordered.size) {
      val base = rem / k
      val extra = rem % k
      ordered.drop(i).zipWithIndex.foreach { case ((l, _), j) =>
        out(l) = base + (if (j < extra) 1L else 0L)
      }
    }
    out.toMap
  }

  test("unimax: hand golden — minority langs hit the epoch cap, majority absorbs the rest") {
    // chars a=10, b=20, c=100 -> caps 20/40/200, budget = 3*130/2 = 195:
    // a, b capped at 2.0 epochs; c gets the remaining 135 (1.35 epochs).
    val got = Sampling.unimaxAllocationQuery(
        langDocs(Map("a" -> 10L, "b" -> 20L, "c" -> 100L)))
      .select("lang", "capacity", "alloc_chars", "epochs")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") === ((20L, 20L, 2.0)))
    assert(got("b") === ((40L, 40L, 2.0)))
    assert(got("c") === ((200L, 135L, 1.35)))
  }

  test("unimax invariants: random language sizes match the greedy water-filling exactly") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 8) {
      val nLangs = 2 + rnd.nextInt(9)
      val chars = (0 until nLangs)
        .map(i => s"l$i" -> (1L + rnd.nextInt(10000))).toMap
      val total = chars.values.sum
      val budget = 3 * total / 2
      val got = Sampling.unimaxAllocationQuery(langDocs(chars))
        .select("lang", "alloc_chars").as[(String, Long)].collect().toMap
      val want = unimaxGreedy(chars, budget)
      assert(got === want, s"chars=$chars")
      // allocation exhausts the budget exactly (B < total capacity by
      // construction) and never exceeds any language's capacity
      assert(got.values.sum === budget)
      chars.foreach { case (l, c) =>
        assert(got(l) <= c * Sampling.UniMaxEpochCap) }
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit specs for the pipeline-operator surface (as-of join,
  * quality gate, chunk dedup, contamination, IVF ANN): each operator
  * is checked against an independently-computed naive form on small
  * in-memory data, not against the gate oracle (which exercises the
  * same operators at sf scale).
  */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("asofBackward plans exactly ONE shuffle (union-sort-window form)") {
    // the whole point of the union-sort-window design: |L|+|R| rows
    // shuffle once on the key, instead of a pair-enumerating join —
    // a second Exchange appearing here is a scale regression
    val left = Seq((1L, 100L, 10L)).toDF("l_id", "k", "t")
    val right = Seq((11L, 100L, 5L)).toDF("r_id", "k", "rt")
    val plan = AsofJoin.asofBackward(left, right, key = "k",
        leftTime = "t", rightTime = "rt", rightTie = "r_id")
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 shuffle, plan:\n$plan")
  }

  test("asofBackward matches the naive join+argmax form") {
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 20L), (3L, 200L, 15L), (4L, 300L, 5L))
      .toDF("l_id", "k", "t")
    val right = Seq(
      (11L, 100L, 5L), (12L, 100L, 10L), (13L, 100L, 18L),
      (14L, 200L, 15L), (15L, 200L, 16L), (16L, 400L, 1L))
      .toDF("r_id", "k", "rt")

    val got = AsofJoin.asofBackward(left, right, key = "k",
        leftTime = "t", rightTime = "rt", rightTie = "r_id")
      .select("l_id", "asof_r_id", "asof_rt")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    // naive: enumerate all (left, right-history) pairs, take max (rt, r_id)
    val naive = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .groupBy(col("l_id"))
      .agg(max_by(struct(col("rt"), col("r_id")), struct(col("rt"), col("r_id"))).as("m"))
    val naiveRows = left.select("l_id").join(naive, Seq("l_id"), "left")
      .select(col("l_id"), col("m.r_id"), col("m.rt"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(got == naiveRows)
    // inclusive semantics: left t=15 at k=200 picks the rt=15 row
    assert(got.contains((3L, 14L, 15L)))
    // no right history at all -> nulls
    assert(got.contains((4L, -1L, -1L)))
  }

  test("asofBackward tolerance: stale matches null out, fresh ones stay") {
    val left = Seq(
      (1L, 100L, 50L),  // nearest right at 45 → gap 5, within
      (2L, 100L, 90L),  // nearest right at 45 → gap 45, stale
      (3L, 200L, 10L))  // no right history at all
      .toDF("l_id", "k", "t")
    val right = Seq((11L, 100L, 40L), (12L, 100L, 45L))
      .toDF("r_id", "k", "rt")
    val got = AsofJoin.asofBackward(left, right, "k", "t", "rt", "r_id",
        tolerance = 10L)
      .select("l_id", "asof_r_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 12L, 2L -> -1L, 3L -> -1L))
    // tolerance boundary is inclusive: gap == tolerance matches
    val edge = AsofJoin.asofBackward(
        Seq((1L, 5L, 55L)).toDF("l_id", "k", "t"),
        Seq((9L, 5L, 45L)).toDF("r_id", "k", "rt"),
        "k", "t", "rt", "r_id", tolerance = 10L)
      .select("asof_r_id").head()
    assert(edge.getLong(0) == 9L)
    // stale-only history does NOT fall back to an even earlier row —
    // the as-of pick happens first, the tolerance judges it
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, "k", "t", "rt", "r_id", tolerance = -1L)
    }
  }

  test("asofBackward equal-timestamp ties resolve to the greatest tie value") {
    val left = Seq((1L, 7L, 10L)).toDF("l_id", "k", "t")
    val right = Seq((21L, 7L, 10L), (22L, 7L, 10L), (20L, 7L, 9L))
      .toDF("r_id", "k", "rt")
    val row = AsofJoin.asofBackward(left, right, "k", "t", "rt", "r_id")
      .select("asof_r_id").head()
    assert(row.getLong(0) == 22L)
  }

  test("asofBackward never matches through NULL keys or NULL right times") {
    val left = Seq((1L, Option(7L), 10L), (2L, Option.empty[Long], 10L))
      .toDF("l_id", "k", "t")
    val right = Seq(
      (21L, Option.empty[Long], 5L),           // null key: matches nothing
      (22L, Option(7L), 5L),
      (23L, Option(8L), 5L))
      .toDF("r_id", "k", "rt")
      .withColumn("rt", when(col("r_id") === 23L, lit(null)).otherwise(col("rt")))
    val out = AsofJoin.asofBackward(left, right, "k", "t", "rt", "r_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(1L) == 22L)  // normal match unaffected
    assert(out(2L) == -1L)  // null-key left row survives, unmatched
    assert(out.size == 2)   // every left row is present exactly once
  }

  test("qualityRules counts and flags are self-consistent") {
    val docs = Seq(
      (1L, Array.fill(60)("the word is of to in goodly finely texting quality").mkString(" ")),
      (2L, "tiny doc"),
      (3L, ("spam spam " * 100).trim),
      (4L, "a b c ### $$$ %% !!"))
      .toDF("doc_id", "text")
    val out = TextStats.qualityRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    // doc 1: long, varied, stopword-rich -> passes
    assert(out(1L).getAs[Int]("quality_pass") == 1)
    // doc 2: under the 50-word floor
    assert(out(2L).getAs[Int]("n_words") == 2)
    assert(out(2L).getAs[Int]("quality_pass") == 0)
    // doc 3: one repeated bigram dominates -> repetition rule fails it
    assert(out(3L).getAs[Double]("top_bigram_frac") > 0.2)
    assert(out(3L).getAs[Int]("quality_pass") == 0)
    // doc 4: symbol-heavy
    assert(out(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(out(4L).getAs[Int]("quality_pass") == 0)
  }

  test("chunkDups finds cross-doc duplicate chunks only") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, shared + " " + (11 to 20).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (11 to 20).map(i => s"b$i").mkString(" ")),
      (3L, (21 to 40).map(i => s"c$i").mkString(" ")),
      (4L, "too short"))
      .toDF("doc_id", "text")
    val out = TextDedup.chunkDups(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1L))) // 2 chunks, the shared one duplicated
    assert(out(2L) == ((2L, 1L)))
    assert(out(3L) == ((2L, 0L))) // unique chunks
    assert(!out.contains(4L))     // under one chunk length -> excluded
  }

  test("benchmarkOverlap flags only docs sharing n-grams with the benchmark") {
    val leak = (1 to 8).map(i => s"q$i").mkString(" ")
    val corpus = Seq(
      (1L, leak + " extra words here to pad it out"),
      (2L, (11 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq((100L, leak + " trailing benchmark context"))
      .toDF("doc_id", "text")
    val out = TextDedup.benchmarkOverlap(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) >= 1L)
    assert(out(2L) == 0L)
  }

  test("benchmarkOverlapBloom ≡ exact screen, and the bloom probe prunes clean grams") {
    val leak = (1 to 8).map(i => s"q$i").mkString(" ")
    val corpus = Seq(
      (1L, leak + " extra words here to pad it out"),
      (2L, (11 to 40).map(i => s"z$i").mkString(" ")),
      (3L, (50 to 70).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq((100L, leak + " trailing benchmark context"))
      .toDF("doc_id", "text")
    val exact = TextDedup.benchmarkOverlap(corpus, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = TextDedup.benchmarkOverlapBloom(corpus, bench,
        expectedItems = 1024).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact, "bloom-prefiltered screen must change no answer")

    // the reduction itself: clean grams are dropped by the probe
    // before the join (no false negatives on the leaked ones)
    import org.apache.spark.sql.graftext.BloomSemi
    val benchGh = bench
      .select(explode(TextDedup.words(col("text"))).as("w")) // word-level stand-in set
      .select(xxhash64(col("w")).as("h")).distinct()
    val bf = benchGh.agg(BloomSemi.bloomFilterAgg(col("h"), 1024).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val probeHits = benchGh.filter(BloomSemi.mightContain(lit(bf), col("h"))).count()
    assert(probeHits == benchGh.count(), "bloom must have no false negatives")
    val clean = spark.range(100000, 101000).select(xxhash64(col("id")).as("h"))
    val fp = clean.filter(BloomSemi.mightContain(lit(bf), col("h"))).count()
    assert(fp < 50, s"bloom should prune ~all clean keys, passed $fp of 1000")
  }

  test("benchmarkOverlapAuto: gate-sized corpus picks exact, large/overlap-rare corpus picks bloom, same answers") {
    val leak = (1 to 8).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, leak + " trailing benchmark context"))
      .toDF("doc_id", "text")

    // sf0.1-shaped input (hundreds of docs): the bloom build would
    // cost more than the shuffle it prunes — exact plan, no arming
    val small = (1L to 300L).map(i =>
      (i, if (i == 1L) leak + " extra words here to pad it out"
          else (0 to 19).map(j => s"z${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val (smallOut, smallArmed) = TextDedup.benchmarkOverlapAuto(small, bench)
    assert(!smallArmed, "gate-sized corpus must keep the exact plan")

    // large overlap-rare corpus (120k docs vs 1 benchmark doc): the
    // corpus-gram shuffle dominates — bloom plan arms
    val big = spark.range(120000).selectExpr("id AS doc_id",
      """CASE WHEN id = 1 THEN concat_ws(' ', 'q1','q2','q3','q4','q5','q6','q7','q8')
         ELSE array_join(transform(sequence(0, 9), j -> concat('z', id, '_', j)), ' ') END AS text""")
    val (bigOut, bigArmed) = TextDedup.benchmarkOverlapAuto(big, bench)
    assert(bigArmed, "large overlap-rare corpus must arm the bloom plan")

    // the decision is cost-only: both plans flag exactly the leaked doc
    val smallHits = smallOut.filter(col("n_contaminated") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smallHits == Set(1L))
    val bigHits = bigOut.filter(col("n_contaminated") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bigHits == Set(1L))
    assert(bigOut.filter(!col("keep")).count() == 1L) // frac 1.0 > maxFrac
    // and the bloom-armed result is bit-identical to the exact screen
    val exactBig = TextDedup.benchmarkOverlap(big, bench)
      .withColumn("keep", col("contaminated_frac") <= 0.05)
    assert(bigOut.exceptAll(exactBig).isEmpty && exactBig.exceptAll(bigOut).isEmpty)
  }

  test("qualityFunnel: each stage kills exactly its engineered victim, in order") {
    // goodA passes every stage: distinct 3-char words, two stopwords
    val goodA = ("the" +: "and" +: (3 to 60).map(i => f"w$i%02d")).mkString(" ")
    val goodB = ("the" +: "for" +: (3 to 60).map(i => f"u$i%02d")).mkString(" ")
    val noStop = (1 to 55).map(i => f"v$i%02d").mkString(" ")   // k3: 0 stopwords
    val loop = Seq.fill(8)("the aa1 aa2 aa3 bb1 bb2 bb3 bb4").mkString(" ") // k4
    val docs = Seq(
      (1L, goodA), (2L, goodA),   // stage 1 keeps min id
      (3L, "tiny doc"),           // stage 2: 2 words
      (4L, noStop),               // stage 3: stopword_frac = 0
      (5L, loop),                 // stage 4: dup 4-gram frac ≈ 0.87
      (6L, goodB))
      .toDF("doc_id", "text")
    val out = Funnel.qualityFunnel(docs).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1) == (("exact_dedup", 6L, 5L)))
    assert(out(2) == (("length_band", 5L, 4L)))
    assert(out(3) == (("quality_rules", 4L, 3L)))
    assert(out(4) == (("repetition", 3L, 2L)))
  }

  test("crossCorpusNearDups: cross-side matches only, best ref by (jaccard, id)") {
    val base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val newDocs = Seq((1L, base), (2L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val refDocs = Seq((10L, base), (11L, base + " extra"), (12L, "z1 z2 z3 z4"))
      .toDF("doc_id", "text")
    val out = TextDedup.crossCorpusNearDups(newDocs, refDocs, minJaccard = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    // doc 1: exact copy 10 (J=1.0) beats superset 11 (J=8/9)
    assert(out(1L)._1 == 2L && out(1L)._2 == 10L && out(1L)._3 == 1.0 && out(1L)._4)
    // doc 2: clean — sentinel row, not absent
    assert(out(2L) == ((0L, -1L, 0.0, false)))
  }

  test("hashSplit: id-pure, partitioning-invariant, weights roughly honored") {
    val df = spark.range(0, 2000).toDF("doc_id")
    def runIt(d: org.apache.spark.sql.DataFrame) =
      Splits.hashSplit(d).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val a = runIt(df)
    assert(a == runIt(df.repartition(7)), "split must be a pure function of id")
    a.foreach { case (id, (b, s)) =>
      assert(b >= 0 && b < 1000)
      val want = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s == want, s"doc $id bucket $b labeled $s")
    }
    val frac = a.values.count(_._2 == "train") / 2000.0
    assert(frac > 0.75 && frac < 0.85, s"train frac $frac far from 0.8")
    intercept[IllegalArgumentException] {
      Splits.hashSplit(df, weights = Seq("a" -> 500, "b" -> 400))
    }
  }

  test("wordFreqStats computes discrete median/max/mean of corpus term frequencies") {
    val docs = Seq(
      (1L, "common common rare"),   // freqs: common=4 (2 here + 2 in doc 2), rare=1
      (2L, "common common unique"))
      .toDF("doc_id", "text")
    val out = TextStats.wordFreqStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1 freqs sorted: [1, 4, 4] -> median at ceil(1.5)=2nd = 4
    assert(out(1L) == ((3L, 4L, 4L, 3000L))) // mean = 9/3 = 3.000
    // doc 2 freqs sorted: [1, 4, 4] -> same shape
    assert(out(2L) == ((3L, 4L, 4L, 3000L)))
  }

  test("repetitionStats plans exactly two aggregation shuffles (linear shape)") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = TextStats.repetitionStats(docs).queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(plan).size -
      "BroadcastExchange".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected the 2-agg linear shape, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("knnClassify plan: corpus side shuffles only top-k rows (map-side group limit)") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("vec"), col("label"))
    val plan = Similarity.knnClassify(
        emb.filter(col("id") < 3).select("id", "vec"), emb, k = 5)
      .queryExecution.executedPlan.toString
    // the Partial WindowGroupLimit before the query_id exchange is what
    // keeps the shuffle at ≤ k rows per (partition, query) — its
    // disappearance is a scale regression
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$plan")
    // the big corpus side must never sort-merge or enumerate pairs
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("packSequences equals the window form and is partitioning-invariant") {
    import spark.implicits._
    val r = new scala.util.Random(17)
    val docs = (0L until 300L).map(i =>
      (i, Seq.fill(1 + r.nextInt(40))("w").mkString(" "))).toDF("doc_id", "text")
    val a = graft.ops.SequencePack.packSequences(docs, 64).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .sortBy(_._1)
    val b = graft.ops.SequencePack.packSequences(docs.repartition(13), 64).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .sortBy(_._1)
    assert(a.toSeq == b.toSeq, "offsets must not depend on input partitioning")
    // serial reference: running offset in doc order
    var off = 0L
    a.foreach { case (_, n, start, first, last) =>
      assert(start == off && first == start / 64 && last == (start + n - 1) / 64)
      off += n
    }
    // stream is gapless: total offset covers every token exactly once
    assert(off == a.map(_._2).sum)
  }

  test("chunkWindows materializes the exact serial concat-and-chunk stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g"), (3L, ""), (4L, "h i j k")).toDF("doc_id", "text")
    val out = graft.ops.SequencePack.chunkWindows(docs.repartition(3), 4)
      .collect().map(r => r.getAs[Long]("window_id") -> r).toMap
    // serial stream: a b c d | e f g h | i j k
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L).getAs[String]("text") == "a b c d")
    assert(out(0L).getAs[Long]("n_docs") == 1L)
    assert(out(1L).getAs[String]("text") == "e f g h")
    assert(out(1L).getAs[Long]("n_docs") == 3L) // docs 1, 2 and 4 (3 is empty)
    assert(out(1L).getAs[Long]("first_doc") == 1L)
    assert(out(1L).getAs[Long]("last_doc") == 4L)
    // tail window is partial
    assert(out(2L).getAs[String]("text") == "i j k")
    assert(out(2L).getAs[Long]("n_tokens") == 3L)
  }

  test("pqTopK plan: no corpus-side sort-merge or pair enumeration") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
    val plan = Similarity.pqTopK(emb.filter(col("id") < 3), emb, k = 3,
        m = 4, nlist = 8, lloydRounds = 1, rerank = 8)
      .queryExecution.executedPlan.toString
    // ADC scoring is partition-local over the m-byte codes and the
    // exact rerank joins the (tiny) shortlist via broadcast — the
    // corpus must never sort-merge or cross-join
    assert(plan.contains("BroadcastHashJoin"), s"shortlist rerank not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("ivfTopK neighbors are a subset of brute-force candidates with correct ranking") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("vec"))
    val queries = emb.filter(col("id") < 3)
    val ivf = Similarity.ivfTopK(queries, emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // k = full candidate count so every possible IVF hit has a
    // brute-force cosine to compare against (IVF's rank-5 neighbor
    // can legitimately sit outside any smaller brute-force top-k)
    val n = emb.count().toInt
    val brute = Similarity.bruteForceTopK(queries, emb, n).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // every IVF hit carries the exact cosine brute force computed
    ivf.foreach { case (q, _, n, c) => assert(brute((q, n)) == c) }
    // ranks are 1..k and strictly ordered by (cos desc, id asc) per query
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
  }

  test("weightedSample: matches a local A-ES reference, favors heavy weights") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i, if (i < 200) 10.0 else 1000.0))
    val df = rows.toDF("doc_id", "w")
    val got = Splits.weightedSample(df, k = 50, weightCol = "w").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toMap
    // local reference: same md5 uniform, same key, same ranking
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(7).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex, 16) % 1000000L
      // Spark's round(_, 6) on doubles is BigDecimal HALF_UP
      java.math.BigDecimal.valueOf(math.log((h + 0.5) / 1000000.0) / w)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val expect = rows.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k0) => (-k0, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    assert(got == expect)
    // heavy-weight rows dominate the sample (ln(u)/1000 ≫ ln(u)/10)
    val heavy = got.keys.count(_ >= 200L)
    assert(heavy >= 45, s"only $heavy of 50 draws hit the heavy class")
    // partitioning invariance
    val again = Splits.weightedSample(df.repartition(7), k = 50, weightCol = "w")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"))).toMap
    assert(again == got)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Skew}
import graft.sources.Tables

class SamplingSkewSpec extends SparkSpec {

  test("hash split is deterministic, exhaustive, and near the 80/10/10 target") {
    import spark.implicits._
    val a = Sampling.trainValTest(spark, sfDir).as[(Long, String)].collect().toMap
    val b = Sampling.trainValTest(spark, sfDir).as[(Long, String)].collect().toMap
    assert(a === b)
    val n = a.size.toDouble
    assert(n === Tables.documents(spark, sfDir).count().toDouble)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("stratified sample is a deterministic subset with per-stratum rates ordered") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val s = Sampling.langStratified(spark, sfDir)
    assert(s.count() <= docs.count())
    // sampling is a filter: every sampled id exists in the corpus
    assert(s.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    // determinism
    assert(s.agg(sum($"doc_id")).head.getLong(0) ===
      Sampling.langStratified(spark, sfDir).agg(sum($"doc_id")).head.getLong(0))
  }

  test("seq pack: offsets are cumulative per shard and packs are contiguous") {
    import spark.implicits._
    val p = Sampling.seqPack(spark, sfDir)
      .select($"shard", $"doc_id", $"start_tok", $"n_tokens", $"pack_id")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    p.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.foldLeft(0L) { case (expectedStart, (_, _, start, n, pack)) =>
        assert(start === expectedStart)
        assert(pack === start / 2048)
        start + n
      }
      // pack ids never decrease along the shard order
      assert(sorted.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("salted aggregation equals the direct groupBy") {
    import spark.implicits._
    val salted = Skew.saltedAggQuery(spark, sfDir)
      .orderBy($"l_returnflag").collect().toSeq
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"),
        min($"l_extendedprice").as("min_l_extendedprice"),
        max($"l_extendedprice").as("max_l_extendedprice"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(salted === direct)
  }

  test("PPJoin jaccard: identical to brute force; hot stopword shingle never in a prefix") {
    import spark.implicits._
    import graft.operators.Dedup
    // 50 docs; 80% open with the same stopword phrase so the trigram
    // "the quick fox" has df=40 (the naive self-join's quadratic hot key);
    // consecutive (2i, 2i+1) docs differ in one trailing word -> true
    // near-dups at J = 5/7 ~ 0.714
    def body(i: Int) = { val p = i / 2; val tail = if (i % 2 == 0) s"e$p" else s"f$p"
      s"a$p b$p c$p d$p $tail" }
    val texts = (0 until 50).map { i =>
      val head = if (i % 5 == 0) s"odd opener u$i" else "the quick fox"
      (i.toLong, s"$head ${body(i)}")
    }
    val docs = texts.toDF("doc_id", "text")
    val result = Dedup.ngramJaccardOn(docs, 0.6)
      .select($"doc_a", $"doc_b", $"n_shared").as[(Long, Long, Long)]
      .collect().toSet
    // driver-side brute force over all pairs
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sets = texts.map { case (id, t) => id -> sh(t) }.toMap
    val ids = texts.map(_._1)
    val expected = (for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) intersect sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter) if j >= 0.6
    } yield (a, b, inter.toLong)).toSet
    assert(expected.nonEmpty) // the test must actually exercise pairs
    assert(result === expected)
    // the scale property: the df-max shingle is excluded from every
    // prefix, so no quadratic hot-key block can form in the candidate join
    val docSh = docs.select($"doc_id",
      graft.operators.TextOps.shingles(graft.operators.TextOps.toks($"text"), 3).as("sh"))
    val prefix = Dedup.prefixShingles(docSh, 0.6)
    assert(prefix.where($"shingle" === "the quick fox").count() === 0)
    // and prefixes are genuinely partial (~40% of each doc's shingles)
    val maxPrefix = prefix.groupBy($"doc_id").count().agg(max($"count")).head().getLong(0)
    assert(maxPrefix <= 3) // docs have 6 shingles; 6 - ceil(3.6) + 1 = 3
  }

  test("mixture sample flattens the language head, is deterministic, near budget") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"lang")
    val corpus = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val a = Sampling.mixtureSample(spark, sfDir).as[(Long, String)].collect()
    val b = Sampling.mixtureSample(spark, sfDir).as[(Long, String)].collect()
    assert(a.toSet === b.toSet) // content-hash draws: reproducible
    val kept = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // temperature flattening: the dominant language is sampled at a lower
    // RATE than every tail language
    val rates = corpus.map { case (l, n) => l -> kept.getOrElse(l, 0L).toDouble / n }
    val (headLang, _) = corpus.maxBy(_._2)
    rates.foreach { case (l, r) =>
      if (l != headLang) assert(rates(headLang) < r, s"$headLang rate !< $l rate")
    }
    // total stays near the N/2 budget (hash draws are binomial around it)
    val total = corpus.values.sum.toDouble
    assert(math.abs(a.length - 0.5 * total) / total < 0.1)
    // scale invariant, pinned: the corpus-wide totals are ONE-ROW broadcast
    // aggregates, never a single-partition global window — no Window
    // operator may appear anywhere in the plan (a partitionBy(lit(1))
    // window would serialize on one task if it ever saw the corpus)
    val plan = Sampling.mixtureSample(spark, sfDir).queryExecution.executedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "mixtureSample must not contain a global window")
  }

  test("q91 chunking covers every token exactly; no chunk swallowed by its predecessor") {
    import spark.implicits._
    val chunks = Sampling.chunkDocs(spark, sfDir)
      .select($"doc_id", $"n_toks", $"chunk_id", $"start_tok", $"n_chunk_toks")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(chunks.nonEmpty)
    chunks.values.foreach { rows =>
      val n = rows.head._2
      val sorted = rows.sortBy(_._3)
      // chunk ids are 1..k dense; starts step by the 48-token stride
      assert(sorted.map(_._3).toSeq === (1L to rows.size))
      sorted.foreach { case (_, _, cid, start, len) =>
        assert(start === (cid - 1) * 48 + 1)
        assert(len === math.min(64L, n - start + 1))
        assert(len > 0)
      }
      // full coverage: the last chunk reaches token n, the first starts at 1
      assert(sorted.last._4 + sorted.last._5 - 1 === n)
      // every chunk past the first contributes NEW tokens (not contained
      // in its predecessor's 64-token window)
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        val (_, _, _, s1, l1) = w(0)
        val (_, _, _, s2, l2) = w(1)
        assert(s2 + l2 - 1 > s1 + l1 - 1)
      }
    }
  }

  test("q93 token budget: spend <= budget, greedy-maximal, priority-closed") {
    import spark.implicits._
    val scored = graft.operators.TextAnalysis.qualityScore(spark, sfDir)
      .select($"doc_id", $"n_tokens",
        floor($"quality" * 1e6 + lit(1.0 / 3)).cast("long").as("score_q"))
      .as[(Long, Long, Long)].collect()
    val budget = scored.map(_._2).sum / 4
    val kept = Sampling.tokenBudgetSelect(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"score_q")
      .as[(Long, Long, Long)].collect()
    val keptIds = kept.map(_._1).toSet
    // never overspends
    assert(kept.map(_._2).sum <= budget)
    // equals the strict greedy prefix of the (score desc, doc_id asc)
    // order (stop at the first doc that doesn't fit) — the sequential
    // algorithm the distributed two-phase must match
    val greedy = scala.collection.mutable.Set[Long]()
    var spent = 0L
    var stopped = false
    scored.sortBy { case (id, _, s) => (-s, id) }.foreach { case (id, n, _) =>
      if (!stopped) {
        if (spent + n <= budget) { spent += n; greedy += id }
        else stopped = true
      }
    }
    assert(keptIds === greedy.toSet)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val salted = Skew.saltedJoinQuery(spark, sfDir)
      .orderBy($"s_suppkey").collect().toSeq
    val li = Tables.lineitem(spark, sfDir).select($"l_suppkey", $"l_quantity")
    val plain = li.join(Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name"),
        li("l_suppkey") === col("s_suppkey"))
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"s_suppkey").collect().toSeq
    assert(salted === plain)
  }
}

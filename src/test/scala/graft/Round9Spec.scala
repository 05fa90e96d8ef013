package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Evaluate, Graph, Relational, Sampling, Similarity, TextAnalysis, Timeseries}

/** Model-level invariants for the round-9 operators (q178-q181) on top
  * of their DuckDB hash gates. */
class Round9Spec extends SparkSpec {

  test("q178 SNM pairs are window-local, verified, and ranks match a global window") {
    import spark.implicits._
    val rows = Dedup.sortedNeighborhood(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap")
      assert(gap >= 1L && gap <= 3L)
      val jac = r.getAs[Long]("jac_ppm")
      assert(jac >= 400000L && jac <= 1000000L)
      assert(r.getAs[Long]("doc_a") !== r.getAs[Long]("doc_b"))
    }
    // the two-phase segmented rank must equal the single global window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        substring(regexp_replace(lower($"text"), " ", ""), 1, 24).as("snk"))
    val global = docs.withColumn("rn_g",
      row_number().over(Window.partitionBy(graft.functions.Win.bounded)
        .orderBy($"snk".asc, $"doc_id".asc)).cast("long"))
    val wSeg = Window.partitionBy($"seg").orderBy($"snk".asc, $"doc_id".asc)
    val wOff = Window.partitionBy(graft.functions.Win.bounded)
      .orderBy($"seg".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = docs.withColumn("seg", substring($"snk", 1, 1))
      .withColumn("rn_seg", row_number().over(wSeg).cast("long"))
    val offs = ranked.groupBy($"seg").agg(count(lit(1)).as("c"))
      .select($"seg", coalesce(sum($"c").over(wOff), lit(0L)).as("off"))
    val twoPhase = ranked.join(broadcast(offs), "seg")
      .select($"doc_id", ($"rn_seg" + $"off").as("rn"))
    val mismatches = global.join(twoPhase, "doc_id")
      .where($"rn_g" =!= $"rn").count()
    assert(mismatches === 0L)
  }

  test("q179 BH discoveries form a rank prefix with monotone p-values") {
    val rows = Evaluate.fdrDrift(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("p_ppb") <= b.getAs[Long]("p_ppb"))
        // once a rank is NOT a discovery, no later rank may be one
        assert(a.getAs[Long]("discovery") >= b.getAs[Long]("discovery"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("p_ppb") >= 0L
        && r.getAs[Long]("p_ppb") <= 1000000000L)
      assert(r.getAs[Long]("d_ppm") >= 0L && r.getAs[Long]("d_ppm") <= 1000000L)
    }
  }

  test("q180 EWMA scores exactly span-24 fewer hours than the grid and is exact on a constant series") {
    import spark.implicits._
    val grid = Timeseries.denseHourly(spark, sfDir)
    val span = grid.groupBy($"event_type")
      .agg((max($"h") - min($"h") + 1).as("n_hours"))
    val rows = Timeseries.ewmaForecast(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val spanMap = span.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_hours")).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_scored") === spanMap(t) - 24L)
      assert(r.getAs[Long]("mae_milli") ===
        r.getAs[Long]("sum_abs_err") / r.getAs[Long]("n_scored"))
    }
    // constant series x=7: truncated EWMA = 7*(1 - 2^-24); floor(f*1000)
    // = 6999 exactly, for every scored hour — the dyadic-exactness claim
    val f = (1 to 24).toDF("k")
      .agg(sum(pow(lit(0.5), $"k") * lit(7.0))).head().getDouble(0)
    assert(f === 7.0 * (1 - math.pow(2.0, -24)))
    assert(math.floor(f * 1000).toLong === 6999L)
  }

  test("q181 ACF rows: 6 lags per type, n strictly decreasing, |r| <= 1") {
    val rows = Timeseries.acfHourly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("lag_k"))
      assert(sorted.map(_.getAs[Long]("lag_k")).toSeq === (1L to 6L).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("n") === b.getAs[Long]("n") + 1L)
        case _ =>
      }
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Long]("r_ppm")) <= 1000000L)
      }
    }
  }

  test("q182 JS divergence: all source pairs, bounded by ln 2, non-negative sides") {
    val rows = TextAnalysis.jsDivergence(spark, sfDir).collect()
    val nSources = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source").distinct().count()
    assert(rows.length === (nSources * (nSources - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      // JS in [0, ln 2]: ppm bound 693148, sides non-negative
      val js = r.getAs[Long]("js_ppm")
      assert(js >= 0L && js <= 693148L, s"js_ppm $js out of [0, ln2]")
      assert(r.getAs[Long]("js_a_q") >= 0L)
      assert(r.getAs[Long]("js_b_q") >= 0L)
    }
  }

  test("q183 JL distortion concentrates at 1e6 and projections are exact ints") {
    val rows = Similarity.jlAudit(spark, sfDir).collect()
    assert(rows.length === 1225)
    val d = rows.map(_.getAs[Long]("distortion_ppm"))
    val mean = d.sum.toDouble / d.length
    // E[distortion] = 1e6 exactly for +/-1 projections; 16 planes give
    // sd ~ sqrt(2/16) ~ 0.35, so the 1225-pair mean sits well inside
    assert(mean > 800000 && mean < 1200000, s"mean distortion $mean")
    rows.foreach { r => assert(r.getAs[Long]("d2_proj_num") >= 0L) }
  }

  test("q184 HITS: 10 per role, leader pinned at 1e6 by renormalization") {
    val rows = Graph.hitsBipartite(spark, sfDir).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet === Set("authority", "hub"))
    byRole.foreach { case (_, rs) =>
      assert(rs.length === 10)
      val scores = rs.map(_.getAs[Long]("score"))
      assert(scores.max === 1000000L)
      scores.foreach(s => assert(s > 0L && s <= 1000000L))
    }
  }

  test("q185 DiD cell counts cover the stream and the readout is the mean identity") {
    val r = Evaluate.diffInDiff(spark, sfDir).head()
    val total = graft.sources.Tables.events(spark, sfDir).count()
    assert(r.getAs[Long]("n_a_pre") + r.getAs[Long]("n_a_post")
      + r.getAs[Long]("n_b_pre") + r.getAs[Long]("n_b_post") === total)
    assert(r.getAs[Long]("did_ppm") ===
      (r.getAs[Long]("mean_b_post_ppm") - r.getAs[Long]("mean_b_pre_ppm"))
        - (r.getAs[Long]("mean_a_post_ppm") - r.getAs[Long]("mean_a_pre_ppm")))
  }

  test("q186 alpha is bounded, abstention is real, and units need >= 2 votes") {
    val r = Curation.krippendorffAlpha(spark, sfDir).head()
    // abstention must actually fire: fewer ratings than 4 * units
    assert(r.getAs[Long]("n_ratings") < 4L * r.getAs[Long]("n_units"))
    assert(r.getAs[Long]("n_ratings") >= 2L * r.getAs[Long]("n_units"))
    assert(r.getAs[Long]("n0_tot") + r.getAs[Long]("n1_tot")
      === r.getAs[Long]("n_ratings"))
    // nominal alpha is at most 1 (perfect agreement -> o6 = 0)
    assert(r.getAs[Long]("alpha_ppm") <= 1000000L)
  }

  test("q187 maximin radii are positive and non-increasing; picks distinct") {
    val rows = Similarity.kCenterGreedy(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("pick"))
    assert(rows.map(_.getAs[Long]("pick")).toSeq === (1L to 5L).toSeq)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 5)
    val radii = rows.drop(1).map(_.getAs[Long]("radius2_q"))
    radii.foreach(r => assert(r > 0L))
    radii.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, s"radius grew: $a -> $b")
      case _ =>
    }
  }

  test("q188 the __all__ row is the exact n_s-weighted mean of stratum diffs") {
    val rows = Evaluate.stratifiedAte(spark, sfDir).collect()
    val (all, strata) = rows.partition(_.getAs[String]("stratum") == "__all__")
    assert(all.length === 1 && strata.nonEmpty)
    val wsum = strata.map(r => r.getAs[Long]("n_s") * r.getAs[Long]("diff_ppm")).sum
    val n = strata.map(_.getAs[Long]("n_s")).sum
    assert(all.head.getAs[Long]("diff_ppm") === wsum / n)
    assert(all.head.getAs[Long]("n_s") === n)
  }

  test("q189 permutation p honors the add-one identity and rep count") {
    val r = Evaluate.permTest(spark, sfDir).head()
    assert(r.getAs[Long]("n_reps") === 100L)
    val ex = r.getAs[Long]("n_extreme")
    assert(ex >= 0L && ex <= 100L)
    assert(r.getAs[Long]("p_milli") === (ex + 1) * 1000 / 101)
  }

  test("q190 leaky docs all cross the 50% line and never exceed their own shingles") {
    val rows = Dedup.splitLeakage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overlap_ppm") >= 500000L)
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_sh"))
    }
  }

  test("q191 U stays inside [0, 2*n0*n1] and ties are non-negative") {
    val rows = Evaluate.mannWhitney(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u2 = r.getAs[Long]("u2")
      assert(u2 >= 0L && u2 <= 2L * r.getAs[Long]("n0") * r.getAs[Long]("n1"))
      assert(r.getAs[Long]("tie3") >= 0L)
    }
  }

  test("q192 gains curve covers the corpus and ends at lift exactly 1e6") {
    val rows = Evaluate.decileLift(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.nonEmpty)
    val last = rows.last
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(last.getAs[Long]("cum_docs") === total)
    // full-corpus cumulative lift is the base rate over itself
    assert(last.getAs[Long]("lift_ppm") === 1000000L)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_docs") < b.getAs[Long]("cum_docs"))
      case _ =>
    }
  }

  test("q193 features never leak the label window") {
    import spark.implicits._
    val rows = Relational.pitFeatures(spark, sfDir)
    // independent recomputation of the label from the raw stream
    val day = 86400000L
    val cutoffs = Seq(1704931200000L, 1705363200000L,
      1705795200000L, 1706227200000L).toDF("cutoff_ms")
    val labels = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("tms"))
      .crossJoin(cutoffs)
      .where($"tms" >= $"cutoff_ms" && $"tms" < $"cutoff_ms" + 7 * day)
      .select($"cutoff_ms", $"user_id").distinct()
      .withColumn("expect", lit(1L))
    val joined = rows.join(labels, Seq("cutoff_ms", "user_id"), "left")
    assert(joined.where($"label_next_7d" =!= coalesce($"expect", lit(0L)))
      .count() === 0L)
    // trailing features bounded by the window: n_purchase <= n_7d
    assert(rows.where($"n_purchase_7d" > $"n_7d").count() === 0L)
  }

  test("q195 Wilson bound never exceeds the naive rate and stays in [0, 1e6]") {
    val rows = Evaluate.wilsonBound(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("wilson_ppm")
      assert(w >= 0L && w <= 1000000L)
      assert(w <= r.getAs[Long]("rate_ppm"))
      // shrinkage bites harder at low n: the bound is strictly below
      // the rate whenever the rate is positive
      if (r.getAs[Long]("s") > 0L) assert(w < r.getAs[Long]("rate_ppm"))
    }
  }

  test("q196 MRR and hit@10 are consistent probabilities") {
    val r = Evaluate.mrrEval(spark, sfDir).head()
    assert(r.getAs[Long]("n_heldout") > 0L)
    assert(r.getAs[Long]("hit10") <= r.getAs[Long]("n_heldout"))
    val mrr = r.getAs[Long]("mrr_ppm")
    assert(mrr > 0L && mrr <= 1000000L)
    assert(r.getAs[Long]("hit10_ppm") <= 1000000L)
  }

  test("q197 RFM codes are 1..5 per digit and cover every customer") {
    val rows = Relational.rfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      val (rq, fq, mq) = (seg / 100, (seg / 10) % 10, seg % 10)
      Seq(rq, fq, mq).foreach(d => assert(d >= 1L && d <= 5L, s"segment $seg"))
    }
    val covered = rows.map(_.getAs[Long]("n_customers")).sum
    val custs = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(covered === custs)
  }

  test("q198 coherence is a [0,1] fraction per bin with a [-pi,pi] phase") {
    val rows = graft.operators.Spectral.coherence(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq === (1L to 8L).toSeq)
    val nSeg = rows.map(_.getAs[Long]("n_segments")).distinct
    assert(nSeg.length === 1 && nSeg.head >= 1L)
    rows.foreach { r =>
      val g = r.getAs[Long]("gamma2_milli")
      assert(g >= 0L && g <= 1000L, s"gamma2 $g")
      val p = r.getAs[Long]("phase_milli")
      assert(p >= -3142L && p <= 3142L, s"phase $p")
    }
  }

  test("q199 OBF boundaries descend across looks and samples accumulate") {
    val rows = Evaluate.sequentialAb(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("look"))
    assert(rows.map(_.getAs[Long]("look")).toSeq === (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("boundary_milli") > b.getAs[Long]("boundary_milli"))
        assert(a.getAs[Long]("n0") + a.getAs[Long]("n1")
          <= b.getAs[Long]("n0") + b.getAs[Long]("n1"))
      case _ =>
    }
    rows.foreach { r =>
      val crossed = r.getAs[Long]("crossed")
      assert(crossed === (if (math.abs(r.getAs[Long]("z_milli"))
        >= r.getAs[Long]("boundary_milli")) 1L else 0L))
    }
  }

  test("q200 Markov eval beats the uniform baseline and counts stay consistent") {
    val rows = Evaluate.markovEval(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_eval")).sum
    val c = rows.map(_.getAs[Long]("n_correct")).sum
    assert(c <= n)
    rows.foreach { r =>
      assert(r.getAs[Long]("acc_ppm") ===
        r.getAs[Long]("n_correct") * 1000000 / r.getAs[Long]("n_eval"))
    }
  }

  test("q201 phash pairs stay within the verify cut and respect ordering") {
    val rows = graft.operators.Multimodal.blobPhash(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 12L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
    assert(rows.forall(_.getAs[Long]("hamming") >= 0L))
  }

  test("q202 item-CF: top-3 per item, cosine in (0, 1e6], co-count consistent") {
    val rows = Graph.itemCf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byItem = rows.groupBy(_.getAs[Long]("item"))
    byItem.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("sim_ppm") >= b.getAs[Long]("sim_ppm"))
        case _ =>
      }
    }
    rows.foreach { r =>
      val s = r.getAs[Long]("sim_ppm")
      assert(s > 0L && s <= 1000000L)
      assert(r.getAs[Long]("item") !== r.getAs[Long]("neighbor"))
    }
  }

  test("q203 KS distance is a [0,1] fraction and lambda is positive") {
    val rows = Timeseries.expGapFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("ks_d_milli")
      assert(d >= 0L && d <= 1000L)
      assert(r.getAs[Long]("lambda_per_hour_milli") > 0L)
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q204 mixture weights normalize to ~1e6 and follow excess surprisal") {
    val rows = Sampling.mixtureWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Long]("weight_ppm")).sum
    // integer floor division loses < |sources| ppm total
    assert(wsum <= 1000000L && wsum >= 1000000L - rows.length)
    // monotone: higher mean surprisal never gets a lower score
    val sorted = rows.sortBy(_.getAs[Long]("mean_surprisal_q"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        // scores follow the UNFLOORED mean, so only assert the strict
        // ordering when the floored means differ by > 1
        if (b.getAs[Long]("mean_surprisal_q")
            > a.getAs[Long]("mean_surprisal_q") + 1)
          assert(b.getAs[Long]("score_q") >= a.getAs[Long]("score_q"))
      case _ =>
    }
  }

  test("q205 histogram covers every pack and fill tracks the bucket") {
    val rows = Sampling.packEfficiency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nPacks = rows.map(_.getAs[Long]("n_packs")).sum
    val expectPacks = Sampling.seqPack(spark, sfDir)
      .select("shard", "pack_id").distinct().count()
    assert(nPacks === expectPacks)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 16L)
    }
  }

  test("q206 picks the 20 least-certain docs in ascending uncertainty") {
    val rows = TextAnalysis.activeSelect(spark, sfDir).collect()
    assert(rows.length === 20)
    val u = rows.map(_.getAs[Long]("uncertainty_ppm"))
    u.sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("q207 anonymity buckets cover every document and risk counts at-risk mass") {
    val rows = Curation.kAnonymity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_records")).sum
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(total === docs)
    rows.foreach { r =>
      val risk = r.getAs[Long]("risk_ppm")
      assert(risk >= 0L && risk <= 1000000L)
      // buckets at or above k=5 carry zero at-risk mass
      if (Set("5_to_9", "10_to_49", "50_plus")(r.getAs[String]("bucket")))
        assert(risk === 0L)
    }
  }

  test("q208 diff census reconciles both versions exactly") {
    import spark.implicits._
    val rows = Dedup.corpusDiff(spark, sfDir).collect()
    val by = rows.groupBy(_.getAs[String]("status"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("n_docs")).sum }
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val removed17 = spark.read.parquet(s"$sfDir/documents.parquet")
      .where($"doc_id" % 17 === 0).count()
    // v1 = removed + changed + unchanged; added are the re-id'd docs
    assert(by.getOrElse("removed", 0L) + by.getOrElse("changed", 0L)
      + by.getOrElse("unchanged", 0L) === n)
    // every re-id'd doc appears once as added and once as removed
    assert(by.getOrElse("added", 0L) > 0L)
    assert(by.getOrElse("removed", 0L) >= removed17)
  }

  test("q194 negatives are never positives and draws are reproducible") {
    import spark.implicits._
    val rows = Sampling.negativeSampling(spark, sfDir)
    val inter = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("custkey"), $"l_suppkey".as("neg_suppkey"))
      .distinct()
    assert(rows.join(inter, Seq("custkey", "neg_suppkey")).count() === 0L)
    val perUser = rows.groupBy($"custkey").count()
    assert(perUser.where($"count" > 2).count() === 0L)
    // determinism: two evaluations agree exactly
    val again = Sampling.negativeSampling(spark, sfDir)
    assert(rows.exceptAll(again).count() === 0L)
  }
}

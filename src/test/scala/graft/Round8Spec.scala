package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Evaluate, Relational, Sampling, Timeseries}

/** Model-level invariants for the round-8 operators (q159-q174) on top
  * of their DuckDB hash gates: the hash gate proves cross-engine
  * equality, these prove the SEMANTICS are the intended ones. */
class Round8Spec extends SparkSpec {

  test("q161 HLL estimate lands within 20% of exact distinct per type") {
    val rows = Relational.hllDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_q") / 100.0
      val exact = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - exact) / exact <= 0.20,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
    }
  }

  test("q163 bootstrap band brackets the point estimate, 100 replicas") {
    Evaluate.bootstrapCi(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("n_reps") === 100L)
      assert(r.getAs[Long]("lo_q") <= r.getAs[Long]("hi_q"))
      // the Poisson bootstrap mean concentrates around the sample mean;
      // the 90% band should cover it on every source at this n
      assert(r.getAs[Long]("lo_q") <= r.getAs[Long]("point_q"))
      assert(r.getAs[Long]("point_q") <= r.getAs[Long]("hi_q"))
    }
  }

  test("q167 NDCG in (0, 1]; perfect iff top-10 all relevant up to n_rel") {
    val rows = Evaluate.ndcgAt10(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("ndcg_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[Long]("dcg_q") <= r.getAs[Long]("idcg_q"))
    }
  }

  test("q169 apportionment sums exactly to the budget; alloc = base or base+1") {
    val rows = Sampling.budgetAllocation(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 10000L)
    rows.foreach { r =>
      val d = r.getAs[Long]("alloc") - r.getAs[Long]("base")
      assert(d === 0L || d === 1L)
    }
  }

  test("q170 sketch percentile sits within one bucket width of exact") {
    val b = spark.read.parquet(s"$sfDir/documents.parquet")
      .agg(min("n_chars"), max("n_chars")).head()
    val width = (b.getLong(1) + 1 - b.getLong(0)) / 32 + 1
    Relational.histQuantiles(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("exact_p50") <= r.getAs[Long]("exact_p90"))
      assert(math.abs(r.getAs[Long]("est_p50") - r.getAs[Long]("exact_p50")) <= width)
      assert(math.abs(r.getAs[Long]("est_p90") - r.getAs[Long]("exact_p90")) <= width)
    }
  }

  test("q172 audit counts are consistent; banding recall is high at J>=0.5") {
    val r = Dedup.lshRecallAudit(spark, sfDir).head()
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    // 4 bands x r=3: P(candidate | J=0.5) = 1-(1-0.5^3)^4 ~ 0.41 per
    // band-family draw, but true pairs here sit well above threshold;
    // the audit exists to MEASURE this - just pin sane bounds
    assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    assert(r.getAs[Long]("precision_ppm") <= 1000000L)
  }

  test("q164 dup token mass never exceeds total token mass") {
    Dedup.dupTokenRate(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_docs_hit") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("dup_ppm") <= 1000000L)
    }
  }

  test("q168 SCD2: contiguous versions, ordered ranges, one open per user") {
    val rows = Relational.scd2History(spark, sfDir)
      .orderBy("user_id", "version").collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, vs) =>
      assert(vs.map(_.getAs[Long]("version")).toSeq ===
        (1L to vs.length).toSeq)
      assert(vs.count(_.getAs[Boolean]("is_current")) === 1)
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") === b.getAs[Long]("valid_from"))
          // consecutive versions must differ in value (runs collapsed)
          assert(a.getAs[Long]("vq") !== b.getAs[Long]("vq"))
        case _ =>
      }
    }
  }

  test("q166 label prop only fills abstained seeds, never flips a seed") {
    Curation.labelProp(spark, sfDir).collect().foreach { r =>
      val seed = r.getAs[Long]("seed")
      val label = r.getAs[Long]("label")
      if (seed != 2L) assert(label === seed)
      else assert(label === 0L || label === 1L || label === 2L)
    }
  }

  test("q159 doc perplexity: every doc scored, surprisal nonnegative") {
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val rows = graft.operators.TextAnalysis.docPerplexity(spark, sfDir).collect()
    assert(rows.length.toLong === n) // every doc has >= 1 bigram here
    rows.foreach(r => assert(r.getAs[Long]("surprisal_q") >= 0L))
  }

  test("q165 hot cells are ordered by excess ratio desc") {
    val rows = Timeseries.hotCells(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ratios = rows.map(_.getAs[Long]("ratio_ppm")).toSeq
    assert(ratios === ratios.sortBy(-_))
  }

  test("q175 MMR: 3 distinct picks per source; pick 1 maximizes relevance") {
    val rows = graft.operators.Similarity.mmrDiversify(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, ps) =>
      assert(ps.map(_.getAs[Long]("pick")).sorted.toSeq === Seq(1L, 2L, 3L))
      assert(ps.map(_.getAs[Long]("doc_id")).distinct.length === 3)
      val byPick = ps.map(r => r.getAs[Long]("pick") -> r).toMap
      // pick 1 is pure relevance; its mmr is 7x its rel and >= the others'
      assert(byPick(1L).getAs[Long]("mmr_q") ===
        byPick(1L).getAs[Long]("rel_ppm") * 7)
      assert(byPick(1L).getAs[Long]("rel_ppm") >=
        byPick(2L).getAs[Long]("rel_ppm"))
    }
  }

  test("q176 attribution: both models account for every purchase") {
    import org.apache.spark.sql.functions._
    val rows = Relational.touchAttribution(spark, sfDir)
    val nPurch = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("event_type") === "purchase").count()
    val agg = rows.agg(sum("n_first"), sum("n_last")).head()
    assert(agg.getLong(0) === nPurch)
    assert(agg.getLong(1) === nPurch)
  }

  test("q177 CUPED: two arms share theta; adjustment preserves scale") {
    val rows = Evaluate.cupedAdjust(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("arm")).sorted.toSeq === Seq(0L, 1L))
    assert(rows.map(_.getAs[Long]("theta_ppm")).distinct.length === 1)
    rows.foreach { r =>
      // the adjustment re-centers, it doesn't rescale: adjusted mean stays
      // within 50% of the raw mean on this corpus
      val raw = r.getAs[Long]("mean_y_ppm").toDouble
      val adj = r.getAs[Long]("mean_y_adj_ppm").toDouble
      assert(math.abs(adj - raw) <= raw * 0.5, s"raw $raw adj $adj")
    }
  }
}

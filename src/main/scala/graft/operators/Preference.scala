package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pairwise-preference ranking — the aggregation a preference-data
  * pipeline (RLHF reward modelling, eval A/B judging) runs over judged
  * pairs: fit Bradley–Terry strengths from win/loss counts. Matches are
  * derived deterministically from the star schema: two lineitems of
  * different part brands in the same order "compete", the larger
  * `l_quantity` wins, ties are discarded.
  *
  * The fit is the standard MM update (Hunter 2004, "MM algorithms for
  * generalized Bradley-Terry models"): w_i ← W_i / Σ_j n_ij/(w_i+w_j),
  * rescaled each round so max w = 1e6. Three unrolled iterations, every
  * step integer arithmetic (per-term `div` then long sums), so the
  * DuckDB oracle — the same three iterations unrolled as CTEs — gates
  * on hash with no float tolerance.
  *
  * Scale shape: the corpus-sized work is ONE self-join of lineitems on
  * orderkey (bounded fan-out: items per order) followed by a partial-
  * agged groupBy to the |brands|² pair matrix; the MM iterations run on
  * that bounded matrix (broadcast-sized), never on the corpus. The
  * per-iteration max is an O(|brands|) aggregate. */
object Preference {

  /** q126: Bradley–Terry strength per brand after 3 MM iterations.
    * Output: (brand, n_wins, n_matches, strength_ppm).
    *
    * The corpus-sized reduction (self-join + groupBy to the pairwise
    * win matrix) is distributed; the matrix itself is MODEL-sized —
    * |brands|² rows, brand cardinality schema-bounded — so the MM fit
    * collects it and iterates on the driver, the same bounded-model
    * discipline as q68's k-row codebook. A DataFrame-looped fit was
    * measured 3.5s slower at sf0.1: three iterations × four tiny
    * stages of AQE barrier latency on a 300-row relation, zero data
    * parallelism to win. */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey", $"l_quantity".as("qty"))
      .join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"ok", $"p_brand".as("brand"), $"qty")
    // decided matches between distinct brands in one order; brand order
    // canonical (bi < bj) so each unordered pair aggregates to one row
    val pair: Array[(String, String, Long, Long)] = li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.brand" < $"b.brand" && $"a.qty" =!= $"b.qty")
      .select($"a.brand".as("bi"), $"b.brand".as("bj"),
        when($"a.qty" > $"b.qty", 1L).otherwise(0L).as("wi"))
      .groupBy($"bi", $"bj")
      .agg(count(lit(1)).as("n"), sum($"wi").as("w"))
      .as[(String, String, Long, Long)].collect()
    val directed = pair.map(p => (p._1, p._2, p._3)) ++
      pair.map(p => (p._2, p._1, p._3))
    val wins = (pair.map(p => (p._1, p._4)) ++ pair.map(p => (p._2, p._3 - p._4)))
      .groupBy(_._1).map { case (i, ws) => i -> ws.map(_._2).sum }
    val nMatches = directed.groupBy(_._1).map { case (i, ds) => i -> ds.map(_._3).sum }
    // MM iterations at ppm scale; the max(1,·) guard mirrors the oracle
    // (a starved strength pair can quantize to 0 — never divide by it)
    var s: Map[String, Long] = wins.map { case (i, _) => i -> 1000000L }
    for (_ <- 1 to 3 if pair.nonEmpty) {
      val denom = directed.groupBy(_._1).map { case (i, ds) =>
        i -> ds.map(d => d._3 * 1000000000000L / math.max(s(i) + s(d._2), 1L)).sum
      }
      val raw = wins.map { case (i, w) => i -> w * 1000000000000L / denom(i) }
      val mx = raw.values.max
      s = raw.map { case (i, r) => i -> r * 1000000L / mx }
    }
    wins.keys.toSeq.map(i => (i, wins(i), nMatches(i), s(i)))
      .toDF("brand", "n_wins", "n_matches", "strength_ppm")
  }
}

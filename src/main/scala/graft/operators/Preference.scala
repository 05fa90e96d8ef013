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
    * Output: (brand, n_wins, n_matches, strength_ppm). */
  def bradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey", $"l_quantity".as("qty"))
      .join(broadcast(Tables.part(spark, dir).select($"p_partkey", $"p_brand")),
        $"l_partkey" === $"p_partkey")
      .select($"ok", $"p_brand".as("brand"), $"qty")
    // decided matches between distinct brands in one order; brand order
    // canonical (bi < bj) so each unordered pair aggregates to one row
    val pair = li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.brand" < $"b.brand" && $"a.qty" =!= $"b.qty")
      .select($"a.brand".as("bi"), $"b.brand".as("bj"),
        when($"a.qty" > $"b.qty", 1L).otherwise(0L).as("wi"))
      .groupBy($"bi", $"bj")
      .agg(count(lit(1)).as("n"), sum($"wi").as("w"))
      // feeds the directed/wins/matches views AND three MM iterations —
      // materialize once; the matrix is |brands|² rows
      .localCheckpoint(false)
    val directed = pair.select($"bi".as("i"), $"bj".as("j"), $"n")
      .unionByName(pair.select($"bj".as("i"), $"bi".as("j"), $"n"))
    val wins = pair.select($"bi".as("i"), $"w".as("ww"))
      .unionByName(pair.select($"bj".as("i"), ($"n" - $"w").as("ww")))
      .groupBy($"i").agg(sum($"ww").as("n_wins"))
    val matches = directed.groupBy($"i").agg(sum($"n").as("n_matches"))
    // MM iterations at ppm scale; GREATEST guard mirrors the oracle (a
    // starved strength pair can quantize to 0 — never divide by it)
    var w = wins.select($"i", lit(1000000L).as("s"))
    for (_ <- 1 to 3) {
      val denom = directed
        .join(w.select($"i".as("__i"), $"s".as("si")), $"i" === $"__i")
        .join(w.select($"i".as("__j"), $"s".as("sj")), $"j" === $"__j")
        .groupBy($"i")
        .agg(sum(expr("(n * 1000000000000) div greatest(si + sj, 1)")).as("denom"))
      val raw = wins.join(denom, "i")
        .select($"i", expr("(n_wins * 1000000000000) div denom").as("r"))
      w = raw.crossJoin(broadcast(raw.agg(max($"r").as("mx"))))
        .select($"i", expr("(r * 1000000) div mx").as("s"))
    }
    wins.join(matches, "i").join(w, "i")
      .select($"i".as("brand"), $"n_wins", $"n_matches", $"s".as("strength_ppm"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** q90 tf-cosine properties on synthetic corpora where the expected
  * answer is computable in-memory: brute-force parity, and the df-cut
  * semantics (features in more than a quarter of the corpus never
  * reach the posting join, so pairs whose only commonality is
  * boilerplate don't surface).
  */
class TfCosineSpec extends SparkSpec {

  /** In-memory model: 3-shingle tf vectors, df cut, cos >= 4/5 via the
    * same integer cross-multiplication as the operator. */
  private def bruteCosine(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val n = docs.size
    val vecs = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val sh =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      id -> sh.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df = vecs.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size)
    val kept = vecs.view.mapValues(_.filter { case (s, _) => df(s) * 4 <= n }).toMap
    val ids = docs.map(_._1)
    (for {
      a <- ids; b <- ids if a < b
      va = kept(a); vb = kept(b)
      dot = va.keySet.intersect(vb.keySet).toSeq.map(s => va(s) * vb(s)).sum
      if dot > 0
      // norms over the FULL tf vector (the operator's semantics); the
      // df cut sparsifies only the dot
      na = vecs(a).values.map(v => v * v).sum
      nb = vecs(b).values.map(v => v * v).sum
      if dot * dot * 25 >= na * nb * 16
    } yield (a, b)).toSet
  }

  private def run(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.tfCosinePairsOn(docs.toDF("doc_id", "text"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
  }

  test("matches brute-force integer cosine on a mixed corpus") {
    val rng = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi")
    def doc(len: Int) = Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    // 20 random docs + 3 near-dup families (clone with a small tail edit)
    val base = (0L until 20L).map(i => i -> doc(30 + rng.nextInt(40)))
    val fams = (0 until 3).flatMap { f =>
      val t = doc(60)
      Seq((100L + f * 10) -> t, (101L + f * 10) -> (t + " " + doc(3)))
    }
    val docs = base ++ fams
    val got = run(docs)
    val want = bruteCosine(docs)
    assert(got === want)
    // the family pairs are actually found (the test isn't vacuous)
    assert((0 until 3).forall(f => got.contains((100L + f * 10, 101L + f * 10))))
  }

  test("df cut: pairs sharing only a hot boilerplate run don't surface") {
    // every doc carries the same 6-token boilerplate header (df = N);
    // bodies are disjoint, so no pair shares a non-boilerplate shingle
    val header = "terms of service apply here now"
    val docs = (0L until 12L).map { i =>
      val body = (0 until 20).map(j => s"w${i}_$j").mkString(" ")
      i -> (header + " " + body)
    }
    assert(run(docs).isEmpty)
    assert(bruteCosine(docs).isEmpty)
  }
}

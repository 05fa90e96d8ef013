package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The winnowing guarantee behind q89, proven on generated data: with
  * shingle width w = 8 and min-window k = 4, two documents sharing ANY
  * token run of length >= w + k - 1 = 11 expose at least one common
  * fingerprint — wherever that run sits in either document. The offset
  * independence is the property a block-aligned min would NOT have: a
  * shared passage starting at position 7 in one doc and 131 in the other
  * still collides, because the sliding min is taken over every window,
  * not over boundary-aligned blocks.
  */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(42)
  private def randTokens(n: Int): Seq[String] =
    Seq.fill(n)("t" + rng.nextInt(1000000)) // ~unique: no accidental runs

  test("any shared 11-token run yields a common fingerprint at random offsets") {
    val passage = randTokens(11)
    val pairs = (0 until 40).map { i =>
      val offA = rng.nextInt(120)
      val offB = rng.nextInt(120)
      val a = randTokens(offA) ++ passage ++ randTokens(rng.nextInt(120))
      val b = randTokens(offB) ++ passage ++ randTokens(rng.nextInt(120))
      (2L * i, a, 2L * i + 1, b)
    }
    val docs = pairs
      .flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
      .toDF("doc_id", "toks")
    val fp = Dedup.winnowFingerprints(docs)
    val shared = fp.as("x").join(fp.as("y"),
        $"x.fp" === $"y.fp" && $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (ia, _, ib, _) =>
      assert(shared.contains((ia, ib)),
        s"pair ($ia, $ib) shares an 11-token run but no fingerprint")
    }
  }

  test("documents with no shared run share no fingerprint") {
    val docs = (0 until 20).map(i => (i.toLong, randTokens(150)))
      .toDF("doc_id", "toks")
    val fp = Dedup.winnowFingerprints(docs)
    val collisions = fp.groupBy($"fp").count().where($"count" > 1).count()
    assert(collisions == 0)
  }

  test("winnowing keeps roughly a quarter of positional shingles") {
    val docs = Seq((0L, randTokens(4000))).toDF("doc_id", "toks")
    val kept = Dedup.winnowFingerprints(docs).count().toDouble
    val total = 4000 - 7
    // expected density for window k=4 is ~2/(k+1) = 0.4 of DISTINCT mins;
    // loose bounds: far fewer than all shingles, far more than none
    assert(kept > total * 0.15 && kept < total * 0.6, s"kept $kept of $total")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** q113 lagged cross-correlation, q114 ordered funnel, q115 quantile
  * normalization — in-memory model parity on sf0.001.
  */
class EventOpsSpec extends SparkSpec {

  private lazy val events = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type",
        unix_millis($"ts").as("t"), $"value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
  }

  test("lag cross-correlation matches the integer model") {
    val hourly = events
      .filter(e => e._3 == "click" || e._3 == "purchase")
      .groupBy(e => (e._3, e._4 / 3600000L)).view
      .mapValues(_.map(e => math.floor(e._5 * 1000 + 1.0 / 3).toLong).sum)
      .toMap
    val a = hourly.collect { case ((t, h), s) if t == "click" => h -> s }
    val b = hourly.collect { case ((t, h), s) if t == "purchase" => h -> s }.toMap
    val expect = (0L to 5L).map { lag =>
      val terms = a.toSeq.flatMap { case (h, sa) => b.get(h + lag).map(sa * _) }
      lag -> (terms.size.toLong, terms.sum)
    }.toMap
    val got = Relational.lagCrossCorr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
  }

  test("funnel steps are strictly ordered and monotone non-increasing") {
    val byUser = events.groupBy(_._1)
    val t1 = byUser.flatMap { case (u, es) =>
      es.filter(_._3 == "view").map(_._4).minOption.map(u -> _)
    }
    val t2 = t1.flatMap { case (u, t) =>
      byUser(u).filter(e => e._3 == "click" && e._4 > t).map(_._4).minOption
        .map(u -> _)
    }
    val t3 = t2.flatMap { case (u, t) =>
      byUser(u).filter(e => e._3 == "purchase" && e._4 > t).map(_._4).minOption
        .map(u -> _)
    }
    val got = Relational.funnelSteps(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 == t1.size && got(2L)._1 == t2.size && got(3L)._1 == t3.size)
    assert(got(1L)._1 >= got(2L)._1 && got(2L)._1 >= got(3L)._1)
    assert(got(1L)._2 == 1000000L)
    assert(got(3L)._2 == t3.size.toLong * 1000000L / t1.size)
  }

  test("spectrogram frame 0 equals the whole-trace q36 power spectrum") {
    import spark.implicits._
    val frame0 = graft.operators.Spectral.spectrogram(spark, sfDir)
      .where($"frame" === 0)
      .select($"user_id", $"bin", $"qpower").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val q36 = graft.operators.Spectral.fftPower(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(frame0 == q36)
    // and frame 1 exists for users with >= 16 samples, with 8 bins each
    val f1 = graft.operators.Spectral.spectrogram(spark, sfDir)
      .where($"frame" === 1).groupBy($"user_id").count().collect()
    assert(f1.nonEmpty)
    assert(f1.forall(_.getLong(1) == 8L))
  }

  test("quantile normalization is a 0..1e6 bijection per type") {
    import spark.implicits._
    val out = Relational.quantileNormalize(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val n = rows.length.toLong
      assert(rows.map(_._2).distinct.length.toLong == n) // ranks unique
      assert(rows.map(_._3).min == 0L)
      assert(rows.map(_._3).max == 1000000L)
      rows.foreach { case (_, rk, q) =>
        assert(q == (rk - 1) * 1000000L / (n - 1))
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Fft
import graft.sources.Tables

/** Spectral analysis over per-key traces (SURVEY §2.7 F7): assemble a
  * bounded trace per user from the events table and run the native FFT
  * expression on it. Raw spectra are not bit-portable across engines
  * (libm cos/sin) — q36 is DuckDB-hash-gated anyway via offset-quantized
  * power (see fftPower), with FftSpec's DFT/analytic oracles gating the
  * expression itself at full precision.
  *
  * Plan shape at scale: one shuffle to group traces (bounded length — the
  * collect_list is capped), then a map-only FFT per row; spectra never
  * leave the executors.
  */
object Spectral {

  /** q75: Walsh-Hadamard transform of each user's first 8 samples — the
    * spectral decomposition that IS cross-engine exact: H(k,j) =
    * (-1)^popcount(k AND j) is integer, so each coefficient is a signed
    * decimal sum (one partial-aggregated shuffle), unlike the FFT's
    * libm-bound twiddle factors (q36 needs quantization to hash-gate;
    * this one matches the oracle at FULL precision, no quantization).
    * Sequency-ordered coefficients
    * serve the same trend/oscillation screening as low-order Fourier
    * bins. */
  def whtPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val samples = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 8)
      .withColumn("n8", count(lit(1)).over(Window.partitionBy($"user_id")))
      .where($"n8" === 8)
      .select($"user_id", ($"rn" - 1).as("j"), $"value".cast("decimal(18,6)").as("vd"))
    val signed = samples
      .select($"user_id", $"j", $"vd", explode(sequence(lit(0), lit(7))).as("k"))
      .select($"user_id", $"k",
        (when(expr("bit_count(k & j) % 2") === 0, $"vd").otherwise(-$"vd")).as("term"))
    signed.groupBy($"user_id", $"k".cast("long").as("k"))
      .agg(sum($"term").cast("double").as("coef"))
  }

  /** Power spectrum of each user's first 8 samples (by ts): one row per
    * (user_id, bin). The power is emitted unit-quantized with a 1/3 offset
    * (`qpower = floor(|X_k|^2 + 0.3333333333333333)`): the radix-2 FFT
    * here and the oracle's naive trig DFT agree to ~1e-7 absolute at these
    * magnitudes (inputs < 500, n = 8), so a quantum of 1 is ~1e7x coarser
    * than the cross-engine libm/summation divergence while still
    * discriminating every bin. The 1/3 offset is load-bearing: bins
    * 0/2/4/6 have rational twiddles (0, +-1), so with 2-decimal inputs
    * their powers are exact lattice rationals m/10000 that DO land exactly
    * on floor boundaries (m = 10000k) and on half-integer boundaries
    * (p^2 + q^2 = 5000 mod 10000 is solvable, e.g. 50^2 + 50^2) — both
    * quantizers flip coins there. A boundary at k - 1/3 is unreachable:
    * |m * 10^12 + 333333333333| < 10^9 has no integer solution, so no
    * rational-bin power is within 1e-7 of it; irrational bins (odd k,
    * sqrt(2)/2 twiddles) are generic reals with ~1e-7 boundary mass. The
    * same double literal is used in the DuckDB oracle, making the hash
    * exact where raw doubles are not bit-portable. */
  def fftPower(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val traces = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 8)
      .groupBy($"user_id")
      .agg(array_sort(collect_list(struct($"rn", $"value"))).as("s"))
      .where(size($"s") === 8)
      .select($"user_id", transform($"s", x => x.getField("value")).as("trace"))
    traces
      .select($"user_id", posexplode(Fft.powerSpectrum($"trace")).as(Seq("bin", "power")))
      .select($"user_id", $"bin".cast("long").as("bin"),
        floor($"power" + lit(0.3333333333333333)).cast("long").as("qpower"))
  }

  /** q327: Fisher's g-test for hidden periodicity (Fisher 1929) on the
    * q36 power spectrum — the SIGNIFICANCE answer the raw periodogram
    * family (q36/q116/q268/q305) never gives: is this user's spectral
    * peak real structure or what the maximum of m noise ordinates
    * looks like anyway? g = max_k P_k / Σ P_k over the m = 3
    * independent ordinates (k = 1..3 of n = 8: DC and Nyquist
    * excluded), with the exact null tail p = m·(1−g)^(m−1) — for
    * m = 3, p = 3(1−g)², a pure RATIONAL in the quantized powers.
    *
    * Determinism: rides q36's hash-gated qpower longs; g_ppm is one
    * integer division and p_ppm = (3·10⁶·(Σ−max)²) div Σ² routes
    * through decimal(38,0) ((Σ−max)²·10⁶ can pass 10¹⁸) — NO float
    * enters after q36's quantizer.
    *
    * Scale shape: q36's plan plus a per-user 3-row agg — the spectrum
    * never leaves the executors, output is one row per user. */
  def fisherG(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fftPower(spark, dir)
      .where($"bin" >= 1L && $"bin" <= 3L)
      .groupBy($"user_id")
      .agg(max(struct($"qpower".as("p"), (-$"bin").as("nb"))).as("mx"),
        sum($"qpower").as("sumq"),
        count(lit(1)).as("m"))
      .where($"sumq" > 0L)
      .select($"user_id", (-$"mx.nb").as("k_peak"),
        $"mx.p".as("maxq"), $"sumq",
        expr("(maxq * 1000000) div sumq").as("g_ppm"),
        expr("""cast((3000000 * cast(sumq - maxq as decimal(38,0))
                 * (sumq - maxq)) div
                (cast(sumq as decimal(38,0)) * sumq) as bigint)""")
          .as("p_ppm"))
  }

  /** q116: spectrogram (short-time Fourier transform) — q36's power
    * spectrum per FRAME instead of per trace: each user's first 16
    * samples split into two non-overlapping 8-sample frames, FFT per
    * frame, offset-quantized power per (frame, bin). This is the
    * time-frequency picture the reference's fft module exists to feed
    * (`/root/reference/fdf/modules/bes/fft.py` — per-window transforms
    * over a long BES trace); the same 1/3-offset boundary argument as
    * q36 makes it hash-gateable.
    *
    * Scale shape: identical to q36 — one shuffle to assemble bounded
    * frames (the window ranks then groups by (user, frame)), then the
    * transform is map-only per frame row; hop/width are parameters of
    * the rank arithmetic, not the plan. A real spectrogram over a long
    * signal emits |trace|/hop frames — output-proportional, never
    * quadratic. */
  def spectrogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val frames = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .where($"rn" <= 16)
      .withColumn("frame", expr("(rn - 1) div 8"))
      .groupBy($"user_id", $"frame")
      .agg(array_sort(collect_list(struct($"rn", $"value"))).as("s"))
      .where(size($"s") === 8)
      .select($"user_id", $"frame".cast("long").as("frame"),
        transform($"s", x => x.getField("value")).as("trace"))
    frames
      .select($"user_id", $"frame",
        posexplode(Fft.powerSpectrum($"trace")).as(Seq("bin", "power")))
      .select($"user_id", $"frame", $"bin".cast("long").as("bin"),
        floor($"power" + lit(0.3333333333333333)).cast("long").as("qpower"))
  }

  /** q268: Welch power-spectral-density estimate — the frame-averaged
    * refinement of q116's spectrogram (Welch 1967, rectangular window,
    * non-overlapping segments): per (user, frequency bin), the mean of
    * the per-frame quantized powers. Averaging K independent frames
    * cuts the periodogram's variance by K — the estimator a turbulence
    * analysis actually trusts, where a single q36 periodogram is only a
    * sample (reference analog: the windowed spectra of
    * `/root/reference/fdf/modules/bes/fft.py`, which exist precisely to
    * be averaged).
    *
    * Exactness: each frame's power is already on the integer grid
    * (q116's +1/3-offset floor), so the Welch mean is one exact long
    * sum and one floor division — shuffle-order-free.
    *
    * Scale shape: rides the spectrogram (one bounded-frame shuffle,
    * map-only FFT) plus ONE partial-agged groupBy on (user, bin). A
    * long production trace contributes |trace|/width frames and the
    * average stays a two-column aggregate. */
  def welchPsd(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spectrogram(spark, dir)
      .groupBy($"user_id", $"bin")
      .agg(count(lit(1)).as("n_frames"), sum($"qpower").as("sum_q"))
      .select($"user_id", $"bin", $"n_frames",
        expr("sum_q div n_frames").as("welch_qpower"))
  }

  /** q279: dominant-mode tracking — per user, the argmax frequency bin
    * of each q116 spectrogram frame (lowest bin on power ties) and how
    * often it MOVES between consecutive frames. The time-frequency
    * summary a mode-tracking analysis reads (reference analog: the
    * frequency-vs-time ridge the fdf fft module's windowed spectra
    * exist to expose — mode hops are the event of interest): a stable
    * dominant bin is a coherent mode, a hopping one is mode activity
    * or a chirp.
    *
    * Exactness: argmax over already-quantized integer powers via
    * struct-max with (-bin) tie-break — exact; the hop count is a lag
    * compare over the ≤-frames-per-user relation.
    *
    * Scale shape: rides the spectrogram; the argmax is one partial-agg
    * per (user, frame), the hop census a per-user window over the
    * frame-count-bounded relation. |users| rows out. */
  def modeTrack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dom = spectrogram(spark, dir)
      .groupBy($"user_id", $"frame")
      .agg(max(struct($"qpower", (-$"bin").as("nb"))).as("top"))
      .select($"user_id", $"frame", (-$"top.nb").as("dom_bin"))
    val w = Window.partitionBy($"user_id").orderBy($"frame".asc)
    dom
      .withColumn("prev", lag($"dom_bin", 1).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when($"prev".isNotNull && $"prev" =!= $"dom_bin", 1L)
          .otherwise(0L)).as("n_hops"),
        min(struct($"frame", $"dom_bin")).getField("dom_bin")
          .as("dom_first"),
        max(struct($"frame", $"dom_bin")).getField("dom_bin")
          .as("dom_last"))
  }

  /** q198: magnitude-squared coherence between the click and purchase
    * hourly series — the two-signal cross-spectral diagnostic (Welch-
    * averaged over 16-hour segments, rectangular window): γ²(f) =
    * |Σ_seg Pab(f)|² / (Σ|Pa|²·Σ|Pb|²) ∈ [0,1], with the cross-phase
    * atan2(Im ΣPab, Re ΣPab) giving the lead/lag at each frequency —
    * the frequency-resolved refinement of q113's time-domain lag
    * cross-correlation (reference analog: the BES-style two-channel
    * turbulence correlation the fdf fft module's windowed spectra
    * feed, `fdf/modules/bes/fft.py`).
    *
    * Exactness discipline: per-segment means are removed on an
    * INTEGER grid (xd = 16·x − Σ_seg x — the uniform scale cancels in
    * the γ² ratio exactly), so floats enter only at the cos/sin
    * twiddles; γ² and phase are milli-quantized with the +1/3 offset
    * (the q36 recipe) and every float expression is written in the
    * same order in both engines.
    *
    * Scale shape: the stream reduces once to the dense hourly grid;
    * segmenting, the 9-bin DFT (|hours|·9 terms), the per-segment
    * spectra, and the Welch average are all bounded-relation work. */
  def coherence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val L = 16
    val grid = Timeseries.denseHourly(spark, dir)
      .where($"event_type".isin("click", "purchase"))
    val lo = grid.agg(min($"h").as("lo"))
    val seg = grid.crossJoin(broadcast(lo))
      .select($"event_type",
        expr(s"(h - lo) div $L").as("seg"),
        expr(s"(h - lo) % $L").as("j"), $"x")
    // complete segments only; detrend on the integer grid
    val segStats = seg.groupBy($"event_type", $"seg")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"))
      .where($"n" === L)
    val xd = seg.join(segStats, Seq("event_type", "seg"))
      .select($"event_type", $"seg", $"j", (lit(L) * $"x" - $"sx").as("xd"))
    val spec = xd
      .crossJoin(broadcast(spark.range(1, 9).select($"id".as("k"))))
      .groupBy($"event_type", $"seg", $"k")
      .agg(
        sum($"xd" * cos(lit(2 * math.Pi) * $"k" * $"j" / L)).as("re"),
        sum($"xd" * sin(lit(2 * math.Pi) * $"k" * $"j" / L)).as("im"))
    // one conditional re-aggregation instead of a click⋈purchase
    // self-join: spec held exactly one row per (event_type, seg, k), so
    // max(when(...)) picks each side's value and the isNotNull filter is
    // the inner join — the whole grid→seg→spec pipeline (itself a
    // doubled-subtree chain) now evaluates ONCE instead of twice, and
    // the (seg, k) join exchange disappears (guide §2.4; the round-15
    // jobs-per-query profile read 25 jobs for this 0.85 s query)
    spec.groupBy($"seg", $"k")
      .agg(
        max(when($"event_type" === "click", $"re")).as("re_a"),
        max(when($"event_type" === "click", $"im")).as("im_a"),
        max(when($"event_type" === "purchase", $"re")).as("re_b"),
        max(when($"event_type" === "purchase", $"im")).as("im_b"))
      .where($"re_a".isNotNull && $"re_b".isNotNull)
      .groupBy($"k")
      .agg(count(lit(1)).as("n_segments"),
        sum($"re_a" * $"re_b" + $"im_a" * $"im_b").as("pab_re"),
        sum($"im_a" * $"re_b" - $"re_a" * $"im_b").as("pab_im"),
        sum($"re_a" * $"re_a" + $"im_a" * $"im_a").as("paa"),
        sum($"re_b" * $"re_b" + $"im_b" * $"im_b").as("pbb"))
      .where($"paa" > 0 && $"pbb" > 0)
      .select($"k", $"n_segments",
        floor(($"pab_re" * $"pab_re" + $"pab_im" * $"pab_im")
          / ($"paa" * $"pbb") * 1000 + lit(1.0 / 3)).cast("long")
          .as("gamma2_milli"),
        floor(atan2($"pab_im", $"pab_re") * 1000 + lit(1.0 / 3))
          .cast("long").as("phase_milli"))
  }

  /** q305: Lomb–Scargle periodogram — the power spectrum for UNEVENLY
    * sampled series, which the whole q36/q116/q268 FFT family cannot
    * express (the radix-2 transform assumes a uniform grid; event
    * arrival times are anything but). This is the standard diagnostic
    * for irregularly clocked signals (Lomb 1976, Scargle 1982; the
    * reference's fft module `/root/reference/fdf/modules/bes/fft.py`
    * resamples to a grid first — Lomb–Scargle removes that resampling
    * step entirely). Each event_type's (ts, value) series is scanned
    * ONCE: per (series, k) the floating-mean generalized form needs
    * only 9 sufficient sums (Σcosθ, Σsinθ, Σcos²θ, Σsin²θ, Σcosθsinθ,
    * Σv·cosθ, Σv·sinθ, Σv, Σv²) at trial frequency ω_k = 2πk/span —
    * the τ-shifted two-pass form is algebraically eliminated, so there
    * is no second scan and no per-frequency data pass.
    *
    * Exactness: every per-row term is floor-quantized to a long
    * lattice BEFORE the sum (1e6 for trig, 1e3 for v·trig, 1e2 for
    * v/v² — the q87/q296 recipe, with the 1/3 offset guarding the
    * rational-argument boundary cases exactly as q36 documents), so
    * the shuffled sums are order-free exact longs; the closing algebra
    * runs in doubles over those identical longs with the identical
    * literal chain in the DuckDB oracle. Normalized power ∈ [0,1] is
    * emitted at milli resolution.
    *
    * Scale shape: one scan → map-side 8-way frequency fan-out (a
    * 64-byte broadcast range, no shuffle) → partial-agged group to
    * |series|×8 rows. At 100 TB the only shuffle is the final tiny
    * aggregate; the trig work is embarrassingly map-parallel and stays
    * inside whole-stage codegen. */
  def lombScargle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lombScargleOn(Tables.events(spark, dir)
      .select($"event_type", unix_millis($"ts").as("tms"), $"value"))
  }

  /** Testable core over any `(event_type, tms: long, value: double)`
    * relation (the spec drives a planted uneven-sampled sinusoid). */
  private[graft] def lombScargleOn(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val spark = ev.sparkSession
    val bounds = ev.groupBy($"event_type")
      .agg(min($"tms").as("t0"),
        (max($"tms") - min($"tms")).as("span"),
        count(lit(1)).as("n"))
      .where($"span" > 0L && $"n" >= 16L)
    val terms = ev.join(broadcast(bounds), "event_type")
      .select($"event_type", $"span", $"n",
        ($"tms" - $"t0").as("t"), $"value")
      .crossJoin(broadcast(spark.range(1, 9).select($"id".as("k"))))
      .withColumn("ang", expr(
        "(CAST(k * t AS DOUBLE) / CAST(span AS DOUBLE)) * 6.283185307179586"))
      .select($"event_type", $"k", $"n",
        expr("CAST(floor(cos(ang) * 1000000 + 1.0/3) AS BIGINT)").as("qc"),
        expr("CAST(floor(sin(ang) * 1000000 + 1.0/3) AS BIGINT)").as("qs"),
        expr("CAST(floor(cos(ang) * cos(ang) * 1000000 + 1.0/3) AS BIGINT)")
          .as("qcc"),
        expr("CAST(floor(sin(ang) * sin(ang) * 1000000 + 1.0/3) AS BIGINT)")
          .as("qss"),
        expr("CAST(floor(cos(ang) * sin(ang) * 1000000 + 1.0/3) AS BIGINT)")
          .as("qcs"),
        expr("CAST(floor(value * cos(ang) * 1000 + 1.0/3) AS BIGINT)")
          .as("qvc"),
        expr("CAST(floor(value * sin(ang) * 1000 + 1.0/3) AS BIGINT)")
          .as("qvs"),
        expr("CAST(floor(value * 100 + 1.0/3) AS BIGINT)").as("qv"),
        expr("CAST(floor(value * value * 100 + 1.0/3) AS BIGINT)").as("qvv"))
    terms.groupBy($"event_type", $"k")
      .agg(max($"n").as("n"),
        sum($"qc").as("s_qc"), sum($"qs").as("s_qs"),
        sum($"qcc").as("s_qcc"), sum($"qss").as("s_qss"),
        sum($"qcs").as("s_qcs"),
        sum($"qvc").as("s_qvc"), sum($"qvs").as("s_qvs"),
        sum($"qv").as("s_qv"), sum($"qvv").as("s_qvv"))
      .withColumn("n_d", expr("CAST(n AS DOUBLE)"))
      .withColumn("sc", expr("CAST(s_qc AS DOUBLE) / 1000000.0"))
      .withColumn("ssn", expr("CAST(s_qs AS DOUBLE) / 1000000.0"))
      .withColumn("scc", expr("CAST(s_qcc AS DOUBLE) / 1000000.0"))
      .withColumn("sss", expr("CAST(s_qss AS DOUBLE) / 1000000.0"))
      .withColumn("scs", expr("CAST(s_qcs AS DOUBLE) / 1000000.0"))
      .withColumn("svc", expr("CAST(s_qvc AS DOUBLE) / 1000.0"))
      .withColumn("svs", expr("CAST(s_qvs AS DOUBLE) / 1000.0"))
      .withColumn("sv", expr("CAST(s_qv AS DOUBLE) / 100.0"))
      .withColumn("svv", expr("CAST(s_qvv AS DOUBLE) / 100.0"))
      .withColumn("cbar", expr("svc - sv * sc / n_d"))
      .withColumn("sbar", expr("svs - sv * ssn / n_d"))
      .withColumn("ccbar", expr("scc - sc * sc / n_d"))
      .withColumn("ssbar", expr("sss - ssn * ssn / n_d"))
      .withColumn("csbar", expr("scs - sc * ssn / n_d"))
      .withColumn("vv", expr("svv - sv * sv / n_d"))
      .withColumn("det", expr("ccbar * ssbar - csbar * csbar"))
      .where(expr("det > 0.000000001 AND vv > 0.000000001"))
      .select($"event_type", $"k", $"n",
        expr("CAST(floor((ssbar * cbar * cbar + ccbar * sbar * sbar" +
          " - 2.0 * csbar * cbar * sbar) / det / vv * 1000.0 + 1.0/3)" +
          " AS BIGINT)").as("power_milli"))
  }
}

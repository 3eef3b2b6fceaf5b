package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.{Smooth, Trend}

/** Group-wise OLS trend and Z-order layout keys. */
class TrendZorderSpec extends SparkSpec {
  import spark.implicits._

  test("groupTrend: exact fit on a noiseless line; R^2 = 1") {
    // g1: y = 3x + 2 exactly; g2: y = -0.5x + 10
    val rows = (1 to 50).map(i => ("g1", i.toDouble, 3.0 * i + 2)) ++
      (1 to 50).map(i => ("g2", i.toDouble, -0.5 * i + 10))
    val got = Trend.groupTrend(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (n1, s1, i1, r1) = got("g1")
    assert(n1 == 50 && math.abs(s1 - 3.0) < 1e-9 && math.abs(i1 - 2.0) < 1e-7)
    assert(math.abs(r1 - 1.0) < 1e-12)
    val (_, s2, i2, _) = got("g2")
    assert(math.abs(s2 + 0.5) < 1e-9 && math.abs(i2 - 10.0) < 1e-7)
  }

  test("groupTrend: zero-variance x and single-point groups give NULLs, not NaN") {
    val rows = Seq(
      ("flat", 5.0, 1.0), ("flat", 5.0, 2.0), ("flat", 5.0, 3.0),
      ("single", 1.0, 7.0))
    val got = Trend.groupTrend(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> (r.isNullAt(2), r.isNullAt(3), r.isNullAt(4))).toMap
    assert(got("flat") == ((true, true, true)))
    assert(got("single") == ((true, true, true)))
  }

  test("groupTrend: null x or y rows excluded pairwise") {
    val rows = Seq(
      ("g", Some(1.0), Some(1.0)), ("g", Some(2.0), Some(2.0)),
      ("g", None, Some(9.0)), ("g", Some(9.0), None))
    val got = Trend.groupTrend(rows.toDF("g", "x", "y"), Seq("g"), col("x"), col("y")).head
    assert(got.getLong(1) == 2)
    assert(math.abs(got.getDouble(2) - 1.0) < 1e-12) // slope from the 2 clean points
  }

  test("morton2: bit interleaving matches a reference implementation") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (170L, 85L), (3L, 12L))
    val df = cases.toDF("x", "y")
    val got = df.select(ZOrder.morton2(col("x"), col("y"), 8)).collect().map(_.getLong(0))
    val exp = cases.map { case (x, y) => ref(x, y, 8) }
    assert(got.toSeq == exp)
    assert(ref(255, 255, 8) == 65535) // sanity: full 16-bit key
  }

  test("morton2: locality — consecutive key ranges span narrow boxes in both dims") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val keyed = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton2(col("x"), col("y"), 6).as("z"))
    // each 64-key range of a 6-bit curve is one 8x8 box: x/y span at most 8
    val spans = keyed.groupBy(expr("z div 64").as("r"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.length == 64)
    assert(spans.forall(r => r.getLong(1) <= 7 && r.getLong(2) <= 7))
  }

  test("morton2/mortonSql: guards reject out-of-range bits") {
    intercept[IllegalArgumentException] { ZOrder.morton2(col("x"), col("y"), 0) }
    intercept[IllegalArgumentException] { ZOrder.mortonSql("x", "y", 32) }
  }

  // ------------------------------------------------------------ trend2

  test("trend2: exact plane recovered; collinear regressors are NULL") {
    // y = 2 + 3·x1 − x2 exactly on 5 non-collinear points → R² = 1
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0), (2.0, 1.0))
    val df = pts.map { case (a, b) => ("g", a, b, 2.0 + 3 * a - b) }
      .toDF("g", "x1", "x2", "y")
    val Array(r) = Trend.trend2(df, Seq("g"), col("x1"), col("x2"), col("y"))
      .collect()
    assert(r.getAs[Long]("n") == 5L)
    assert(math.abs(r.getAs[Double]("b0") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b2") + 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)

    // x2 = 2·x1 exactly → singular normal equations → NULL coefficients
    val coll = (0 to 4).map(i => ("g", i.toDouble, 2.0 * i, i * 1.5))
      .toDF("g", "x1", "x2", "y")
    val Array(c) = Trend.trend2(coll, Seq("g"), col("x1"), col("x2"), col("y"))
      .collect()
    assert(c.isNullAt(c.fieldIndex("b1")))
  }

  test("trend2: constant target fits b0 with NULL r2") {
    val df = Seq(("g", 0.0, 1.0, 7.0), ("g", 1.0, 0.0, 7.0),
      ("g", 2.0, 2.0, 7.0), ("g", 3.0, 1.0, 7.0)).toDF("g", "x1", "x2", "y")
    val Array(r) = Trend.trend2(df, Seq("g"), col("x1"), col("x2"), col("y"))
      .collect()
    assert(math.abs(r.getAs[Double]("b0") - 7.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b1")) < 1e-9)
    assert(r.isNullAt(r.fieldIndex("r2"))) // zero-variance target
  }

  // ------------------------------------------------------- interArrival

  test("interArrival: metronome B = −1; hand moments; gaps never cross entities") {
    // perfectly regular gaps (σ = 0) → burstiness exactly −1
    val reg = (0 to 5).map(i => ("g", 1L, i * 10L)).toDF("g", "u", "t")
    val Array(r) = Smooth.interArrival(reg, Seq("g"), "u", col("t"),
      tieCols = Seq.empty).collect()
    assert(r.getAs[Long]("n_gaps") == 5L)
    assert(r.getAs[Double]("std_s") == 0.0)
    assert(r.getAs[Double]("burstiness") == -1.0)

    // gaps {1e6, 3e6} µs: μ = 2e6, s² = 2e12 → σ = √2·1e6
    val two = Seq(("h", 1L, 0L), ("h", 1L, 1000000L), ("h", 1L, 4000000L))
      .toDF("g", "u", "t")
    val Array(h) = Smooth.interArrival(two, Seq("g"), "u", col("t"),
      tieCols = Seq.empty).collect()
    val sigma = math.sqrt(2.0) * 1e6
    assert(h.getAs[Double]("mean_s") == 2.0)
    assert(math.abs(h.getAs[Double]("std_s") - sigma / 1e6) < 1e-9)
    assert(math.abs(h.getAs[Double]("burstiness") -
      (sigma - 2e6) / (sigma + 2e6)) < 1e-12)

    // interleaved entities: entity-keyed lags, so each contributes its own
    // regular gaps — never a cross-entity gap
    val inter = Seq(("g", 1L, 0L), ("g", 2L, 5L), ("g", 1L, 10L),
      ("g", 2L, 15L), ("g", 1L, 20L)).toDF("g", "u", "t")
    val Array(x) = Smooth.interArrival(inter, Seq("g"), "u", col("t"),
      tieCols = Seq.empty).collect()
    assert(x.getAs[Long]("n_gaps") == 3L) // 2 for u=1, 1 for u=2, all = 10
    assert(x.getAs[Double]("burstiness") == -1.0)
  }

  // --------------------------------------------------------------- acf

  test("acf: alternating series has rho_k = ±(n−k)/n; constants are NULL") {
    // v = +1,−1,… (n = 10, mean 0): ρ₁ = −9/10, ρ₂ = +8/10 EXACTLY
    val alt = (1 to 10).map(i => ("g", i.toLong, if (i % 2 == 1) 1.0 else -1.0))
      .toDF("g", "t", "v")
    val Array(r) = Smooth.acf(alt, Seq("g"), col("t"), col("v"),
      tieCols = Seq.empty, maxLag = 3).collect()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("rho1") == -0.9)
    assert(r.getAs[Double]("rho2") == 0.8)
    assert(r.getAs[Double]("rho3") == -0.7)

    val const = (1 to 8).map(i => ("g", i.toLong, 5.0)).toDF("g", "t", "v")
    val Array(c) = Smooth.acf(const, Seq("g"), col("t"), col("v"),
      tieCols = Seq.empty, maxLag = 2).collect()
    assert(c.isNullAt(c.fieldIndex("rho1"))) // zero variance
  }

  test("acf: a monotone ramp is strongly positively autocorrelated") {
    val ramp = (1 to 100).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "t", "v")
    val Array(r) = Smooth.acf(ramp, Seq("g"), col("t"), col("v"),
      tieCols = Seq.empty, maxLag = 1).collect()
    assert(r.getAs[Double]("rho1") > 0.9)
  }

  // --------------------------------------------------------------- ccf

  test("ccf: mirrored alternating series — rho0 = −1, rho_k = ∓(n−k)/n") {
    // x = +1,−1,… and y = −x (n = 6, both mean 0): y_{t−1} = x_t so
    // every lag-1 product is positive → ρ₁ = 5/6; ρ₂ = −4/6; ρ₀ = −1.
    val df = (1 to 6).map { i =>
      val x = if (i % 2 == 1) 1.0 else -1.0
      ("g", i.toLong, x, -x)
    }.toDF("g", "t", "x", "y")
    val Array(r) = Smooth.ccf(df, Seq("g"), col("t"), col("x"), col("y"),
      tieCols = Seq.empty, maxLag = 2).collect()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("rho0") == -1.0)
    assert(r.getAs[Double]("rho1") == 5.0 / 6.0)
    assert(r.getAs[Double]("rho2") == -4.0 / 6.0)
  }

  test("ccf: constant series are NULL; null rows drop pairwise") {
    val df = Seq[(String, Long, java.lang.Double, java.lang.Double)](
      ("g", 1L, 1.0, 5.0), ("g", 2L, 2.0, 5.0), ("g", 3L, 3.0, 5.0),
      ("g", 4L, null, 9.0), ("g", 5L, 4.0, null)
    ).toDF("g", "t", "x", "y")
    val Array(r) = Smooth.ccf(df, Seq("g"), col("t"), col("x"), col("y"),
      tieCols = Seq.empty, maxLag = 1).collect()
    assert(r.getAs[Long]("n") == 3L) // both null rows excluded
    assert(r.isNullAt(r.fieldIndex("rho0"))) // y constant on kept rows
  }

  // ------------------------------------------------------- durbinWatson

  test("durbinWatson: alternating = 3 exactly, ramp = 0.6, constant NULL") {
    // x = 1,−1,1,−1: e = ±4e4; Σe² = 6.4e9, Σdiff² = 3·(8e4)² = 1.92e10
    // → DW = 3. Ramp 1..4: e = (−6,−2,2,6)e4 → 4.8e9/8e9 = 0.6.
    val alt = Seq(("a", 1L, 1.0), ("a", 2L, -1.0), ("a", 3L, 1.0),
      ("a", 4L, -1.0)).toDF("g", "t", "v")
    val ramp = (1 to 4).map(i => ("r", i.toLong, i.toDouble)).toDF("g", "t", "v")
    val const = Seq(("c", 1L, 7.0), ("c", 2L, 7.0)).toDF("g", "t", "v")
    val out = Smooth.durbinWatson(alt.union(ramp).union(const), Seq("g"),
        col("t"), col("v"), tieCols = Seq.empty)
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(out("a").get.asInstanceOf[Double] == 3.0)
    assert(out("r").get.asInstanceOf[Double] == 0.6)
    assert(out("c").isEmpty)
  }

  // ------------------------------------------------------- resampleFill

  test("resampleFill: grid spans first..last bin; last-obs-wins; forward fill") {
    val df = Seq(
      // bin 0: one obs; bin 20: two obs — later ts wins (v = 3)
      ("k", Timestamp.valueOf("2024-01-01 00:00:05"), 1.0, 1L),
      ("k", Timestamp.valueOf("2024-01-01 00:00:21"), 2.0, 2L),
      ("k", Timestamp.valueOf("2024-01-01 00:00:25"), 3.0, 3L)
    ).toDF("k", "ts", "v", "id")
    val rows = Smooth.resampleFill(df, Seq("k"), col("ts"), col("v"),
        stepSec = 10L, tieCol = col("id"))
      .orderBy("bin_epoch").collect()
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(rows.map(_.getLong(1)).toSeq == Seq(base, base + 10, base + 20))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 1.0, 3.0))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(false, true, false))
  }

  // ------------------------------------------------------ seasonalIndex

  test("seasonalIndex: exact rational multipliers; zero-total NULL") {
    val df = Seq(
      ("g", "a", 10.0), ("g", "a", 20.0), ("g", "b", 30.0),
      ("z", "a", 5.0), ("z", "b", -5.0)
    ).toDF("g", "season", "v")
    val out = Smooth.seasonalIndex(df, Seq("g"), col("season"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), Option(r.get(4)))).toMap
    // overall mean 20: a (mean 15) → 0.75, b (mean 30) → 1.5
    assert(out(("g", "a"))._1 == 2L && out(("g", "a"))._2 == 15.0)
    assert(out(("g", "a"))._3.get.asInstanceOf[Double] == 0.75)
    assert(out(("g", "b"))._3.get.asInstanceOf[Double] == 1.5)
    // Σv = 0 exactly → index NULL (decided in DECIMAL, not a double ≈0)
    assert(out(("z", "a"))._3.isEmpty && out(("z", "b"))._3.isEmpty)
  }

  // -------------------------------------------------- seasonalNaiveEval

  test("seasonalNaiveEval: ramp vs season-2 forecast — hand metrics") {
    // v = 1,2,3,4 with season 2: f = (·,·,1,2), e = (2,2) → MAE = RMSE = 2;
    // SMAPE = (2·2/4 + 2·2/6)/2 ≈ 0.8333; naive-1 MAE = 1 → MASE = 2.
    val df = (1 to 4).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "t", "v")
    val Array(r) = Smooth.seasonalNaiveEval(df, Seq("g"), col("t"), col("v"),
      tieCols = Seq.empty, season = 2).collect()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_eval") == 2L)
    assert(r.getAs[Double]("mae") == 2.0)
    assert(r.getAs[Double]("rmse") == 2.0)
    assert(math.abs(r.getAs[Double]("smape") - (1.0 + 0.66666667) / 2) < 1e-8)
    assert(r.getAs[Double]("mase") == 2.0)
  }

  test("seasonalNaiveEval: short series (no seasonal predecessor) → NULL metrics") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 6.0)).toDF("g", "t", "v")
    val Array(r) = Smooth.seasonalNaiveEval(df, Seq("g"), col("t"), col("v"),
      tieCols = Seq.empty, season = 7).collect()
    assert(r.getAs[Long]("n_eval") == 0L)
    assert(r.isNullAt(r.fieldIndex("mae")) && r.isNullAt(r.fieldIndex("mase")))
  }

  test("resampleFill: same-timestamp collision resolves by tie column") {
    val t = Timestamp.valueOf("2024-01-01 00:00:05")
    val df = Seq(("k", t, 1.0, 1L), ("k", t, 9.0, 2L)).toDF("k", "ts", "v", "id")
    val Array(r) = Smooth.resampleFill(df, Seq("k"), col("ts"), col("v"),
      stepSec = 10L, tieCol = col("id")).collect()
    assert(r.getDouble(2) == 9.0) // highest tie wins (DESC)
  }

  test("resampleFill linear: exact interpolation between brackets") {
    // obs at bins 0 (v=1) and 30 (v=4), step 10 → 1, 2, 3, 4 exactly
    val df = Seq(
      ("k", Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, 1L),
      ("k", Timestamp.valueOf("2024-01-01 00:00:30"), 4.0, 2L)
    ).toDF("k", "ts", "v", "id")
    val rows = Smooth.resampleFill(df, Seq("k"), col("ts"), col("v"),
        stepSec = 10L, tieCol = col("id"), method = "linear")
      .orderBy("bin_epoch").collect()
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(false, true, true, false))
  }

  // ------------------------------------------------------------ Smooth

  test("Smooth.ewmaWeights: fix-point taps, underflow truncation") {
    val w = Smooth.ewmaWeights(0.5)
    assert(w.head == 100000000L && w(1) == 50000000L && w(2) == 25000000L)
    assert(w.last > 0 && w == w.sortBy(-_)) // decreasing, no zero tap
    assert(Smooth.ewmaWeightsSql(0.5).startsWith("VALUES (0, 100000000), (1, 50000000)"))
  }

  test("Smooth.ewma: hand-computed normalized smoother; warm-up is exact") {
    // α = 0.5, x = [2, 4, 6]: z₁ = 2 (self-normalized warm-up),
    // z₂ = (1e8·4e4 + 5e7·2e4)/1.5e8/1e4 = 10/3, z₃ = 8.5e12/1.75e8/1e4 = 34/7
    val df = Seq(("g", 1L, 2.0), ("g", 2L, 4.0), ("g", 3L, 6.0))
      .toDF("g", "t", "v")
    val out = Smooth.ewma(df, Seq("g"), col("t"), "t_out", col("v"),
        tieCols = Seq.empty, alpha = 0.5)
      .collect().map(r => r.getAs[Long]("idx") -> r).toMap
    assert(out(1L).getAs[Double]("ewma") == 2.0)
    assert(math.abs(out(2L).getAs[Double]("ewma") - 10.0 / 3) < 1e-9)
    assert(math.abs(out(3L).getAs[Double]("ewma") - 34.0 / 7) < 1e-9)
    assert(out(3L).getAs[Long]("t_out") == 3L && out(3L).getAs[Long]("v4") == 60000L)
  }

  test("Smooth.ewma: long series converge toward the level; nulls excluded") {
    val rows = (1 to 200).map(i => ("g", i.toLong, Some(10.0))) :+
      (("g", 201L, None: Option[Double]))
    val out = Smooth.ewma(rows.toDF("g", "t", "v"), Seq("g"), col("t"), "t_out",
        col("v"), tieCols = Seq.empty, alpha = 0.3)
      .collect()
    assert(out.length == 200) // the null row is excluded
    out.foreach(r => assert(r.getAs[Double]("ewma") == 10.0))
  }

  test("Smooth.ewma equality law: blocked form ≡ fan-out form, bit for bit") {
    // multi-group, irregular values, lengths straddling the K = 54 block
    // boundary (1, K−1, K, K+1, 3K+7), ties broken by a second column
    val rng = new scala.util.Random(7)
    val k = Smooth.ewmaWeights(0.3).length
    val rows = for {
      (g, n) <- Seq(("a", 1), ("b", k - 1), ("c", k), ("d", k + 1), ("e", 3 * k + 7))
      i <- 1 to n
    } yield (g, i.toLong / 3, i.toLong, math.floor(rng.nextDouble() * 2000 - 1000) / 10)
    val df = rows.toDF("g", "t", "tie", "v")
    val a = Smooth.ewma(df, Seq("g"), col("t"), "t_out", col("v"),
        tieCols = Seq("tie"), alpha = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val b = Smooth.ewmaFanout(df, Seq("g"), col("t"), "t_out", col("v"),
        tieCols = Seq("tie"), alpha = 0.3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(a.size == rows.size && a == b) // exact doubles: same longs, same divisions
  }

  // ----------------------------------------------------- mannKendallSen

  test("mannKendallSen: monotone ramps hit S = ±n(n−1)/2; Sen slope exact") {
    // bins 1..5, v = 10·bin: S = 10, Var = 5·4·15/18, z = 9/√(50/3);
    // every pairwise slope is exactly 10.
    val up = (1 to 5).map(i => ("up", i.toLong, i * 10.0))
    val down = (1 to 5).map(i => ("dn", i.toLong, 60.0 - i * 10.0))
    val one = Seq(("one", 1L, 5.0))
    val flat = (1 to 3).map(i => ("flat", i.toLong, 7.0))
    val df = (up ++ down ++ one ++ flat).toDF("g", "b", "v")
    val out = Trend.mannKendallSen(df, Seq("g"), col("b"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    val zExp = 9.0 / math.sqrt(50.0 / 3.0)
    assert(out("up")._1 == 5L && out("up")._2 == 10L)
    assert(math.abs(out("up")._3.get.asInstanceOf[Double] - zExp) < 1e-12)
    assert(out("up")._4.get.asInstanceOf[Double] == 10.0)
    assert(out("dn")._2 == -10L)
    assert(math.abs(out("dn")._3.get.asInstanceOf[Double] + zExp) < 1e-12)
    assert(out("dn")._4.get.asInstanceOf[Double] == -10.0)
    // single bin: no pairs → s = 0, z and sen NULL
    assert(out("one") == ((1L, 0L, None, None)))
    // all-tied values: Var numerator exactly 0 → z NULL, sen = 0
    assert(out("flat")._2 == 0L && out("flat")._3.isEmpty)
    assert(out("flat")._4.get.asInstanceOf[Double] == 0.0)
  }
}

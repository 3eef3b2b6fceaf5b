package graft

import org.apache.spark.sql.functions._
import graft.llm.Splits
import graft.operators.{Histogram, Profile}

/** Entropy profiling, equi-depth histograms, priority sampling. */
class ProfilingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("categoricalEntropy: uniform = log2(k) bits, constant = 0, null-safe") {
    val df = Seq(
      // g1: 4 values uniform → 2 bits, norm 1.0
      ("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "d"),
      // g2: all same → 0 bits, norm null
      ("g2", "x"), ("g2", "x"), ("g2", "x"),
      // g3: 3:1 mix → H = 2 - 0.75*log2(3) ≈ 0.8113
      ("g3", "p"), ("g3", "p"), ("g3", "p"), ("g3", "q"),
      // nulls are excluded from the distribution
      ("g2", null)
    ).toDF("g", "v")
    val got = Profile.categoricalEntropy(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
         if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got("g1")._1 == 4 && got("g1")._2 == 4)
    assert(math.abs(got("g1")._3 - 2.0) < 1e-12)
    assert(math.abs(got("g1")._4.get - 1.0) < 1e-12)
    assert(got("g2") == ((3L, 1L, 0.0, None)))
    val h3 = 2.0 - 0.75 * (math.log(3.0) / math.log(2.0))
    assert(math.abs(got("g3")._3 - h3) < 1e-12)
  }

  test("equiDepth: bucket sizes differ by at most one, boundaries nest") {
    val df = (1 to 103).map(i => ("t", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val h = Histogram.equiDepth(df, Seq("g"), "v", k = 8, tieBreak = col("id"))
      .orderBy("bucket").collect()
    assert(h.length == 8)
    val sizes = h.map(_.getLong(2))
    assert(sizes.sum == 103 && sizes.max - sizes.min <= 1)
    // ntile puts the remainder in the FIRST buckets: 103 = 7*13 + 12
    assert(sizes.take(7).forall(_ == 13L) && sizes.last == 12L)
    // buckets tile the sorted domain: each hi < next lo (distinct values)
    h.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) < b.getDouble(3))
    }
    assert(h.head.getDouble(3) == 1.0 && h.last.getDouble(4) == 103.0)
  }

  test("equiDepth: ties at boundaries split deterministically by tie-break") {
    val df = Seq.tabulate(10)(i => ("g", 5.0, i.toLong)).toDF("g", "v", "id")
    val a = Histogram.equiDepth(df, Seq("g"), "v", 3, col("id")).orderBy("bucket").collect()
    val b = Histogram.equiDepth(df.repartition(7), Seq("g"), "v", 3, col("id"))
      .orderBy("bucket").collect()
    assert(a.map(_.getLong(2)).sameElements(Array(4L, 3L, 3L)))
    assert(a.map(r => (r.getInt(1), r.getLong(2))).sameElements(
      b.map(r => (r.getInt(1), r.getLong(2)))))
  }

  test("prioritySample: fixed size per stratum, weight-biased, deterministic") {
    val rows = (1 to 400).map { i =>
      val stratum = if (i % 2 == 0) "s1" else "s2"
      // half the rows get 100x the weight of the other half
      val w = if (i % 4 < 2) 1000.0 else 10.0
      (i.toLong, stratum, w)
    }
    val df = rows.toDF("id", "s", "w")
    val got = Splits.prioritySample(df, "id", "w", "s", k = 20)
    val byStratum = got.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum == Map("s1" -> 20L, "s2" -> 20L))
    // heavy rows (100x weight) should dominate the sample
    val heavy = got.filter(col("w") === 1000.0).count()
    assert(heavy >= 30, s"only $heavy/40 sampled rows are heavy-weight")
    // deterministic under repartitioning
    val again = Splits.prioritySample(df.repartition(13), "id", "w", "s", k = 20)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("foldColumn: group-cohesive, deterministic, near-balanced, k guard") {
    val rows = (1 to 2000).map(i => (i.toLong % 500, i.toLong)) // 500 users, 4 rows each
    val df = rows.toDF("user_id", "event_id")
    val folded = df.withColumn("fold", Splits.foldColumn(col("user_id"), 5))
    // cohesion: every user maps to exactly one fold
    val perUser = folded.groupBy("user_id")
      .agg(countDistinct("fold").as("nf")).agg(max("nf")).head.getLong(0)
    assert(perUser == 1L)
    // determinism under repartitioning
    val a = folded.select("user_id", "fold").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = df.repartition(13).withColumn("fold", Splits.foldColumn(col("user_id"), 5))
      .select("user_id", "fold").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // near-balance: 500 users over 5 folds → each fold well-populated
    val sizes = folded.groupBy("fold").agg(countDistinct("user_id").as("u"))
      .collect().map(_.getLong(1))
    assert(sizes.length == 5 && sizes.sum == 500 && sizes.min > 50)
    intercept[IllegalArgumentException] { Splits.foldColumn(col("user_id"), 1) }
  }

  test("prioritySample: non-positive weights excluded, k guard") {
    val df = Seq((1L, "s", 5.0), (2L, "s", 0.0), (3L, "s", -1.0)).toDF("id", "s", "w")
    val got = Splits.prioritySample(df, "id", "w", "s", k = 10).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      Splits.prioritySample(df, "id", "w", "s", k = 0)
    }
  }

  test("benford: true first significant digit at ANY magnitude; " +
      "zero/negative/null/non-finite excluded") {
    // values spanning the full double range: the exact-power ladder must
    // recover the true FSD well below the old 1e-3 restriction (1e-6 → 1,
    // 0.00004 → 4), at huge magnitudes (2.5e300 → 2), and down in the
    // subnormal range (9e-310 → 8|9: the stored double is 9.00000…e-310
    // up to subnormal quantization — assert what the double truly is)
    val df = Seq(Some(1.0), Some(2.5), Some(19.0), Some(0.05), Some(0.0),
        Some(-7.0), Some(0.00004), Some(1e-6), Some(6.4e-7), Some(2.5e300),
        Some(7.7e22), Some(Double.PositiveInfinity), Some(Double.NaN), None)
      .map(v => ("g", v)).toDF("g", "v")
    val out = Profile.benford(df, Seq("g"), col("v"))
      .collect().map(r => r.getAs[Int]("digit") -> r).toMap
    // digits: 1(1.0), 2(2.5), 1(19.0), 5(0.05), 4(0.00004), 1(1e-6),
    // 6(6.4e-7), 2(2.5e300), 7(7.7e22) — 9 finite positive rows
    assert(out.keySet == Set(1, 2, 4, 5, 6, 7))
    assert(out.values.forall(_.getAs[Long]("n") == 9L))
    assert(out(1).getAs[Long]("n_d") == 3L) // 1.0, 19.0, 1e-6
    assert(out(2).getAs[Long]("n_d") == 2L) // 2.5, 2.5e300
    assert(out(7).getAs[Long]("n_d") == 1L) // 7.7e22
    assert(math.abs(out(1).getAs[Double]("expected") - math.log10(2.0)) < 1e-12)
    assert(math.abs(out(5).getAs[Double]("dev") -
      (1.0 / 9 - math.log10(1.2))) < 1e-12)
    // subnormal: the ladder reaches the bottom of the double range
    val sub = Profile.benford(Seq(("g", 9e-310)).toDF("g", "v"),
      Seq("g"), col("v")).collect()
    assert(sub.length == 1 && Set(8, 9).contains(sub(0).getAs[Int]("digit")))
  }

  // ------------------------------------------------- abcClassification

  test("abcClassification: exact threshold boundaries; ties rank by key") {
    // values a=50, b=30, c=15, d=5 (total 100): cum 50, 80, 95, 100 →
    // a,b are A (cum·100 ≤ 80·total INCLUSIVE at 80), c is B (≤ 95),
    // d is C — the boundary keys land on the lower class by the exact
    // integer compare.
    val df = Seq(("g", "a", 50.0), ("g", "b", 30.0), ("g", "c", 15.0),
      ("g", "d", 5.0)).toDF("g", "k", "v")
    val out = Profile.abcClassification(df, Seq("g"), col("k"), col("v"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(4), r.getString(6))).toMap
    assert(out("a") == ((1L, 500000L, "A")))
    assert(out("b") == ((2L, 800000L, "A")))
    assert(out("c") == ((3L, 950000L, "B")))
    assert(out("d") == ((4L, 1000000L, "C")))

    // equal values: deterministic rank by key ascending
    val tie = Seq(("g", "z", 1.0), ("g", "y", 1.0)).toDF("g", "k", "v")
    val ranks = Profile.abcClassification(tie, Seq("g"), col("k"), col("v"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(ranks("y") == 1L && ranks("z") == 2L)
  }

  // --------------------------------------------------------- fkAudit

  test("fkAudit: orphans counted by rows and distinct keys; NULL FKs separate") {
    val child = Seq[(java.lang.Long, String)]((1L, "x"), (2L, "x"), (3L, "x"),
      (null, "x"), (3L, "x")).toDF("fk", "pad").select(col("fk"))
    val parent = Seq((1L, "p"), (2L, "q")).toDF("pk", "name")
    val Array(r) = Profile.fkAudit(child, parent, Seq("fk" -> "pk")).collect()
    assert(r.getLong(0) == 5L) // n_child
    assert(r.getLong(1) == 1L) // n_null_key
    assert(r.getLong(2) == 2L) // two rows with fk = 3
    assert(r.getLong(3) == 1L) // one distinct missing key
    assert(r.getDouble(4) == 0.5) // 2 of 4 non-null rows
  }

  test("fkAudit: composite keys match componentwise") {
    val child = Seq((1L, "a"), (1L, "b")).toDF("k1", "k2")
    val parent = Seq((1L, "a")).toDF("p1", "p2")
    val Array(r) = Profile.fkAudit(child, parent,
      Seq("k1" -> "p1", "k2" -> "p2")).collect()
    assert(r.getLong(0) == 2L && r.getLong(2) == 1L)
    assert(r.getDouble(4) == 0.5)
  }

  // ---------------------------------------------------- fdViolations

  test("fdViolations: violation mass, NULL-as-value, and a holding FD") {
    val df = Seq[(String, String, String)](
      // k1 → {v1, v2} over 3 rows: one violating determinant
      ("bad", "k1", "v1"), ("bad", "k1", "v2"), ("bad", "k1", "v1"),
      ("bad", "k2", "v1"),
      // NULL is a dependent VALUE: k disagrees between NULL and 'x'
      ("nul", "k", null), ("nul", "k", "x"),
      // clean: every determinant maps to one value
      ("ok", "a", "1"), ("ok", "a", "1"), ("ok", "b", "2")
    ).toDF("g", "l", "r")
    val out = Profile.fdViolations(df, Seq("g"), col("l"), col("r"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getBoolean(6))).toMap
    assert(out("bad") == ((4L, 2L, 1L, 3L, 2L, false)))
    assert(out("nul") == ((2L, 1L, 1L, 2L, 2L, false)))
    assert(out("ok") == ((3L, 2L, 0L, 0L, 1L, true)))
  }
}

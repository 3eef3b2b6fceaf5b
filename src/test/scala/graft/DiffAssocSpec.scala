package graft

import org.apache.spark.sql.functions._
import graft.operators.{Association, Diff}

/** Snapshot diff and categorical-association operators. */
class DiffAssocSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: added/removed/changed classified, unchanged dropped") {
    val oldV = Seq(
      (1L, 100L, "A"), (2L, 200L, "B"), (3L, 300L, "C"), (4L, 400L, "D")
    ).toDF("k", "cents", "st")
    val newV = Seq(
      (1L, 100L, "A"),  // unchanged
      (2L, 201L, "B"),  // changed value
      (3L, 300L, "X"),  // changed status
      (5L, 500L, "E")   // added; 4 removed
    ).toDF("k", "cents", "st")
    val got = Diff.snapshotDiff(oldV, newV, Seq("k"), Seq("cents", "st"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.isNullAt(2), r.isNullAt(3))).toMap
    assert(got.keySet == Set(2L, 3L, 4L, 5L))
    assert(got(2L) == (("changed", false, false)))
    assert(got(3L) == (("changed", false, false)))
    assert(got(4L) == (("removed", false, true)))
    assert(got(5L) == (("added", true, false)))
  }

  test("snapshotDiff: identical snapshots diff to empty, any partitioning") {
    val v = (1 to 500).map(i => (i.toLong, i * 10L, s"s$i")).toDF("k", "cents", "st")
    assert(Diff.snapshotDiff(v, v.repartition(13), Seq("k"), Seq("cents", "st")).count() == 0)
  }

  test("snapshotDiff: composite keys supported") {
    val oldV = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val newV = Seq((1L, "x", 11L), (1L, "y", 20L)).toDF("k1", "k2", "v")
    val got = Diff.snapshotDiff(oldV, newV, Seq("k1", "k2"), Seq("v")).collect()
    assert(got.length == 1 && got(0).getString(1) == "x" && got(0).getString(2) == "changed")
  }

  test("association: independent columns give chi2 ~ 0, MI ~ 0") {
    // perfectly independent 2x2 design, balanced
    val rows = for (a <- Seq("a1", "a2"); b <- Seq("b1", "b2"); _ <- 1 to 25)
      yield (a, b)
    val r = Association.categoricalAssociation(rows.toDF("x", "y"), "x", "y").head
    assert(r.getLong(0) == 100 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getLong(3) == 1) // dof
    assert(math.abs(r.getDouble(4)) < 1e-9) // chi2
    assert(math.abs(r.getDouble(5)) < 1e-9) // V
    assert(math.abs(r.getDouble(6)) < 1e-9) // MI
  }

  test("association: perfectly dependent columns give V = 1, MI = H") {
    // y is a function of x, both uniform over 2 levels → V=1, MI=1 bit
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(30)(("a2", "b2"))
    val r = Association.categoricalAssociation(rows.toDF("x", "y"), "x", "y").head
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12, s"V=${r.getDouble(5)}")
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12, s"MI=${r.getDouble(6)}")
    // chi2 = n * V^2 * min(dof sides) = 60
    assert(math.abs(r.getDouble(4) - 60.0) < 1e-9)
  }

  test("association: hand-computed 2x2 with skew; nulls excluded") {
    // cells: (a1,b1)=30 (a1,b2)=10 (a2,b1)=10 (a2,b2)=50
    val rows = Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(50)(("a2", "b2")) ++
      Seq((null, "b1"), ("a1", null))
    val r = Association.categoricalAssociation(rows.toDF("x", "y"), "x", "y").head
    assert(r.getLong(0) == 100)
    val e11 = 40.0 * 40 / 100; val e12 = 40.0 * 60 / 100
    val e21 = 60.0 * 40 / 100; val e22 = 60.0 * 60 / 100
    val chi2 = math.pow(30 - e11, 2) / e11 + math.pow(10 - e12, 2) / e12 +
      math.pow(10 - e21, 2) / e21 + math.pow(50 - e22, 2) / e22
    assert(math.abs(r.getDouble(4) - chi2) < 1e-9)
    def l2(x: Double) = math.log(x) / math.log(2.0)
    val mi = 0.30 * l2(30.0 * 100 / (40 * 40)) + 0.10 * l2(10.0 * 100 / (40 * 60)) +
      0.10 * l2(10.0 * 100 / (60 * 40)) + 0.50 * l2(50.0 * 100 / (60 * 60))
    assert(math.abs(r.getDouble(6) - mi) < 1e-9)
  }
}

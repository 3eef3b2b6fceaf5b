package graft

import org.apache.spark.sql.functions._
import graft.llm.{CountMin, FeatureHash}

/** Hash-sketch operators: count–min frequency estimation and the
  * hashing-trick vectorizer. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("count-min: estimates always >= exact, exact when collision-free") {
    val items = Seq.tabulate(500)(i => s"tok${i % 20}").toDF("tok")
    val sk = CountMin.sketch(items, "tok", depth = 4, width = 1024)
    val probes = items.distinct()
    val est = CountMin.estimate(sk, probes, "tok", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t: est ${est(t)} < exact $n (CMS must overestimate)")
    }
    // 20 distinct tokens into 4x1024 cells: collisions are possible but the
    // MIN over 4 independent rows almost surely dodges them — require most
    // probes exact so a broken bucket/min would fail loudly.
    val exactHits = exact.count { case (t, n) => est(t) == n }
    assert(exactHits >= 18, s"only $exactHits/20 estimates exact")
  }

  test("count-min: sketch never exceeds depth x width cells and merges by sum") {
    val a = Seq("x", "y", "x").toDF("tok")
    val b = Seq("x", "z").toDF("tok")
    val skA = CountMin.sketch(a, "tok", depth = 2, width = 8)
    val skB = CountMin.sketch(b, "tok", depth = 2, width = 8)
    assert(skA.count() <= 16 && skB.count() <= 16)
    // merge = union + cell-wise sum ≡ sketch of the union
    val merged = skA.union(skB).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = CountMin.sketch(a.union(b), "tok", depth = 2, width = 8)
    val m = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d = direct.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == d)
  }

  test("count-min: unseen probe estimates 0 via the left-join coalesce") {
    val sk = CountMin.sketch(Seq("a").toDF("tok"), "tok", depth = 3, width = 4096)
    val est = CountMin.estimate(sk, Seq("never-seen-token-xyz").toDF("tok"),
        "tok", depth = 3, width = 4096)
      .collect()
    // width 4096 with 1 filled cell per row: the probe's 3 cells are almost
    // surely empty → min(coalesce(cnt,0)) = 0.
    assert(est.length == 1 && est(0).getLong(1) == 0L)
  }

  test("feature hashing: deterministic, bucket-bounded, sign-cancelling sums") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq("a")),
      (3L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    val v = FeatureHash.vectorize(docs, "doc_id", "toks", numBuckets = 16)
    val rows = v.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.keys.forall { case (_, b) => b >= 0 && b < 16 })
    assert(!rows.keys.exists(_._1 == 3L)) // empty doc → no cells
    // same token in two docs lands in the same slot with the same sign
    val aBucket = spark.range(1).select(FeatureHash.bucketOf(lit("a"), 16)).head.getLong(0)
    val aSign = spark.range(1).select(FeatureHash.signOf(lit("a"))).head.getInt(0)
    assert(rows.contains((2L, aBucket)) && rows((2L, aBucket)) == aSign.toLong)
    // doc 1 has 'a' twice → contribution 2*sign at a's bucket (unless b/c collide there)
    val others = Seq("b", "c").map(t =>
      spark.range(1).select(FeatureHash.bucketOf(lit(t), 16),
        FeatureHash.signOf(lit(t))).head).map(r => (r.getLong(0), r.getInt(1)))
    val expectA = 2L * aSign + others.filter(_._1 == aBucket).map(_._2.toLong).sum
    if (expectA == 0L) assert(!rows.contains((1L, aBucket)))
    else assert(rows((1L, aBucket)) == expectA)
  }

  test("feature hashing: exact cancellation rows are dropped as zeros") {
    // find two tokens that share a bucket with opposite signs, then verify
    // a doc holding exactly that pair vanishes from the sparse output
    val cand = (0 until 200).map(i => s"t$i")
    val meta = cand.map { t =>
      val r = spark.range(1).select(FeatureHash.bucketOf(lit(t), 4),
        FeatureHash.signOf(lit(t))).head
      (t, r.getLong(0), r.getInt(1))
    }
    val pair = (for {
      (t1, b1, s1) <- meta; (t2, b2, s2) <- meta
      if t1 < t2 && b1 == b2 && s1 == -s2
    } yield (t1, t2)).head
    val v = FeatureHash.vectorize(
      Seq((1L, Seq(pair._1, pair._2))).toDF("doc_id", "toks"),
      "doc_id", "toks", numBuckets = 4)
    assert(v.count() == 0)
  }
}

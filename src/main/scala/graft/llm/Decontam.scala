package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram overlap decontamination — the inverted-index companion to
  * [[MinHashLsh.crossNearDupPairs]].
  *
  * Sketch-based (MinHash) decontamination measures symmetric Jaccard, which
  * goes to ZERO when a short benchmark item is quoted inside a long
  * training document — exactly the leak that matters most. The standard
  * fix (the published GPT-3/PaLM recipe) is exact long-n-gram collision:
  * explode both corpora into distinct word n-grams, equi-join on the
  * n-gram, and score each (train, benchmark) pair by CONTAINMENT —
  * shared n-grams over the benchmark item's n-gram count — an asymmetric
  * measure that is 1.0 for a verbatim quote regardless of the host
  * document's length.
  *
  * Scale shape: the explode is pipelined (never materialized per doc); the
  * join is a plain equi-join on `md5(n-gram)` — 16-byte keys on the wire
  * instead of raw n-gram strings — and long n (8 words here, 13 in the
  * GPT-3 recipe) makes collisions between unrelated documents vanishingly
  * rare, so join output ≈ true leaks, not |A|×|B|. The residual risk is
  * boilerplate n-grams (licence headers, templates) fanning out hot keys;
  * `maxTrainDf` drops n-grams seen in more than that many training docs
  * before the join — the published pipelines apply the same cap, because a
  * million-document n-gram is boilerplate, not leakage.
  */
object Decontam {

  /** Distinct word n-grams of `textCol`, exploded to one row per n-gram,
    * keyed by md5. Documents shorter than `n` words contribute nothing.
    */
  private def grams(df: DataFrame, idCol: String, outId: String,
      textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as(outId),
        explode(array_distinct(
          graft.functions.TextExprs.wordShingles(col(textCol), n))).as("g"))
      .select(col(outId), md5(col("g")).as("gid"))

  /** (train, benchmark) pairs sharing at least one exact word n-gram, with
    * `n_shared` (distinct shared n-grams) and `containment` =
    * n_shared / |benchmark n-gram set| ∈ (0, 1].
    *
    * `maxTrainDf`: when set, n-grams occurring in more than this many
    * TRAINING documents are dropped before the join (boilerplate guard +
    * hot-key skew guard in one). The benchmark side is never filtered, and
    * `containment` keeps its full denominator, so capping only ever
    * LOWERS a pair's score — a flagged pair is always a real overlap.
    */
  def exactNgramOverlap(
      train: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8,
      minContainment: Double = 0.0,
      maxTrainDf: Option[Long] = None): DataFrame = {
    val tg0 = grams(train, idCol, "a", textCol, n)
    val tg = maxTrainDf.fold(tg0) { cap =>
      val hot = tg0.groupBy("gid").agg(count(lit(1)).as("tdf"))
        .filter(col("tdf") > cap).select("gid")
      tg0.join(hot, Seq("gid"), "left_anti")
    }
    val bg = grams(benchmark, idCol, "b", textCol, n)
    val bsize = bg.groupBy(col("b")).agg(count(lit(1)).as("b_grams"))
    tg.join(bg, "gid")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(bsize, "b")
      .withColumn("containment", col("n_shared") * lit(1.0) / col("b_grams"))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"), col("n_shared"), col("b_grams"), col("containment"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — confidence intervals for a mean at
  * data-parallel scale, with zero RNG state.
  *
  * The classic bootstrap resamples n rows WITH replacement B times, which
  * is a per-replicate global shuffle no distributed engine should pay. The
  * Poisson bootstrap (the standard large-scale substitute: each row enters
  * replicate b with weight ~ Poisson(1), since Binomial(n, 1/n) → Poisson(1))
  * makes every row's contribution to every replicate INDEPENDENT — one
  * pass, B counters, no sampling coordination.
  *
  * Determinism (the repo's seeded-sample convention, [[graft.llm.Splits]]):
  * the weight for (row, replicate) reads the first 8 hex digits of
  * `md5(salt|id#b)` as a uniform position h on the 2³² keyspace and
  * inverts the Poisson(1) CDF via PRE-COMPUTED INTEGER cutoffs
  * `c_k = ⌊P(X≤k)·2³²⌋` — a pure integer CASE ladder, identical in Spark
  * and the SQL twin, no per-engine RNG or float thresholds. Weights cap at
  * 8 (P(X>8) ≈ 10⁻⁶; the tail mass folds into w=8, standard truncation).
  *
  * Replicate means are exact-integer quotients (Σw·v4 / Σw at the catalog's
  * scale-4 fix-point); the CI picks ORDER STATISTICS of the m non-empty
  * replicate means: rank ⌊α/2·m⌋+1 from each end (empty replicates — all
  * weights 0, possible only for tiny groups — are dropped from the rank
  * frame on both engines).
  *
  * Scale: the replicate explode multiplies rows ×B before the aggregate,
  * but map-side partial aggregation reduces the SHUFFLE to groups×B rows
  * (answer-sized); the ×B CPU is embarrassingly parallel. The rank window
  * runs over the groups×B frame only. No collect, no RNG, no row resample.
  */
object Bootstrap {

  /** `c_k = ⌊P(Poisson(1) ≤ k)·2³²⌋` for k = 0 … maxW−1 — computed once
    * here (double accumulation of e⁻¹/k!, exact to well past 2⁻³²) and
    * interpolated as INTEGER literals into both engines' expressions.
    */
  private[graft] def cutoffs(maxW: Int): Seq[Long] = {
    require(maxW >= 1 && maxW <= 16, s"maxW out of range: $maxW")
    val terms = Iterator.iterate((math.exp(-1.0), 0)) { case (t, k) =>
      (t / (k + 1), k + 1)
    }.map(_._1).take(maxW).toSeq
    terms.scanLeft(0.0)(_ + _).tail
      .map(p => math.floor(p * 4294967296.0).toLong)
  }

  /** The integer CASE ladder over a 32-bit uniform draw `h`. Callers on a
    * hot path must pass an ATTRIBUTE (a projected column), not an
    * expression tree: the nested CaseWhen references `h` once per rung
    * (up to `maxW` times, ~2 expected under Poisson(1) exit probabilities)
    * and conditional branches are outside codegen subexpression
    * elimination, so a non-trivial `h` is re-evaluated per rung — the
    * q152 md5 chain was measured running ~2× per row this way (r15).
    */
  private[graft] def weightLadder(h: Column, maxW: Int = 8): Column =
    cutoffs(maxW).zipWithIndex.foldRight(lit(maxW): Column) {
      case ((c, k), tail) => when(h < c, k).otherwise(tail)
    }.cast("int")

  /** The 32-bit uniform draw for (key, replicate): first 8 hex digits of
    * `md5(salt|key#rep)` as a long.
    */
  private[graft] def uniformDraw(key: Column, rep: Column,
      salt: String = "boot"): Column =
    conv(substring(
      md5(concat(lit(s"$salt|"), key.cast("string"), lit("#"),
        rep.cast("string"))), 1, 8), 16, 10).cast("long")

  /** Poisson(1) weight for (key, replicate) as a Column: the integer CASE
    * ladder over the 32-bit md5 prefix. `rep` must be a non-negative int
    * column; `key` any expression unique per row (duplicate keys get
    * correlated weights — pass the row's primary key).
    *
    * Single-Column convenience form — the md5 draw is embedded in every
    * ladder rung, so it can evaluate up to `maxW` times per row. Fine for
    * tests and one-off probes; [[meanCI]] projects the draw once and
    * ladders over the attribute instead.
    */
  def poissonWeight(key: Column, rep: Column, salt: String = "boot",
      maxW: Int = 8): Column =
    weightLadder(uniformDraw(key, rep, salt), maxW)

  private def sqlLit(s: String): String = s.replace("'", "''")

  /** SQL twin of [[poissonWeight]] for cross-engine oracles (DuckDB). */
  def poissonWeightSql(keyExprSql: String, repExprSql: String,
      salt: String = "boot", maxW: Int = 8): String = {
    val h = s"CAST(('0x' || substr(md5('${sqlLit(salt)}|' || " +
      s"CAST($keyExprSql AS VARCHAR) || '#' || " +
      s"CAST($repExprSql AS VARCHAR)), 1, 8)) AS BIGINT)"
    val ladder = cutoffs(maxW).zipWithIndex
      .map { case (c, k) => s"WHEN $h < $c THEN $k" }
      .mkString(" ")
    s"(CASE $ladder ELSE $maxW END)"
  }

  /** Per-group mean with a Poisson-bootstrap percentile CI.
    *
    * @param idCol   row-unique key column (drives the hash draws)
    * @param reps    number of bootstrap replicates B
    * @param alpha   two-sided miss probability (0.05 → 95% CI)
    * @return per group: (groupCols…, n, mean, m_reps, lo, hi) — mean the
    *         exact full-sample mean, [lo, hi] the ⌊α/2·m⌋+1-th order
    *         statistics of the m non-empty replicate means, all in
    *         original units
    */
  def meanCI(
      df: DataFrame, groupCols: Seq[String], valueCol: Column, idCol: Column,
      reps: Int = 200, alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(reps >= 2, s"need at least 2 replicates, got $reps")
    require(alpha > 0 && alpha < 1, s"alpha out of range: $alpha")
    val g = groupCols.map(col)
    // the draw's per-row prefix `salt|id#` is computed ONCE before the
    // ×reps explode (the generate replicates the built string; only the
    // replicate suffix varies per output row) — r15
    val base = df.filter(valueCol.isNotNull)
      .select(g ++ Seq(
        floor(valueCol.cast("double") * 10000 + 0.5).cast("long").as("__v4"),
        concat(lit(s"$salt|"), idCol.cast("string"), lit("#")).as("__pfx")): _*)
    // the md5 draw is PROJECTED before the ladder so it evaluates exactly
    // once per (row, replicate): the ladder's nested CaseWhen references
    // its input once per rung, and conditional branches are outside
    // codegen subexpression elimination — laddering over the raw md5
    // expression was measured re-running the digest ~2× per row (r15).
    // CollapseProject keeps the two projections apart (it refuses to
    // duplicate non-cheap expressions), so the plan carries md5 once.
    val reped = base
      .withColumn("__b", explode(sequence(lit(0), lit(reps - 1))))
      .select(g ++ Seq(col("__v4"), col("__b"),
        conv(substring(md5(concat(col("__pfx"), col("__b").cast("string"))),
          1, 8), 16, 10).cast("long").as("__hd")): _*)
      .withColumn("__w", weightLadder(col("__hd")))
    val perRep = reped.groupBy(g :+ col("__b"): _*)
      .agg(sum(col("__w").cast("long") * col("__v4")).as("__swv"),
        sum(col("__w").cast("long")).as("__sw"))
      .filter(col("__sw") > 0)
      .withColumn("__mb",
        col("__swv").cast("double") / col("__sw").cast("double") / 10000.0)
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__mb").asc, col("__b").asc)
    val wAll = Window.partitionBy(g: _*)
    val ranked = perRep
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__rlo", floor(lit(alpha / 2) * col("__m")).cast("long") + 1)
    val ci = ranked.groupBy(g: _*)
      .agg(
        max(col("__m")).as("m_reps"),
        max(when(col("__rk") === col("__rlo"), col("__mb"))).as("lo"),
        max(when(col("__rk") === col("__m") - col("__rlo") + 1, col("__mb")))
          .as("hi"))
    val full = base.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__v4")).as("__t4"))
      .withColumn("mean",
        col("__t4").cast("double") / col("n").cast("double") / 10000.0)
    val cond = groupCols.map(c => col(c) <=> col(s"__c_$c")).reduce(_ && _)
    full.join(
        broadcast(ci.select(groupCols.map(c => col(c).as(s"__c_$c")) ++
          Seq(col("m_reps"), col("lo"), col("hi")): _*)),
        cond, "left")
      .select(g ++ Seq(col("n"), col("mean"), col("m_reps"),
        col("lo"), col("hi")): _*)
  }
}

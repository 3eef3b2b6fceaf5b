package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, group-leakage-safe train/val/test splitting.
  *
  * Training pipelines must split so that every row of the same GROUP (user,
  * document family, session) lands in the same split — row-level random
  * splits leak near-duplicate rows of one entity across train and eval. The
  * assignment here is a pure function of the group key: the first 8 hex
  * digits of `md5(key)` read as a uniform draw on the keyspace, compared
  * against cumulative-fraction thresholds rendered as hex strings.
  * Lowercase-hex string comparison is numeric comparison, and md5 is
  * identical in every engine — so the split is reproducible across runs,
  * engines, partitionings, and cluster sizes, with zero RNG state and zero
  * shuffle (a scan-time projection).
  *
  * The reference's pipeline has no split step (its serving layer consumes
  * everything); this is part of the training-data surface the engine adds.
  */
object Splits {

  /** Hex threshold for cumulative fraction f: floor(f · 16⁸) as 8 lowercase
    * hex digits — `md5hex.substring(0, 8) < threshold` selects exactly the
    * first f of the (uniform) md5 keyspace. f = 1.0 returns the sentinel
    * `"g"`, which sorts after every 8-hex-digit string ('g' > 'f'), so
    * "keep everything" really keeps EVERYTHING — a clamped "ffffffff" with
    * strict `<` would drop the ~2⁻³² of keys whose md5 prefix is exactly
    * ffffffff.
    */
  private[graft] def hexThreshold(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction bound $f outside [0,1]")
    if (f >= 1.0) "g"
    else f"${(f * 4294967296.0).toLong}%08x"
  }

  /** Single-quote doubling for values interpolated into oracle SQL literals
    * (stratum names, salts) — oracle-only surface, but it is public API and
    * a quoted stratum must not break (or inject into) the rendered SQL.
    */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** SQL CASE twin of [[splitColumn]] for cross-engine oracles. */
  def splitCaseSql(keyExprSql: String, fractions: Seq[(String, Double)]): String = {
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val whens = fractions.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN substr(md5(CAST($keyExprSql AS VARCHAR)), 1, 8) < '${hexThreshold(cum)}' THEN '${sqlLit(name)}'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${sqlLit(fractions.last._1)}' END"
  }

  /** Split-name column for `key`, e.g.
    * `fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`.
    * Fractions must sum to 1 (±1e-9); boundaries are exact keyspace
    * fractions, so realized proportions converge on the fractions as the
    * number of distinct keys grows.
    */
  def splitColumn(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(fractions.forall(_._2 >= 0), "fractions must be non-negative")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val bucket = substring(md5(key.cast("string")), 1, 8)
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.init.zip(cums.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), cum)) =>
        val cond = bucket < lit(hexThreshold(cum))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(fractions.head._1))(_.otherwise(fractions.last._1))
  }

  /** `df` plus a `split` column assigned group-cohesively by `keyCol`. */
  def byGroup(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), fractions))

  /** Deterministic stratified sampling: keep each row with a per-stratum
    * rate, decided by the same md5-threshold draw as [[splitColumn]] —
    * `md5(salt|key)` read as a uniform keyspace position, kept when below
    * the stratum's rate threshold. The mixture-weighting step of corpus
    * assembly ("50% en, 30% fr, …") as a pure scan-time filter: zero RNG
    * state, zero shuffle, reproducible across engines/partitionings/rounds,
    * and SUBSET-MONOTONE in the rate — raising a stratum's rate strictly
    * grows its sample (the property that makes incremental corpus scale-ups
    * supersets of earlier ones, so ablations stay comparable). `salt`
    * decorrelates this draw from any other hash-based decision on the same
    * key (e.g. train/val/test splits).
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double,
      salt: String = "smp"): DataFrame = {
    require(rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 },
      "rates must be in [0,1]")
    val bucket = substring(md5(concat(lit(s"$salt|"), col(keyCol).cast("string"))), 1, 8)
    val threshold = rates.foldLeft(Option.empty[Column]) {
      case (acc, (stratum, rate)) =>
        Some(acc.fold(when(col(strataCol) === stratum, hexThreshold(rate)))(
          _.when(col(strataCol) === stratum, hexThreshold(rate))))
    }.fold(lit(hexThreshold(defaultRate)))(_.otherwise(hexThreshold(defaultRate)))
    df.filter(bucket < threshold)
  }

  /** Fixed-SIZE deterministic sample: the k rows of each stratum with the
    * smallest `md5(salt|key)` — the bottom-k-sketch complement to
    * [[stratifiedSample]]'s fixed-RATE filter. Bottom-k on a uniform hash
    * is a uniform sample without replacement, is MERGEABLE (the bottom-k
    * of a union is the bottom-k of the parts — how distributed execution
    * computes it: per-partition top-k under the ranking window's partial
    * sort, then merge per stratum), and is stable under corpus growth in
    * the weak sense that a row only leaves the sample when a smaller-hash
    * row arrives. One hash shuffle by stratum; no global sort, no RNG.
    * Ties are impossible (md5 of distinct keys), so the sample is exact
    * and engine-identical.
    */
  def bottomK(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      k: Int,
      salt: String = "smp"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(!df.columns.contains("__rk"),
      "bottomK input already has a __rk column — rename it first " +
        "(the internal rank would silently clobber it)")
    val bucket = md5(concat(lit(s"$salt|"), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(bucket, col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** SQL WHERE-clause twin of [[stratifiedSample]] for cross-engine
    * oracles. */
  def stratifiedSampleSql(
      keyExprSql: String,
      strataColSql: String,
      rates: Seq[(String, Double)],
      defaultRate: Double,
      salt: String = "smp"): String = {
    val whens = rates.map { case (stratum, rate) =>
      s"WHEN '${sqlLit(stratum)}' THEN '${hexThreshold(rate)}'"
    }.mkString(" ")
    s"substr(md5('${sqlLit(salt)}|' || CAST($keyExprSql AS VARCHAR)), 1, 8) < " +
      s"(CASE $strataColSql $whens ELSE '${hexThreshold(defaultRate)}' END)"
  }

  /** WEIGHTED sampling without replacement — priority sampling (Duffield,
    * Lund & Thorup 2007): each row gets priority `w / u` with `u` a
    * deterministic uniform draw on (0, 1], and the k highest-priority rows
    * per stratum are the sample — inclusion probability ∝ weight (in the
    * w/τ-threshold sense), the "sample documents proportional to length /
    * quality score" primitive of corpus assembly. Complements
    * [[stratifiedSample]] (uniform rate) and [[bottomK]] (uniform size):
    * this one is size-fixed AND weight-biased.
    *
    * Priority sampling is chosen over Efraimidis–Spirakis (`u^(1/w)` keys)
    * deliberately: its key needs only one IEEE DIVISION — correctly
    * rounded, hence bit-identical in every engine — where E–S needs
    * `pow`/`ln`, whose last-ulp behavior is libm-specific. Same estimator
    * quality class; engine-portable determinism for free.
    *
    * `u = (h + 1) / 2³²` with `h` the first 8 hex digits of
    * `md5(salt|key)` — the exact dyadic rational is representable, the
    * division correctly rounded, zero RNG state (the [[splitColumn]]
    * keyspace convention). Ties are impossible (md5 of distinct keys), so
    * top-k per stratum (rank window with the key as final tie-break) is
    * exact and mergeable: per-partition partial top-k under the window's
    * partial sort, then merge — never a global sort.
    */
  def prioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      strataCol: String,
      k: Int,
      salt: String = "pri"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(!df.columns.contains("__prk"),
      "prioritySample input already has a __prk column — rename it first")
    val pri = priorityColumn(col(keyCol), col(weightCol), salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(pri.desc, col(keyCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__prk", row_number().over(w))
      .filter(col("__prk") <= k)
      .drop("__prk")
  }

  /** The priority expression `w / ((h+1)/2³²)` of [[prioritySample]]. */
  def priorityColumn(key: Column, weight: Column, salt: String = "pri"): Column =
    weight.cast("double") /
      ((conv(substring(md5(concat(lit(s"$salt|"), key.cast("string"))), 1, 8),
        16, 10).cast("double") + 1.0) / 4294967296.0)

  /** SQL twin of [[priorityColumn]] for cross-engine oracles (DuckDB). */
  def prioritySql(keyExprSql: String, weightExprSql: String,
      salt: String = "pri"): String =
    s"CAST($weightExprSql AS DOUBLE) / " +
      s"((CAST(('0x' || substr(md5('${sqlLit(salt)}|' || CAST($keyExprSql AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0) / 4294967296.0)"

  /** K-fold cross-validation assignment, group-cohesive like
    * [[splitColumn]]: fold = md5-keyspace draw mod k — every row of a
    * group lands in one fold, folds are near-equal in EXPECTATION over
    * groups (exactly the property CV needs: the unit of independence is
    * the group, so per-group assignment is what prevents leakage across
    * folds), zero RNG state, scan-time projection, engine-identical. The
    * modulo is over the full 8-hex-digit draw, whose range 2³² is not a
    * multiple of k — the resulting bias is ≤ k/2³² per fold, orders below
    * any statistical noise floor.
    */
  def foldColumn(key: Column, k: Int, salt: String = "cv"): Column = {
    require(k >= 2, s"need at least 2 folds, got $k")
    conv(substring(md5(concat(lit(s"$salt|"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % k
  }

  /** SQL twin of [[foldColumn]] for cross-engine oracles (DuckDB). */
  def foldSql(keyExprSql: String, k: Int, salt: String = "cv"): String =
    s"CAST(('0x' || substr(md5('${sqlLit(salt)}|' || CAST($keyExprSql AS VARCHAR)), 1, 8)) AS BIGINT) % $k"
}

package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier, trained and scored entirely as
  * DataFrame plans — the fastText-shaped "cheap linear classifier" slot of
  * corpus pipelines (language ID, quality filtering, domain routing),
  * minus the embedding layer: the MODEL IS A TABLE, training is two hash
  * aggregates, scoring is an equi-join.
  *
  * Semantics: standard multinomial NB with add-one (Laplace) smoothing.
  * With training vocabulary size V and per-class token total T_c,
  * `P(t|c) = (count(t,c) + 1) / (T_c + V)`; class prior = doc-count share.
  * A token with no (t, c) row — unseen for that class, or unseen entirely
  * — contributes the smoothing floor `1 / (T_c + V)`.
  *
  * Scale shape: training = explode + groupBy(class, token) with map-side
  * combine; the model stays DISTRIBUTED (a 10⁷-vocab × C-class model is a
  * table, not a driver artifact). Scoring pre-aggregates each doc to
  * (doc, token, multiplicity) so the model join carries distinct doc-terms
  * — not raw token occurrences — and unseen-token mass is closed-form:
  * `score(d, c) = prior4_c + Σ_matched m·lp4 + (M_d − cov)·lp0_c`, needing
  * only the per-(doc, class) matched sums, never a dense doc×vocab frame.
  * The class-stats frame (C rows) is the only broadcast.
  *
  * Determinism: every log term is rounded to a scale-4 LONG
  * (`floor(ln(p)·10⁴ + 0.5)`, the [[LanguageModel]] convention) BEFORE
  * summation, so scores are exact integer sums — order-independent and
  * bit-reproducible cross-engine (same ±1-ulp `ln` caveat as q71,
  * documented there). Argmax ties break by class name ascending.
  */
object NaiveBayes {

  private def log4(x: Column): Column =
    floor(log(x) * 10000 + 0.5).cast("long")

  /** Train on `(labelCol, textCol)`: returns
    * (tokenModel: (label, token, lp4), classStats: (label, prior4, lp0)).
    * Both are lazy plans over `train` — nothing is collected.
    *
    * @param reuseFrames the q61/GraphRank materialize-once discipline:
    *        localCheckpoint the (label, token) count frame and the C-row
    *        stats frame, so the ≥4 consumers (vocab probe, stats build,
    *        the model join's big side, the scorer's class-stats
    *        broadcast) read two materialized frames instead of each
    *        re-running the tokenize + count lineage (measured: the q80
    *        stage count drops ~24 → ~14). The call stops being lazy;
    *        keep false when the training frame is consumed once.
    * @param memoizeModel register the returned model and stats frames with
    *        the Spark CACHE (lazy — no job runs here): the first execution
    *        materializes them, and every later plan over the SAME training
    *        frame — including independently rebuilt, plan-canonically-equal
    *        ones — substitutes the cached artifact instead of re-training.
    *        This is the serving regime (the q133 IVF-quantizer memoization
    *        convention: a trained model is an artifact, reused across
    *        requests) and the measured q80 shape: per-request cost drops to
    *        scoring only, 1.0–1.3 s → 0.41–0.51 s at sf0.1. The cache pins
    *        vocab×classes rows — dimension-sized by the broadcastModel
    *        contract; caller owns unpersist if the model is rotated.
    */
  def train(
      trainDocs: DataFrame, labelCol: String, textCol: String,
      tokenSep: String = " ", reuseFrames: Boolean = false,
      memoizeModel: Boolean = false): (DataFrame, DataFrame) = {
    def ck(df: DataFrame): DataFrame =
      if (reuseFrames) df.localCheckpoint() else df
    val tok = trainDocs.select(
      col(labelCol).as("label"),
      explode(split(col(textCol), tokenSep)).as("token"))
    val cnt = ck(tok.groupBy(col("label"), col("token")).agg(count(lit(1)).as("c")))
    val tot = cnt.groupBy(col("label")).agg(sum(col("c")).as("t"))
    // vocabulary size from the TYPE-sized (label, token) frame, not a
    // distinct over raw token occurrences: a token is in-vocab iff it has
    // some (label, token) cell, so the counts agree — and the token-volume
    // distinct exchange disappears (types ≪ tokens by Heaps' law)
    val vocab = cnt.select(col("token")).distinct()
      .agg(count(lit(1)).as("v"))
    val pri = trainDocs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("dl"))
    val ndocs = trainDocs.agg(count(lit(1)).as("d"))
    // vocab ⨯ ndocs fold into ONE 1-row broadcast build (not two)
    val stats = ck(tot.join(pri, "label")
      .crossJoin(broadcast(vocab.crossJoin(ndocs)))
      .select(
        col("label"),
        col("t"), col("v"),
        log4(col("dl").cast("double") / col("d")).as("prior4"),
        log4(lit(1.0) / (col("t") + col("v"))).as("lp0")))
    val tokenModel = cnt.join(stats.select("label", "t", "v"), "label")
      .select(
        col("label"), col("token"),
        log4((col("c") + lit(1.0)) / (col("t") + col("v"))).as("lp4"))
    val classStats = stats.select("label", "prior4", "lp0")
    if (memoizeModel) (tokenModel.cache(), classStats.cache())
    else (tokenModel, classStats)
  }

  /** Per-(doc, class) integer scores: (idCol, label, score4).
    *
    * @param broadcastModel when true, the (label, token, lp4) model joins
    *        as a BROADCAST — the doc-term frame (the big side) then never
    *        shuffles for the model join. Correct whenever vocab × classes
    *        fits an executor (the dimension-join discipline; most language
    *        ID / quality-gate models do); keep false for 10⁹-row models,
    *        where the token-keyed shuffle join is the only shape that
    *        holds.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      tokenModel: DataFrame, classStats: DataFrame,
      tokenSep: String = " ",
      broadcastModel: Boolean = false): DataFrame = {
    // CLASS-WIDE single-pass scoring (r15, broadcastModel only): the
    // model pivots ONCE at plan-build into one row per token with C lp4
    // columns (NULL = token unseen for that class), and the probe runs
    // over RAW token occurrences LEFT-joined to that broadcast — no
    // (id, token) dedup exchange, no docM pass, no C-way join fanout.
    // Everything folds into ONE id-keyed aggregate:
    //   s_c  = Σ lp4_c  over occurrences  (≡ Σ m·lp4_c over terms),
    //   cov_c = #non-NULL occurrences     (≡ Σ m over matched terms),
    //   mm   = count(*)                   (≡ Σ m),
    // all exact long sums in a different association order — order-free,
    // so scores hash-match the long form bit for bit. The left join keeps
    // zero-match docs in the frame (they score prior4 + mm·lp0, the
    // closed-form unseen mass); a NULL-text doc explodes to no rows and
    // stays absent (the long form's contract). The class list costs a
    // C-row collect over classStats AT PLAN BUILD (dimension-sized by the
    // same contract that lets classStats broadcast; already materialized
    // for a memoized model).
    //
    // Fallbacks to the long doc-term join (dedup + C-way fanout —
    // the right shape when the model itself must stay distributed):
    // broadcastModel = false (a raw-occurrence shuffle join would move
    // |tokens|-sized data; the dedup halves it), C > 64 (the wide row
    // stops being a sane schema), an empty model, or a NULL class label
    // (a lit(NULL) never equi-joins, so the wide path would silently drop
    // that class's rows).
    val rawLabels = classStats.select(col("label"))
      .distinct().collect().map(_.getString(0))
    val labels: Seq[String] =
      if (rawLabels.contains(null)) Nil else rawLabels.sorted.toSeq
    if (broadcastModel && labels.nonEmpty && labels.size <= 64) {
      def lpc(i: Int) = s"__lp_$i"
      val aggs = labels.zipWithIndex.map { case (l, i) =>
        max(when(col("label") === l, col("lp4"))).as(lpc(i)) }
      val wide = tokenModel.groupBy(col("token"))
        .agg(aggs.head, aggs.tail: _*)
      val sums = count(lit(1)).as("mm") +:
        labels.indices.flatMap { i => Seq(
          sum(col(lpc(i))).as(s"__s_$i"),
          count(col(lpc(i))).as(s"__cov_$i")) }
      val perDoc = docs
        .select(col(idCol), explode(split(col(textCol), tokenSep)).as("token"))
        .join(broadcast(wide), Seq("token"), "left")
        .groupBy(col(idCol))
        .agg(sums.head, sums.tail: _*)
      // unpivot the C columns back to (id, label, s, cov) — answer-sized
      // (count() never yields NULL; sum() does, for zero-match classes)
      val stacked = perDoc
        .select(col(idCol), col("mm"), explode(array(
          labels.zipWithIndex.map { case (l, i) =>
            struct(lit(l).as("label"),
              coalesce(col(s"__s_$i"), lit(0L)).as("s"),
              col(s"__cov_$i").as("cov")) }: _*)).as("__e"))
        .select(col(idCol), col("mm"), col("__e.label").as("label"),
          col("__e.s").as("s"), col("__e.cov").as("cov"))
      stacked.join(broadcast(classStats), Seq("label"))
        .select(
          col(idCol), col("label"),
          (col("prior4") + col("s") +
            (col("mm") - col("cov")) * col("lp0")).as("score4"))
    } else {
      // the long shape: dedup to distinct doc-terms (the model join then
      // carries |terms|, not |occurrences|), mm off the raw scan
      val docTok = docs
        .select(col(idCol), explode(split(col(textCol), tokenSep)).as("token"))
        .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("m"))
      val tokCount: Column =
        if (tokenSep == " ")
          (length(col(textCol)) -
            length(translate(col(textCol), " ", "")) + 1).cast("long")
        else size(split(col(textCol), tokenSep)).cast("long")
      val docM = docs.filter(col(textCol).isNotNull)
        .groupBy(col(idCol))
        .agg(sum(tokCount).as("mm"))
      val matched = docTok.join(tokenModel, "token")
        .groupBy(col(idCol), col("label"))
        .agg(sum(col("m") * col("lp4")).as("s"), sum(col("m")).as("cov"))
      docM.crossJoin(broadcast(classStats))
        .join(matched, Seq(idCol, "label"), "left")
        .select(
          col(idCol), col("label"),
          (col("prior4") + coalesce(col("s"), lit(0L)) +
            (col("mm") - coalesce(col("cov"), lit(0L))) * col("lp0"))
            .as("score4"))
    }
  }

  /** Argmax class per doc: (idCol, label, score4), ties → label asc.
    *
    * The top-1 is a hash-aggregate struct-argmax (`min` over the
    * lexicographic struct `(−score4, label)` — exact longs and one string,
    * engine-identical), not a `row_number` window: same exchange on the id,
    * but no per-partition sort (the q169 single-struct-argmax tail).
    */
  def predict(
      docs: DataFrame, idCol: String, textCol: String,
      tokenModel: DataFrame, classStats: DataFrame,
      tokenSep: String = " ",
      broadcastModel: Boolean = false): DataFrame = {
    score(docs, idCol, textCol, tokenModel, classStats, tokenSep,
      broadcastModel)
      .groupBy(col(idCol))
      .agg(min(struct((-col("score4")).as("n"), col("label"))).as("__m"))
      .select(col(idCol), col("__m.label").as("label"),
        (-col("__m.n")).as("score4"))
  }
}

package graft.llm

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Composable corpus-preparation pipeline: the thin spine that strings the
  * scrub operators of this package (quality gates, normalization dedup,
  * near-dup removal, decontamination, redaction, sampling, sharding) into
  * one end-to-end `DataFrame` transformation, with an optional per-stage
  * row-count audit that costs ZERO extra passes over the data.
  *
  * Why the audit shape matters at 100 TB: the naive audit — `count()` after
  * every stage — re-executes the whole prefix of the pipeline per stage,
  * turning an N-stage scrub into O(N²) corpus scans. Here each audited
  * stage boundary instead carries a Spark `Observation`
  * (`CollectMetrics` node): the counts are accumulated DURING the single
  * real action the caller was going to run anyway (the gold write, the
  * shard sink), and read out afterwards.
  *
  * The one honest caveat, surfaced in the API instead of silently wrong
  * numbers: an `Observation` counts rows flowing through its plan node, so
  * when the NEXT stage consumes its input more than once in the composed
  * plan (self-join near-dup removal, gram-explode + join-back
  * decontamination), the node executes per consumer and the boundary would
  * over-count by that factor. Stages declare this with `branching = true`,
  * which suppresses the tap on the boundary FEEDING them (`None` in the
  * audit) rather than reporting an inflated figure. Branching stages'
  * OUTPUT boundaries are still audited — the caller's single action
  * consumes the final frame exactly once, and interior boundaries are
  * audited whenever their consumer is linear.
  */
final class CorpusPipeline private (val stages: Vector[CorpusPipeline.Stage]) {

  /** Append a stage. `branching = true` declares that `f` consumes its
    * input frame more than once in the plan it builds (self-joins,
    * join-backs) — required for audit honesty, see the class doc.
    */
  def stage(name: String, branching: Boolean = false)(
      f: DataFrame => DataFrame): CorpusPipeline = {
    require(stages.forall(_.name != name), s"duplicate stage name: $name")
    new CorpusPipeline(stages :+ CorpusPipeline.Stage(name, f, branching))
  }

  def names: Seq[String] = stages.map(_.name)

  /** Plain lazy composition — no taps, no overhead. */
  def apply(input: DataFrame): DataFrame =
    stages.foldLeft(input)((df, s) => s.f(df))

  /** Composition with audit taps. Run EXACTLY ONE action on the returned
    * run's `frame` (a write, a count, a collect), then read `audit` —
    * reading it before any action blocks forever, and a second action
    * double-counts into observations that have already latched.
    */
  def instrumented(input: DataFrame): CorpusPipeline.Run = {
    val taps = Vector.newBuilder[(String, Option[Observation])]
    def tap(df: DataFrame, label: String, consumerBranching: Boolean): DataFrame =
      if (consumerBranching) { taps += (label -> None); df }
      else {
        val o = Observation(
          s"graft_corpus_pipeline_${CorpusPipeline.ids.incrementAndGet()}_$label")
        taps += (label -> Some(o))
        df.observe(o, count(lit(1)).as("rows"))
      }
    var cur = tap(input, "input", stages.headOption.exists(_.branching))
    stages.zipWithIndex.foreach { case (s, i) =>
      val nextBranching = stages.lift(i + 1).exists(_.branching)
      cur = tap(s.f(cur), s.name, nextBranching)
    }
    new CorpusPipeline.Run(cur, taps.result())
  }
}

object CorpusPipeline {

  final case class Stage(
      name: String, f: DataFrame => DataFrame, branching: Boolean)

  /** Observation names must be unique per JVM session. */
  private val ids = new AtomicLong()

  def apply(): CorpusPipeline = new CorpusPipeline(Vector.empty)

  /** An instrumented composition: `frame` to act on once, then `audit`
    * for per-boundary row counts (`None` where a branching consumer made
    * the tap unsound; the entry is still present so the audit's shape is
    * stable regardless of stage internals).
    */
  final class Run(
      val frame: DataFrame, taps: Vector[(String, Option[Observation])]) {
    def audit: Seq[(String, Option[Long])] =
      taps.map { case (n, o) =>
        n -> o.map(_.get("rows") match {
          case l: java.lang.Long => l.longValue()
          case other => other.toString.toLong
        })
      }
  }
}

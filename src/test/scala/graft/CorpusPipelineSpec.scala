package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{CorpusPipeline, Decontam, TextAnalysis}
import graft.operators.Dedupe

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // gate → normalize-dedup (keep lowest id) → decontam drop vs a bench set:
  // the canonical scrub spine, with a branching final stage
  private def benchDf: DataFrame =
    Seq((100L, "leak alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")

  private def corpus: DataFrame = Seq(
    (1L, "short doc"),                                                // gated out (< 5 words)
    (2L, "The quick brown fox jumps over lazy dogs"),                 // survives
    (3L, "the quick brown fox jumps over lazy dogs!!"),               // normalize-dup of 2 → dropped
    (4L, "contains leak alpha beta gamma delta epsilon zeta eta run"),// decontam drop
    (5L, "a wholly different document with many original words here")) // survives
    .toDF("doc_id", "text")

  private def stages(bench: DataFrame): CorpusPipeline =
    CorpusPipeline()
      .stage("gate")(_.filter(TextAnalysis.tokenCountWs(col("text")) >= 5))
      .stage("dedupe")(df => Dedupe.topOnePerKey(
        df, Seq(md5(TextAnalysis.normalized(col("text")))),
        Seq(col("doc_id").asc)))
      .stage("decontam", branching = true) { df =>
        val bad = Decontam.exactNgramOverlap(df, bench, "doc_id", "text", n = 8)
          .select(col("a").as("doc_id")).distinct()
        df.join(bad, Seq("doc_id"), "left_anti")
      }

  test("corpus pipeline: composition equals sequential stage application") {
    val p = stages(benchDf)
    val composed = p(corpus).select("doc_id").as[Long].collect().sorted
    assert(composed.toSeq == Seq(2L, 5L))
    val manual = p.stages.foldLeft(corpus)((df, s) => s.f(df))
      .select("doc_id").as[Long].collect().sorted
    assert(composed.toSeq == manual.toSeq)
  }

  test("corpus pipeline: observation audit counts each linear boundary once") {
    val run = stages(benchDf).instrumented(corpus)
    val n = run.frame.count() // the single action; drives all taps
    assert(n == 2L)
    val audit = run.audit.toMap
    assert(run.audit.map(_._1) == Seq("input", "gate", "dedupe", "decontam"))
    assert(audit("input") == Some(5L))
    assert(audit("gate") == Some(4L))
    // dedupe's output feeds the branching decontam stage (gram explode +
    // join-back consumes it twice): tap suppressed, not inflated
    assert(audit("dedupe") == None)
    assert(audit("decontam") == Some(2L))
  }

  test("corpus pipeline: duplicate stage names rejected, names in order") {
    val p = CorpusPipeline().stage("a")(identity).stage("b")(identity)
    assert(p.names == Seq("a", "b"))
    val err = intercept[IllegalArgumentException](p.stage("a")(identity))
    assert(err.getMessage.contains("duplicate stage name"))
  }
}

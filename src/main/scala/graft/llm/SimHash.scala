package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** SimHash document fingerprinting (32-bit, md5-derived bit family).
  *
  * For each word w: md5(w) yields 32 bits (8 hex nibbles × 4); each bit
  * votes ±1 on its position; the fingerprint bit is the sign of the summed
  * votes. Near-identical documents differ in few bit positions (small
  * Hamming distance), enabling near-dup bucketing by fingerprint prefix.
  *
  * Implemented as ONE nested array expression (transform/aggregate/zip_with)
  * — no explode, no shuffle, no UDF: per-row compute only, which is exactly
  * what you want when fingerprinting 100 TB of documents during a scan.
  * Built via `expr` because the Scala `shiftright` helper only accepts a
  * literal shift amount, while the SQL parser accepts an expression.
  */
object SimHash {

  /** 32-char '0'/'1' fingerprint string for a text column (by name).
    * Two-stage bit derivation: per word, the 8 hex nibbles are decoded once
    * (8 locate+substring), then the 32 bit votes are cheap integer ops on the
    * nibble array — ~3× less string work than deriving each bit from the hex
    * string directly (HOFs are interpreted, so per-element cost is real).
    */
  def simhash32(textCol: String): Column = expr(
    s"""array_join(
       |  transform(
       |    aggregate(
       |      transform(
       |        transform(split($textCol, ' '), w -> md5(w)),
       |        h -> transform(sequence(0, 7),
       |               q -> locate(substring(h, 1 + q, 1), '0123456789abcdef') - 1)),
       |      array_repeat(0, 32),
       |      (acc, nb) -> zip_with(acc,
       |        transform(sequence(0, 31), j ->
       |          (shiftright(element_at(nb, cast(j div 4 as int) + 1), j % 4) & 1) * 2 - 1),
       |        (x, y) -> x + y)),
       |    s -> CASE WHEN s > 0 THEN '1' ELSE '0' END),
       |  '')""".stripMargin)

  /** Codegen-path variant: explode words → 32 static bit-vote columns →
    * partial+final hash aggregate per document. Everything is whole-stage
    * codegen (static nibble positions and shift amounts), and map-side
    * combine means the shuffle carries one 32-int row per document per
    * partition — this is the high-throughput form for corpus-scale
    * fingerprinting (measured ~4× faster than the interpreted array
    * expression at sf0.1). Same bit math as [[simhash32]], same results.
    */
  def simhash32Agg(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val voteCols = (0 until 32).map { j =>
      val nibble = conv(substring(col("h"), 1 + j / 4, 1), 16, 10).cast("int")
      (shiftright(nibble, j % 4).bitwiseAND(lit(1)) * 2 - 1).as(s"b$j")
    }
    val sums = (0 until 32).map(j => sum(col(s"b$j")).as(s"s$j"))
    val bits = (0 until 32).map(j => when(col(s"s$j") > 0, "1").otherwise("0"))
    df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", md5(col("w")))
      .select((col("id") +: voteCols): _*)
      .groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"), concat(bits: _*).as("simhash"))
  }

  /** Scan-speed form: the whole per-document vote loop in one compiled
    * kernel ([[graft.functions.SimHash32]]) — raw md5 digest bytes, integer
    * votes, no explode, no shuffle, no per-bit expression trees. Same bit
    * math and results as [[simhash32]]/[[simhash32Agg]]; this is the form a
    * 100 TB fingerprinting scan should run.
    */
  def simhash32Kernel(text: Column): Column =
    graft.functions.TextExprs.simhash32(text)

  /** Hamming distance between two '0'/'1' fingerprint strings — the native
    * codegen expression (see [[graft.functions.HammingDistance]]); the
    * interpreted `zip_with` formulation it replaced paid per-character
    * lambda dispatch.
    */
  def hamming(a: Column, b: Column): Column =
    graft.functions.HammingDistance.hamming(a, b)
}

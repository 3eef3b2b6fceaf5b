package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffled table layout so repeated equi-joins/aggregations
  * on the bucket key run with NO exchange — the co-located-join lever
  * SCALE.md prescribes for repeated big-big joins at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("join on the bucket key plans without a shuffle exchange") {
    // explicit `path` options keep the data in a temp dir; only table
    // metadata goes to the default (gitignored) warehouse
    val wh = Files.createTempDirectory("bucket_wh_").toFile.getAbsolutePath
    val sf = "/root/testdata/sf0.001"

    Tables.lineitem(spark, sf)
      .write.format("parquet")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.format("parquet")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")

    // force the sort-merge path (at this fixture size Spark would broadcast,
    // which hides the property under test: bucketed SMJ without exchange)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side: both inputs are
    // pre-bucketed on the join key (the only exchange allowed is the
    // post-join aggregation on a different key)
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin")
    assert(joinSection.length > 1, s"expected a non-broadcast join in:\n$plan")
    assert(!joinSection.last.contains("Exchange"),
      s"join inputs must be exchange-free (bucketed):\n$plan")

    // and results are correct
    val rows = joined.orderBy("o_orderpriority").collect()
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"))
      .orderBy("o_orderpriority").collect()
    assert(rows.map(_.toString).sameElements(expected.map(_.toString)))

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salt

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers native functions for SQL use") {
    // a dedicated session so registration comes ONLY from the extension;
    // clear (not stop) any shared session first — getOrCreate would
    // otherwise return it and silently skip withExtensions
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val row = spark.sql(
        """SELECT hamming_distance('abc', 'abd') AS h,
          |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |       cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cs,
          |       word_shingles('a b c d', 3) AS sh,
          |       minhash_slices(word_shingles('a b c d', 3), 8) AS mh
          |""".stripMargin).collect()(0)
      assert(row.getAs[Int]("h") == 1)
      assert(row.getAs[Double]("dp") == 11.0)
      assert(row.getAs[Double]("cs") == 1.0)
      assert(row.getSeq[String](3) == Seq("a b c", "b c d"))
      assert(row.getSeq[String](4).length == 8)
      assert(row.getSeq[String](4).forall(_.length == 8))
      val row2 = spark.sql(
        """SELECT simhash32('the quick fox') AS sh,
          |       marker_counts('the quick the fox', concat(' the ', chr(0), ' a ')) AS mc
          |""".stripMargin).collect()(0)
      assert(row2.getAs[String]("sh").length == 32)
      assert(row2.getAs[String]("sh").forall(c => c == '0' || c == '1'))
      assert(row2.getSeq[Long](1) == Seq(2L, 0L))
      // Unicode normalization (every non-ASCII codepoint as a \u escape so
      // no tool can silently NFC-normalize the test source): combining
      // acute composes under NFC; the fi ligature folds only under NFKC;
      // idempotent; null passthrough
      val un = spark.sql(
        "SELECT nfc_normalize('Gene\u0301ve') AS nfc, " +
          "nfkc_normalize('\uFB01n de sie\u0300cle') AS nfkc, " +
          "nfc_normalize('\uFB01sh') AS keepLig, " +
          "nfc_normalize(nfc_normalize('\u00e9')) AS idem, " +
          "nfc_normalize(CAST(NULL AS STRING)) AS nul").collect()(0)
      assert(un.getAs[String]("nfc") == "Gen\u00e9ve")
      assert(un.getAs[String]("nfc").length == 6) // composed: one char fewer
      assert(un.getAs[String]("nfkc") == "fin de si\u00e8cle")
      assert(un.getAs[String]("keepLig") == "\uFB01sh") // NFC keeps compat chars
      assert(un.getAs[String]("idem") == "\u00e9")
      assert(un.isNullAt(4))
      val agg = spark.sql(
        """SELECT g, percentile_array(v, '0.5,1.0') AS p FROM VALUES
          |  ('a', 1.0d), ('a', 2.0d), ('a', 3.0d), ('b', 10.0d) t(g, v)
          |GROUP BY g ORDER BY g""".stripMargin).collect()
      assert(agg(0).getSeq[Double](1) == Seq(2.0, 3.0))
      assert(agg(1).getSeq[Double](1) == Seq(10.0, 10.0))
      // bloom build + probe, pure SQL: inserted values always hit
      val bloom = spark.sql(
        """WITH s AS (SELECT bloom_agg(xxhash64(x), '256,7') AS bf
          |           FROM VALUES (1L), (2L), (3L) t(x))
          |SELECT bloom_might_contain((SELECT bf FROM s), xxhash64(2L)) AS hit,
          |       bloom_might_contain((SELECT bf FROM s), xxhash64(99L)) AS miss
          |""".stripMargin).collect()(0)
      assert(bloom.getAs[Boolean]("hit"))
      assert(!bloom.getAs[Boolean]("miss"))
    } finally {
      // hand the shared session back without stopping the SparkContext
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}

class SaltSpec extends SparkSpec {
  import spark.implicits._

  private val skewed = (1 to 900).map(i => ("hot", i.toLong, 1.0)) ++
    (1 to 100).map(i => (s"k${i % 10}", (1000 + i).toLong, 2.0))

  test("salted aggregation equals plain aggregation") {
    val df = skewed.toDF("k", "id", "v")
    val salted = Salt.saltedCountSum(df, "k", "id", "v", factor = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.sameElements(plain))
  }

  test("salted join equals plain join") {
    val big = skewed.toDF("k", "id", "v")
    val small = Seq(("hot", "HOT"), ("k1", "K1")).toDF("k", "label")
    val salted = Salt.saltedJoin(big, small, "k", "id", factor = 4)
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("label")))
    val plain = big.join(small, Seq("k"), "left")
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("label")))
    assert(salted.sameElements(plain))
  }
}

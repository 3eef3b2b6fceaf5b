package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search.
  *
  * Two paths, matching how ANN works at scale:
  *  - [[cosineTopK]]: brute-force exact top-k — the correctness baseline.
  *    The query set is broadcast, so the scan over the corpus is a single
  *    shuffle-free map + a small top-k aggregation. Cost O(|corpus|·|Q|·dim);
  *    right when |Q| is small, exact recall required.
  *  - [[lshBucket]] / [[annTopK]]: random-hyperplane LSH. Each vector gets a
  *    b-bit bucket; neighbor search joins only within buckets — the shuffle
  *    is hash-partitioned on the bucket key and each bucket is tiny. This is
  *    the 100 TB path: signatures are computed in the scan, and candidate
  *    volume is tuned by the number of hyperplanes.
  *
  * Hyperplane weights are ±1 derived from md5 (deterministic, engine-neutral,
  * reproducible in the SQL oracle); a production variant would use seeded
  * Gaussian planes.
  */
object Embeddings {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplanes: sign h,d = parity of the first hex nibble
    * of md5("h,d").
    */
  def hyperplanes(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { h =>
      (0 until dim).map { d =>
        val nibble = Integer.parseInt(md5hex(s"$h,$d").substring(0, 1), 16)
        if (nibble % 2 == 0) 1.0 else -1.0
      }
    }

  /** Sequential-order (ascending index) dot product / cosine — native
    * codegen expressions (graft.functions.ArrayMath); bit-identical to the
    * interpreted `aggregate(zip_with(...))` fold-left they replaced, and to
    * DuckDB's list functions, but run as a primitive loop inside
    * whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayMath.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.ArrayMath.cosine(a, b)

  /** Exact top-k cosine neighbors for each query vector. `queries` must be
    * small (it is broadcast); `corpus` is scanned once.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cvec"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
      // vectors pruned before the ranking shuffle (see ivfTopK)
      .select(col("qid"), col("cid"), col("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("rank"), col("sim"))
  }

  /** Contrastive hard-negative mining: for each query vector, the top-k
    * most similar corpus vectors with a DIFFERENT label — the pair-mining
    * step of contrastive/embedding training (easy negatives are useless;
    * the hardest ones — high similarity, wrong label — carry the
    * gradient). Same shape as [[cosineTopK]] (broadcast query set, corpus
    * scanned once, vectors pruned before the ranking shuffle) with the
    * label-mismatch filter applied BEFORE ranking, so ranks index the
    * negative pool only. This is the exact baseline; at corpus scale swap
    * the candidate generator for the IVF cell join ([[ivfTopK]]'s) and
    * keep the same filter + window tail.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("label").as("clabel"),
      col("embedding").cast("array<double>").as("cvec"))
    val q = queries.select(col("vec_id").as("qid"), col("label").as("qlabel"),
      col("embedding").cast("array<double>").as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("clabel") =!= col("qlabel"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
      .select(col("qid"), col("qlabel"), col("cid"), col("clabel"), col("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Per-label mean vectors — the IVF coarse quantizer trained from the
    * corpus itself (labels stand in for k-means cells; a learned quantizer
    * would drop in the same way). One shuffle keyed by (label, dim) with
    * map-side combine, then one tiny per-label array assembly.
    */
  def centroids(corpus: DataFrame): DataFrame =
    corpus
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("centroid"))

  /** A trained coarse quantizer: (cell label, centroid vector) pairs — a
    * tiny model artifact that ships with the plan, like any production IVF
    * index's quantizer.
    */
  type Quantizer = IndexedSeq[(Any, Seq[Double])]

  /** Train (materialize) the quantizer from a centroid frame. One small
    * collect of k rows — the quantizer is by definition driver-sized.
    */
  def trainQuantizer(cents: DataFrame): Quantizer =
    cents.collect()
      .map(r => (r.get(r.fieldIndex("label")), r.getSeq[Double](r.fieldIndex("centroid"))))
      .toIndexedSeq

  /** Memoized quantizer per dataset: centroids are trained once per corpus
    * and reused by every query in the session (q41 ANN, q42 dedup) — the
    * model-registry pattern, and one less aggregation job per query.
    *
    * The cache key is the dataset path PLUS a content fingerprint (recursive
    * file listing: path, length, mtime), so regenerating the data under the
    * same path retrains instead of silently serving stale centroids. Note
    * the bench-methodology asymmetry this creates intentionally: a resident
    * engine amortizes quantizer training across queries, while the DuckDB
    * oracle query re-derives centroids on every execution.
    */
  private val quantizers =
    new java.util.concurrent.ConcurrentHashMap[String, Quantizer]()

  /** Latest fingerprint seen per dataset path — lets [[quantizerFor]] evict
    * the superseded entry when a dataset is regenerated under the same path,
    * instead of leaking one Quantizer per regeneration for the JVM lifetime.
    */
  private val latestFingerprint =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Content fingerprint of a dataset path: md5 over the sorted recursive
    * (file path, length, modification time) listing via the Hadoop
    * FileSystem of the active session (works for local and cluster stores).
    * Falls back to the bare path when listing fails (no active session).
    */
  def datasetFingerprint(path: String): String = try {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      lines += s"${f.getPath}|${f.getLen}|${f.getModificationTime}"
    }
    md5hex(lines.sorted.mkString("\n"))
  } catch { case scala.util.control.NonFatal(e) =>
    // Loud fallback: "nofp" restores forever-stale caching (same key for
    // every generation of the dataset), so never do it silently.
    System.err.println(
      s"[graft] dataset fingerprint failed for $path (${e.getClass.getSimpleName}: " +
        s"${e.getMessage}); quantizer cache falls back to path-only keying")
    "nofp"
  }

  def quantizerFor(datasetPath: String, train: => DataFrame): Quantizer = {
    val fp = datasetFingerprint(datasetPath)
    val prev = latestFingerprint.put(datasetPath, fp)
    if (prev != null && prev != fp) quantizers.remove(s"$datasetPath#$prev")
    quantizers.computeIfAbsent(s"$datasetPath#$fp", _ => trainQuantizer(train))
  }

  /** Drop all memoized quantizers (explicit invalidation hook). */
  def invalidateQuantizers(): Unit = { quantizers.clear(); latestFingerprint.clear() }

  /** Test hook: entry count of the quantizer memo (eviction regression). */
  private[graft] def quantizerCacheSize: Int = quantizers.size

  /** IVF assignment, persisted before a self-join: without this, BOTH legs
    * of the cell equi-join recompute the full assignment lineage (scan →
    * repartition → k×dim argmax per row) — column aliases differ between
    * the legs, so Spark's exchange reuse never fires. Persisting makes the
    * join read one materialization. The cache entry is keyed by logical
    * plan in Spark's CacheManager, so q41 (ivfTopK) and q42 (dedupInCells)
    * over the same corpus + quantizer share one entry, and re-invoking the
    * same query re-uses rather than re-caches (`storageLevel` guard avoids
    * the "already cached" warning). Answer-shaped frames only —
    * (vec_id, vec, cell) is the pruned projection, ~0.5 KB/row.
    */
  private def persistedAssign(corpus: DataFrame, quant: Quantizer): DataFrame = {
    val a = ivfAssign(corpus, quant)
    if (a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      a.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    a
  }

  /** IVF cell assignment: nearest centroid by cosine. The quantizer is
    * inlined as literal vectors, so assignment is a pure scan-time argmax
    * (`array_min` over (-sim, label) structs — highest sim, lowest label on
    * ties) with no join, no aggregation, and no shuffle of any kind.
    * (Earlier formulations — crossJoin×cells + window, then min_by
    * aggregation — shuffled |corpus| rows just to argmax.)
    */
  def ivfAssign(corpus: DataFrame, quant: Quantizer): DataFrame = {
    val v = corpus.select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val candidates = quant.map { case (label, c) =>
      struct((-cosine(col("vec"), typedLit(c))).as("ns"), lit(label).as("label"))
    }
    v.withColumn("__best", array_min(array(candidates: _*)))
      .select(col("vec_id"), col("vec"), col("__best.label").as("cell"))
  }

  def ivfAssign(corpus: DataFrame, cents: DataFrame): DataFrame =
    ivfAssign(corpus, trainQuantizer(cents))

  /** IVF approximate top-k: neighbors ranked within each vector's cell —
    * the alternative scale path to [[annTopK]]'s hyperplane LSH. The join is
    * hash-partitioned on the cell id; candidate volume = cell size, tuned by
    * the quantizer's cell count.
    */
  def ivfTopK(corpus: DataFrame, cents: DataFrame, k: Int): DataFrame =
    ivfTopK(corpus, trainQuantizer(cents), k)

  def ivfTopK(corpus: DataFrame, quant: Quantizer, k: Int): DataFrame = {
    val assigned = persistedAssign(corpus, quant)
    val l = assigned.select(col("vec_id").as("a"), col("vec").as("va"), col("cell"))
    val r = assigned.select(col("vec_id").as("b"), col("vec").as("vb"), col("cell"))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("b").asc)
    l.join(r, Seq("cell"))
      .filter(col("a") =!= col("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      // prune the vectors BEFORE the ranking shuffle: the window only needs
      // (a, b, cell, sim) ~40 bytes/row, not two 64-dim arrays ~1 KB/row
      .select(col("a"), col("b"), col("cell"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("cell"), col("rank"), col("sim"))
  }

  /** Embedding near-duplicate dedup inside IVF cells: a vector is a
    * duplicate when some lower-id vector *in its cell* reaches the cosine
    * threshold; it pairs with its best keeper. Candidates come from the
    * cell equi-join — shuffle is hash-partitioned on the cell id and pair
    * volume is |cell|² per cell, not |corpus|² (the all-pairs exactness
    * baseline lives in the ScalaTest oracle only; at 10⁹ vectors it is not
    * runnable, while this shape is).
    */
  def dedupInCells(corpus: DataFrame, cents: DataFrame, threshold: Double): DataFrame =
    dedupInCells(corpus, trainQuantizer(cents), threshold)

  /** @param saltFactor >1 salts the cell self-join: a hot IVF cell (a dense
    *   region of embedding space — near-identical boilerplate vectors — or a
    *   degenerate quantizer) otherwise enumerates its |cell|² pairs in ONE
    *   task. The keeper leg carries `salt = hash(kept_id) % factor`, the dup
    *   leg is exploded over all salts, so each (kept, dup) pair still joins
    *   exactly once while the hot cell fans out over `factor` tasks. Off by
    *   default: the exploded leg shuffles its vectors ×factor, only worth
    *   paying on skewed corpora. Same construction as the banded LSH salt
    *   (MinHashLsh.candidatePairs).
    */
  def dedupInCells(corpus: DataFrame, quant: Quantizer, threshold: Double,
      saltFactor: Int = 1): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val assigned = persistedAssign(corpus, quant)
    val l0 = assigned.select(col("vec_id").as("kept_id"), col("vec").as("va"), col("cell"))
    val r0 = assigned.select(col("vec_id").as("dup_id"), col("vec").as("vb"), col("cell"))
    val w = Window.partitionBy(col("dup_id")).orderBy(col("sim").desc, col("kept_id").asc)
    val joined =
      if (saltFactor <= 1) l0.join(r0, Seq("cell"))
      else {
        val l = l0.withColumn("__salt",
          graft.operators.Salt.saltFrom(col("kept_id"), saltFactor))
        val r = r0.withColumn("__salt",
          explode(sequence(lit(0), lit(saltFactor - 1))))
        l.join(r, Seq("cell", "__salt")).drop("__salt")
      }
    joined
      .filter(col("kept_id") < col("dup_id"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      // vectors pruned before the ranking shuffle (see ivfTopK)
      .select(col("dup_id"), col("kept_id"), col("cell"), col("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("dup_id"), col("kept_id"), col("cell"), col("sim"))
  }

  /** b-bit LSH bucket string ('1' where dot(v, plane) > 0). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      when(dot(vec, typedLit(p)) > 0, "1").otherwise("0")
    }: _*)

  /** Approximate top-k: neighbors ranked within each LSH bucket only. */
  def annTopK(corpus: DataFrame, planes: Seq[Seq[Double]], k: Int): DataFrame = {
    val v = corpus.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), planes))
    val l = v.select(col("vec_id").as("a"), col("vec").as("va"), col("bucket"))
    val r = v.select(col("vec_id").as("b"), col("vec").as("vb"), col("bucket"))
    val w = Window.partitionBy(col("a")).orderBy(col("sim").desc, col("b").asc)
    l.join(r, Seq("bucket"))
      .filter(col("a") =!= col("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      // vectors pruned before the ranking shuffle (see ivfTopK)
      .select(col("a"), col("b"), col("bucket"), col("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("bucket"), col("rank"), col("sim"))
  }

  /** Symmetric int8 scalar quantization — the 8×-compression retrieval
    * path (a 100 TB float32 corpus becomes 25 TB of int8 + one scale per
    * vector; at serving time the dot loop runs on ints). Per vector:
    * scale s = max|xᵢ|, code qᵢ = floor(xᵢ/s·127 + 0.5) ∈ [−127, 127]
    * (an exact IEEE scalar — identical in any engine), all-zero vectors
    * quantize to all-zero codes with qscale 0. Output: `idCol`, `qvec`
    * (array<int>), `qscale` (s/127 — dequantize as qᵢ·qscale).
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__s", expr("array_max(transform(__v, x -> abs(x)))"))
      .withColumn("qvec", expr(
        "transform(__v, x -> CASE WHEN __s = 0D THEN 0 " +
          "ELSE CAST(floor(x / __s * 127 + 0.5) AS INT) END)"))
      .withColumn("qscale", when(col("__s") === 0d, lit(0d)).otherwise(col("__s") / 127))
      .select(col(idCol), col("qvec"), col("qscale"))

  /** Brute-force top-k over int8 codes — [[cosineTopK]]'s plan on the
    * quantized corpus. Cosine is scale-invariant, so the per-vector scales
    * drop out entirely and the integer codes can ride the existing codegen
    * double kernel EXACTLY: every intermediate (products ≤ 127², sums
    * ≤ dim·127² ≪ 2⁵³) is integer-valued and exact in a double, making the
    * quantized similarity bit-identical cross-engine (the `sqrt`s are
    * IEEE-correctly-rounded, unlike `ln`). Rank quality vs [[cosineTopK]]
    * is the quantization recall — measured, not assumed (LlmSpec).
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def codes(df: DataFrame) = int8Quantize(df, "vec_id", "embedding")
      .select(col("vec_id"), col("qvec").cast("array<double>").as("embedding"))
    cosineTopK(codes(corpus), codes(queries), k)
  }
}

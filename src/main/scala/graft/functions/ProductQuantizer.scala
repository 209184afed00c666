package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for compressed-domain ANN — the memory-scale
  * path beyond int8 quantization: the vector splits into `m` subvectors,
  * each quantized to one of `ksub` per-subspace centroids, so a vector
  * stores as `m` small codes (8 bytes at m=8 — 32× smaller than 64
  * float32 dims). Search runs in the compressed domain via asymmetric
  * distance (ADC): per query a m×ksub lookup table of exact
  * query-to-centroid distances, per corpus vector just `m` table adds.
  *
  * At 100 TB the encoded corpus is what scans (the float vectors stay in
  * cold storage); the codebook is tiny and broadcasts; combine with the
  * IVF cells (`VectorIndex`) to prune candidates before ADC scoring.
  *
  * Deterministic like `VectorIndex`: init from the first `ksub` vectors
  * by id, Lloyd means in double precision; quality is pinned by recall
  * specs, not bit equality.
  */
object ProductQuantizer {

  final case class PqCodebook(m: Int, subDim: Int,
      centroids: Array[Array[Array[Double]]]) {
    def ksub: Int = centroids(0).length

    /** Nearest centroid per subspace. */
    def encodeOne(v: Seq[Float]): Array[Int] = {
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        val cents = centroids(j)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          val cent = cents(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val diff = cent(i) - v(j * subDim + i); d += diff * diff; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(j) = best
        j += 1
      }
      codes
    }

    /** ADC lookup table: exact squared distance from the query's j-th
      * subvector to every centroid of subspace j. */
    def distTable(q: Seq[Float]): Array[Array[Double]] =
      Array.tabulate(m, ksub) { (j, c) =>
        val cent = centroids(j)(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = cent(i) - q(j * subDim + i); d += diff * diff; i += 1
        }
        d
      }
  }

  /** Train per-subspace codebooks: one distributed assignment + mean pass
    * per Lloyd iteration (grouped by (subspace, cell, position) — the
    * collected means are m×ksub×subDim doubles, tiny). */
  def train(df: DataFrame, idCol: String, embCol: String,
      m: Int, ksub: Int, iters: Int): PqCodebook = {
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val init = df.orderBy(col(idCol)).limit(ksub)
      .select(col(embCol)).collect().map(_.getSeq[Float](0))
    require(init.length >= ksub,
      s"corpus has ${init.length} vectors; ksub=$ksub centroids need at least that many")
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (j, c) =>
      Array.tabulate(subDim)(i => init(c)(j * subDim + i).toDouble)
    }
    for (_ <- 1 to iters) {
      val cb = PqCodebook(m, subDim, cents)
      val means = encode(df, embCol, cb, "__codes")
        .select(col("__codes"), posexplode(col(embCol)).as(Seq("pos", "x")))
        .select((col("pos") / subDim).cast("int").as("j"),
          element_at(col("__codes"), (col("pos") / subDim).cast("int") + 1).as("cell"),
          (col("pos") % subDim).as("p"), col("x"))
        .groupBy("j", "cell", "p")
        .agg(avg(col("x")).as("mean"))
        .collect()
      val next = cents.map(_.map(_.clone())) // empty cells keep centroids
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2).toInt) = r.getDouble(3)
      }
      cents = next
    }
    PqCodebook(m, subDim, cents)
  }

  /** Persist a trained codebook as (j, cell, p, mean) rows — m·ksub·subDim
    * doubles, tiny at any corpus scale; the serving job loads it instead
    * of re-training (index build is a build cost, not a query cost). */
  def saveCodebook(spark: org.apache.spark.sql.SparkSession, cb: PqCodebook,
      path: String): Unit = {
    val rows = for {
      (sub, j) <- cb.centroids.zipWithIndex.toSeq
      (cent, c) <- sub.zipWithIndex.toSeq
      (x, p) <- cent.zipWithIndex.toSeq
    } yield (j, c, p, x)
    spark.createDataFrame(rows).toDF("j", "cell", "p", "mean")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String): PqCodebook = {
    val rows = spark.read.parquet(path).collect() // m x ksub x subDim — tiny
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val subDim = rows.map(_.getInt(2)).max + 1
    val cents = Array.fill(m, ksub)(new Array[Double](subDim))
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    PqCodebook(m, subDim, cents)
  }

  /** Add the PQ code column (map-side, codebook in the task closure). */
  def encode(df: DataFrame, embCol: String, cb: PqCodebook,
      codeCol: String = "pq_code"): DataFrame = {
    val enc = udf((v: Seq[Float]) => cb.encodeOne(v))
    df.withColumn(codeCol, enc(col(embCol)))
  }

  /** Compressed-domain top-k by ADC distance: the query batch's lookup
    * tables are computed driver-side (Q×m×ksub doubles) and ride the task
    * closure; the corpus contributes only its codes — m adds per
    * (query, vector) pair. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      cb: PqCodebook, topK: Int): DataFrame = {
    val qTabs: Map[Long, Array[Array[Double]]] = queries
      .select(col(idCol), col(embCol)).collect()
      .map(r => r.getLong(0) -> cb.distTable(r.getSeq[Float](1))).toMap
    val qids = qTabs.keys.toArray.sorted
    val m = cb.m
    val adc = udf { (qid: Long, codes: Seq[Int]) =>
      val t = qTabs(qid)
      var d = 0.0
      var j = 0
      while (j < m) { d += t(j)(codes(j)); j += 1 }
      d
    }
    val scored = encode(corpus, embCol, cb)
      .select(col(idCol).as("neighbor_id"), col("pq_code"))
      .withColumn("query_id", explode(lit(qids)))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adc(col("query_id"), col("pq_code")), 6).as("adist"))
    // bounded-buffer top-k (graft.operators.TopK): distances rank
    // ascending; no rank window — a query's full-scan candidate list
    // never lands in one task
    graft.operators.TopK.perGroup(scored, "query_id", "neighbor_id", "adist",
      topK, ascending = true)
  }

  /** IVF+PQ: prune candidates to the query's `nProbe` IVF cells, then
    * score survivors by ADC — the standard billion-scale composition
    * (cells bound the scan to ~nProbe/k of the corpus, codes bound the
    * per-candidate cost to m adds). Each corpus row joins only the
    * queries probing its cell, via an inverted cell→queries map riding
    * the closure. */
  def searchWithCells(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, ivf: VectorIndex.Codebook, cb: PqCodebook,
      nProbe: Int, topK: Int): DataFrame = {
    val qData = queries.select(col(idCol), col(embCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val qTabs = qData.map { case (qid, v) => qid -> cb.distTable(v) }.toMap
    val cellToQids: Map[Int, Array[Long]] = qData
      .flatMap { case (qid, v) => ivf.nearestN(v, nProbe).map(_ -> qid) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val m = cb.m
    val probers = udf((cell: Int) => cellToQids.getOrElse(cell, Array.empty[Long]))
    val adc = udf { (qid: Long, codes: Seq[Int]) =>
      val t = qTabs(qid)
      var d = 0.0
      var j = 0
      while (j < m) { d += t(j)(codes(j)); j += 1 }
      d
    }
    val scored = VectorIndex.assignCells(encode(corpus, embCol, cb), embCol, ivf)
      .select(col(idCol).as("neighbor_id"), col("pq_code"), col("__cell"))
      .withColumn("query_id", explode(probers(col("__cell"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(adc(col("query_id"), col("pq_code")), 6).as("adist"))
    graft.operators.TopK.perGroup(scored, "query_id", "neighbor_id", "adist",
      topK, ascending = true)
  }
}

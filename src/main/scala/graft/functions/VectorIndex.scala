package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for approximate nearest-neighbor search — the
  * scale path beyond sign-bucket LSH: k-means cells, vectors assigned to
  * their nearest centroid, queries probing only the `nProbe` nearest
  * cells. At 100 TB the cell assignment is a map-side pass against a tiny
  * broadcast codebook and search touches `nProbe/k` of the corpus.
  *
  * Deterministic by construction: centroids initialize from the first k
  * vectors by id and Lloyd iterations average in double precision — good
  * enough for an index (approximation quality is asserted by recall tests,
  * not bit-equality).
  */
object VectorIndex {

  final case class Codebook(centroids: Array[Array[Double]]) {
    /** Unbox the row's float array ONCE (r15, guide §1.2 "per-task
      * work"): `v(i)` through the generic `Seq[Float]` apply boxes every
      * element — at corpus-scale ranking that was k·dim boxed Floats per
      * row. ArraySeq.ofFloat exposes its backing primitive array
      * zero-copy; anything else pays one unboxed copy. */
    private def raw(v: Seq[Float]): Array[Float] = v match {
      case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
      case _ => v.toArray
    }

    def nearest(v: Seq[Float]): Int = {
      val a = raw(v)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var d = 0.0
        var i = 0
        while (i < cent.length) {
          val diff = cent(i) - a(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Distances are precomputed into an array before the sort (r15):
      * `sortBy(f)` re-evaluates `f` on EVERY comparison (`Ordering.on`),
      * so the old form paid ~log2(k) full k·dim distance passes per row
      * instead of one. Result order is bit-identical: the sort is stable
      * and keys are the same doubles. */
    def nearestN(v: Seq[Float], n: Int): Seq[Int] = {
      val a = raw(v)
      val d = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var s = 0.0
        var i = 0
        while (i < cent.length) { val diff = cent(i) - a(i); s += diff * diff; i += 1 }
        d(c) = s
        c += 1
      }
      centroids.indices.sortBy(i => d(i)).take(n)
    }
  }

  /** Train a k-cell codebook with `iters` Lloyd iterations. Centroids are
    * tiny (k × dim doubles) — they travel to executors in the task
    * closure, the distributed passes are the assignments/averages.
    *
    * `sampleOneIn` > 1 trains on a DETERMINISTIC id-hash sample (keep a
    * vector iff `xxhash64(id) % sampleOneIn == 0`) — the documented
    * 100 TB default: k-means quality needs only a representative sample
    * (centroids are averages; a 1-in-N hash sample is unbiased), while
    * full-corpus Lloyd passes would dominate the index build. Recall
    * parity on sampled training is pinned by VectorIndexSpec. */
  def train(df: DataFrame, idCol: String, embCol: String, k: Int, iters: Int,
      sampleOneIn: Int = 1): Codebook = {
    require(sampleOneIn >= 1, s"sampleOneIn must be >= 1, got $sampleOneIn")
    val base =
      if (sampleOneIn == 1) df
      else df.filter(pmod(xxhash64(col(idCol)), lit(sampleOneIn)) === 0)
    var centroids: Array[Array[Double]] = base
      .orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(centroids.length >= k,
      s"corpus sample has ${centroids.length} vectors; k=$k cells need at least that many")
    for (_ <- 1 to iters) {
      val cb = Codebook(centroids)
      val assigned = assignCells(base, embCol, cb)
      val means = assigned
        .select(col("__cell"), posexplode(col(embCol)).as(Seq("pos", "x")))
        .groupBy("__cell", "pos")
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byCell.get(c) match {
          case Some(rows) =>
            val dim = rows.length
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => centroids(c) // empty cell keeps its centroid
        }
      }.toArray
    }
    Codebook(centroids)
  }

  /** Persist a codebook as parquet (cell, pos, weight) so a trained index
    * is reusable across jobs — train once on a sample, assign/search many
    * times (at 100 TB retraining per query would dominate). */
  def saveCodebook(spark: SparkSession, cb: Codebook, path: String): Unit = {
    val rows = cb.centroids.zipWithIndex.flatMap { case (cent, c) =>
      cent.zipWithIndex.map { case (x, pos) => (c, pos, x) }
    }.toSeq
    spark.createDataFrame(rows).toDF("cell", "pos", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCodebook(spark: SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path).collect() // k x dim doubles — tiny
    val k = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val cents = Array.fill(k)(new Array[Double](dim))
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    Codebook(cents)
  }

  /** Add the IVF cell id column (map-side, broadcast codebook). */
  def assignCells(df: DataFrame, embCol: String, cb: Codebook): DataFrame = {
    val nearestUdf = udf((v: Seq[Float]) => cb.nearest(v))
    df.withColumn("__cell", nearestUdf(col(embCol)))
  }

  /** Top-k cosine neighbors for each query, probing nProbe cells. The
    * per-query cut is a bounded-buffer partial aggregation
    * ([[graft.operators.TopK]]) — a rank window here would sort a query's
    * whole candidate list (~nProbe/k × corpus) in one task. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
      cb: Codebook, nProbe: Int, topK: Int): DataFrame = {
    val probeUdf = udf((v: Seq[Float]) => cb.nearestN(v, nProbe))
    // per-vector norms hoisted out of the candidate stage (r15, bit-exact
    // via cosineFromNorms)
    val indexed = assignCells(corpus, embCol, cb)
      .select(col("__cell"), col(idCol).as("neighbor_id"), col(embCol).as("ce"),
        sqrt(VectorFunctions.dotProduct(col(embCol), col(embCol))).as("n_nrm"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(embCol).as("qe"),
        sqrt(VectorFunctions.dotProduct(col(embCol), col(embCol))).as("q_nrm"))
      .withColumn("__cell", explode(probeUdf(col("qe"))))
    val sims = indexed.join(broadcast(probed), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosineFromNorms(
          VectorFunctions.dotProduct(col("qe"), col("ce")),
          col("q_nrm"), col("n_nrm")), 4).as("sim"))
    graft.operators.TopK.perGroup(sims, "query_id", "neighbor_id", "sim",
      topK, ascending = false)
  }

  /** Corpus-scale self search: EVERY corpus vector is also a query — the
    * shape of whole-corpus neighbor mining, where [[search]]'s broadcast
    * query batch would OOM (queries = corpus). Both sides take
    * [[assignCells]] and meet in a plain shuffled EQUI-JOIN on the cell
    * id: no broadcast, no driver collect, pair fan-out bounded per cell
    * at (N/k)·nProbe — size k to the block budget as the corpus grows.
    * `nProbe = cb.centroids.length` degenerates to exact all-pairs
    * (every pair meets in the corpus vector's one cell), which is the
    * oracle-checkable configuration. */
  def searchSelf(corpus: DataFrame, idCol: String, embCol: String,
      cb: Codebook, nProbe: Int, topK: Int): DataFrame = {
    val sims = selfScored(corpus, idCol, embCol, cb, nProbe)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    graft.operators.TopK.perGroup(sims, "query_id", "neighbor_id", "sim",
      topK, ascending = false)
  }

  /** Contrastive pair mining over the WHOLE corpus: per vector, the
    * hardest positive (nearest same-label) and hardest negative (nearest
    * other-label) among its probed cells — one row per (query,
    * pair_type). Same no-broadcast cell equi-join as [[searchSelf]];
    * the per-(query, type) top-1 is a bounded-buffer partial
    * aggregation, never a per-query candidate list in one task. */
  def minePairs(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, cb: Codebook, nProbe: Int,
      assignR: Int = 1): DataFrame = {
    // assignR > 1: a pair can meet in up to assignR cells — harmless for
    // the per-(query, type) top-1 (duplicates carry the identical sim)
    val scored = selfScored(corpus, idCol, embCol, cb, nProbe,
      extra = Seq(labelCol), assignR = assignR)
      .select(
        // composite (query, same-label?) key for the bounded top-1
        (col("query_id") * 2 +
          when(col(s"n_$labelCol") === col(s"q_$labelCol"), 1).otherwise(0)).as("grp"),
        col("neighbor_id"),
        when(col(s"n_$labelCol") === col(s"q_$labelCol"), lit("pos"))
          .otherwise(lit("neg")).as("pair_type"),
        col("sim"))
    graft.operators.TopK.perGroupWithPayload(scored, "grp", "neighbor_id",
        "sim", "pair_type", k = 1, ascending = false)
      .select(expr("CAST(grp DIV 2 AS BIGINT)").as("query_id"),
        col("pair_type"), col("neighbor_id"), col("sim"))
  }

  /** Shared self-join core: (query_id, neighbor_id, sim [, q_/n_extra]).
    * Corpus side sits in its `assignR` nearest cells (1 = classic IVF);
    * query side (the same rows) explodes to its nProbe nearest cells;
    * the equi-join on `__cell` shuffles both sides — each (q, c) pair
    * meets in at most assignR cells.
    *
    * The cell RANKING (k distances + a partial sort per vector) is the
    * self-mining wall floor when it runs once per join side; here it
    * runs ONCE per vector — the ranked-cells column materializes
    * (localCheckpoint: this row set IS the index, the thing a production
    * build persists) and both join sides slice it (top-assignR for the
    * posting side, top-nProbe for the probe side). */
  private def selfScored(corpus: DataFrame, idCol: String, embCol: String,
      cb: Codebook, nProbe: Int, extra: Seq[String] = Nil,
      assignR: Int = 1): DataFrame = {
    require(assignR >= 1, s"assignR must be >= 1, got $assignR")
    val nRank = math.max(nProbe, assignR)
    val rankUdf = udf((v: Seq[Float]) => cb.nearestN(v, nRank))
    val ranked = corpus
      .select(col(idCol) +: col(embCol) +: extra.map(col): _*)
      .withColumn("__cells", rankUdf(col(embCol)))
      // norms hoisted out of the pair stage (r15): one sqrt-of-dot per
      // VECTOR here instead of two full norm folds per candidate pair —
      // cosineFromNorms keeps the sim values bit-identical
      .withColumn("__nrm",
        sqrt(VectorFunctions.dotProduct(col(embCol), col(embCol))))
      .localCheckpoint()
    val indexed = ranked
      .select(explode(slice(col("__cells"), 1, assignR)).as("__cell") +:
        col(idCol).as("neighbor_id") +: col(embCol).as("ce") +:
        col("__nrm").as("n_nrm") +:
        extra.map(c => col(c).as(s"n_$c")): _*)
    val probed = ranked
      .select(explode(slice(col("__cells"), 1, nProbe)).as("__cell") +:
        col(idCol).as("query_id") +: col(embCol).as("qe") +:
        col("__nrm").as("q_nrm") +:
        extra.map(c => col(c).as(s"q_$c")): _*)
    indexed.join(probed, Seq("__cell")) // shuffled equi-join — NO broadcast
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(VectorFunctions.cosineFromNorms(
        VectorFunctions.dotProduct(col("qe"), col("ce")),
        col("q_nrm"), col("n_nrm")), 4))
  }

  /** Multi-assignment indexing (the IVF "cell replication" refinement):
    * each corpus vector lands in its `r` nearest cells instead of one,
    * so a neighbor is met when ANY of its r cells falls inside the
    * query's probe set. At fixed recall this lets nProbe — and with it
    * the probe fan-out (nProbe·N joined rows), the wall driver of
    * corpus-scale self-mining — shrink by roughly r×, for an index only
    * r× larger. r = 1 is classic single-assignment. */
  def assignCellsMulti(df: DataFrame, embCol: String, cb: Codebook, r: Int): DataFrame = {
    require(r >= 1, s"assignR must be >= 1, got $r")
    if (r == 1) assignCells(df, embCol, cb)
    else {
      val multiUdf = udf((v: Seq[Float]) => cb.nearestN(v, r))
      df.withColumn("__cell", explode(multiUdf(col(embCol))))
    }
  }
}

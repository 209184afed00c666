package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** Feature-hashed bag-of-words retrieval primitives (hashing trick,
  * Weinberger et al. ICML'09): token → ±1 on dim h%64 from one 60-bit
  * md5 hash — the model-free text→vector step, stored SPARSE as
  * (id, dim, weight) posting rows so the cosine dot product is an
  * equi-join ON DIM (a posting-list merge — only shared dimensions ever
  * pair, never a dense scan).
  *
  * Used by q_embed_hashed / q_rag_retrieval and by the live index
  * (docs upsert their packed posting vector per micro-batch; a
  * re-crawled doc REPLACES its postings — KTable semantics over the
  * index, RetrievalIndexSpec pins incremental ≡ batch).
  */
object FeatureHash {

  val Dims = 64

  /** Sparse (idCol, dim, weight) posting rows; zero weights dropped. */
  def bowRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(T.tokens(col(textCol))).as("__token"))
      .select(col(idCol), T.md5Long(col("__token")).as("__h"))
      .select(col(idCol), (col("__h") % Dims).cast("int").as("dim"),
        when(expr(s"(__h div $Dims) % 2") === 0, 1L).otherwise(-1L).as("__sgn"))
      .groupBy(col(idCol), col("dim")).agg(sum("__sgn").as("weight"))
      .filter(col("weight") =!= 0)

  /** Pack posting rows to one row per id: (idCol, postings array sorted
    * by dim, squared norm) — the upsertable index value. */
  def pack(rows: DataFrame, idCol: String): DataFrame =
    rows.groupBy(col(idCol)).agg(
      array_sort(collect_list(struct(col("dim"), col("weight")))).as("postings"),
      sum(col("weight") * col("weight")).as("nrm"))

  /** Unpack (idCol, postings, nrm) back to posting rows + a norm table —
    * the read side of the live index. */
  def unpack(packed: DataFrame, idCol: String): (DataFrame, DataFrame) = {
    val rows = packed
      .select(col(idCol), explode(col("postings")).as("p"))
      .select(col(idCol), col("p.dim").as("dim"), col("p.weight").as("weight"))
    val norms = packed.select(col(idCol), col("nrm"))
    (rows, norms)
  }

  /** Cosine top-k of `queryRows` against `corpusRows` (both in the
    * sparse (id, dim, weight) shape) via the dim equi-join; integer dots
    * and norms, one double divide, round 4 — rank ties on neighbor id.
    * Queries broadcast (a bounded batch); emits
    * (query_id, doc_id, sim, rank). */
  def topK(corpusRows: DataFrame, corpusNorms: DataFrame, queryRows: DataFrame,
      queryNorms: DataFrame, idCol: String, k: Int): DataFrame = {
    val qv = queryRows.select(col(idCol).as("query_id"),
      col("dim").as("qdim"), col("weight").as("qw"))
    val dot = corpusRows.join(broadcast(qv),
        col("dim") === col("qdim") && col("query_id") =!= col(idCol))
      .groupBy("query_id", idCol).agg(sum(col("qw") * col("weight")).as("dp"))
    val sims = dot
      .join(broadcast(queryNorms.select(col(idCol).as("query_id"),
        col("nrm").as("qn"))), "query_id")
      .join(corpusNorms, idCol)
      .select(col("query_id"), col(idCol),
        round(col("dp").cast("double") /
          (sqrt(col("qn").cast("double")) * sqrt(col("nrm").cast("double"))), 4)
          .as("sim"))
    graft.operators.TopK.perGroup(sims, "query_id", idCol, "sim",
      k = k, ascending = false)
  }

  /** Norm table from posting rows. */
  def norms(rows: DataFrame, idCol: String): DataFrame =
    rows.groupBy(col(idCol)).agg(sum(col("weight") * col("weight")).as("nrm"))
}

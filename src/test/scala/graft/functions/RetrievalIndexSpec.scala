package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.UpsertView

/** Live retrieval-index maintenance: documents upsert their packed
  * posting vector per micro-batch (KTable semantics — a re-crawled doc
  * REPLACES its postings), and serving from the accumulated view must
  * equal a from-scratch batch rebuild over the current corpus state.
  * This is the streaming twin of q_embed_hashed → q_rag_retrieval. */
class RetrievalIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  private def packedValue(docs: Seq[(Long, String)], atMs: Long) = {
    val df = docs.toDF("doc_id", "text")
    FeatureHash.pack(FeatureHash.bowRows(df, "doc_id", "text"), "doc_id")
      .select(col("doc_id"), struct(col("postings"), col("nrm")).as("value"),
        lit(ts(atMs)).as("ts"))
  }

  test("incremental posting upserts serve the same top-k as a batch rebuild") {
    val path = java.nio.file.Files.createTempDirectory("ridx").toString + "/view"
    val batchA = Seq(
      (1L, "apple banana cherry"), (2L, "apple apple dog"),
      (3L, "cherry dog egg"), (4L, "fig grape apple"))
    val batchB = Seq(
      (1L, "zebra yak xylophone"), // re-crawl: doc 1 text fully replaced
      (5L, "apple banana dog"))
    UpsertView.merge(packedValue(batchA, 1000L), path, numBuckets = 4,
      "doc_id", "value", "ts")
    UpsertView.merge(packedValue(batchB, 2000L), path, numBuckets = 4,
      "doc_id", "value", "ts")

    // serve from the accumulated view
    val packed = spark.read.parquet(path)
      .select(col("doc_id"), col("value.postings").as("postings"),
        col("value.nrm").as("nrm"))
    val (rows, norms) = FeatureHash.unpack(packed, "doc_id")
    val isQuery = col("doc_id") === 4L
    val served = FeatureHash.topK(rows, norms, rows.filter(isQuery),
        norms.filter(isQuery), "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

    // batch rebuild over the CURRENT corpus state (doc 1 replaced, 5 added)
    val current = (batchA.filterNot(_._1 == 1L) ++ batchB).toDF("doc_id", "text")
    val bRows = FeatureHash.bowRows(current, "doc_id", "text")
    val bNorms = FeatureHash.norms(bRows, "doc_id")
    val rebuilt = FeatureHash.topK(bRows, bNorms, bRows.filter(isQuery),
        bNorms.filter(isQuery), "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

    assert(served.sorted.toSeq === rebuilt.sorted.toSeq)
    // the stale doc-1 postings ("apple banana cherry") are really gone:
    // doc 1's served neighbors reflect its NEW text, which shares no
    // tokens with anything — it must not appear in doc 4's top-3 via the
    // old apple/banana overlap
    val doc4Neighbors = served.filter(_._1 == 4L).map(_._2).toSet
    assert(!doc4Neighbors.contains(1L) ||
      rebuilt.filter(_._1 == 4L).map(_._2).toSet.contains(1L))
  }
}

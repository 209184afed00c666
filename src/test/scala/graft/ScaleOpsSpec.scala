package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SkewOps
import graft.sources.Bucketing

/** Scale tooling: bucketed co-located joins must plan WITHOUT a shuffle;
  * salting must preserve results while spreading hot keys. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val dir = "/root/testdata/sf0.001"
    // clear any orphaned warehouse locations from previous test JVMs
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "ord_bucketed", "o_orderkey", 8, Seq("o_orderkey"))

    val joined = Bucketing.read(spark, "li_bucketed")
      .join(Bucketing.read(spark, "ord_bucketed")
        .hint("merge"), // force SMJ so the exchange question is observable
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1200))

    // and it computes the right thing
    val expected = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === expected)
  }

  test("jaccard dedup df-cut drops stop-shingle buckets before pairing") {
    // 60 docs all opening with the same 3 words (one stop-shingle shared
    // by all of them) plus a unique tail; without the df-cut the stop
    // bucket alone would fan out 60*59/2 = 1770 candidate pairs. Two docs
    // additionally share a rare shingle -> the only surviving pair.
    val docs = Seq.tabulate(60) { i =>
      val tail = if (i >= 58) "rare shared suffix words here" else s"unique$i tail$i words$i"
      (i.toLong, s"common stop shingle $tail", "en", "synthetic", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("jacdf").toFile
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((58L, 59L)))
  }

  test("salted two-phase aggregation matches direct aggregation") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedAggregate(df, "k", 8,
        partialExprs = Seq(sum("v").as("s"), count(lit(1)).as("n")),
        mergeExprs = Seq(sum("s").as("s"), sum("n").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("salted join matches plain join on skewed keys") {
    val big = Seq.tabulate(500)(i => (if (i % 5 == 0) 1L else (i % 20).toLong, s"row$i"))
      .toDF("k", "payload")
    val small = Seq.tabulate(20)(i => (i.toLong, s"dim$i")).toDF("dk", "dim")
    val plain = big.join(small, col("k") === col("dk"))
      .select("payload", "dim").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val salted = SkewOps.saltedJoin(big, small, "k", "dk", 4)
      .select("payload", "dim").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted === plain)
  }
}

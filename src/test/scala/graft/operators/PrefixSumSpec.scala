package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The scalable global running sum must equal the single-task window
  * definition for ANY input partitioning — that equivalence is the whole
  * point of the two-pass shape. */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteForce(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, v) =>
      val p = acc; acc += v; id -> p
    }.toMap
  }

  test("exclusive prefix equals the ordered fold, across partitionings") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 500L).map(id => (id, rng.nextInt(100).toLong))
    val want = bruteForce(rows)
    for (parts <- Seq(1, 3, 32)) {
      val df = rows.toDF("id", "v").repartition(parts) // scrambled input
      val got = PrefixSum.exclusive(df, Seq("id"), "v", "prefix")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("empty and single-row inputs") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(PrefixSum.exclusive(empty, Seq("id"), "v", "p").count() === 0)
    val one = Seq((5L, 42L)).toDF("id", "v")
    val r = PrefixSum.exclusive(one, Seq("id"), "v", "p").head()
    assert(r.getLong(2) === 0L) // exclusive: first row sees 0
  }
}

package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** GraftBloom: distributed build, no false negatives, bounded false
  * positives, codegen'd probe. */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("no false negatives; false-positive rate bounded") {
    import spark.implicits._
    val members = (0 until 1000).map(i => graft.plans.HashKernels.fnv64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"member-$i")))
    val bloom = GraftBloom.build(
      members.toDF("hv").repartition(7), "hv", numBits = 1 << 15, k = 3)
    // every member passes (distributed build lost nothing in the OR-merge)
    assert(members.forall(GraftBloom.mightContain(bloom, _, 3)))
    // non-members: fp rate for n=1000, m=2^15, k=3 is ~0.07%; assert a
    // loose 2% bound so the test never flakes
    val probes = (0 until 5000).map(i => graft.plans.HashKernels.fnv64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"outsider-$i")))
    val fp = probes.count(GraftBloom.mightContain(bloom, _, 3))
    assert(fp < 100, s"false-positive count $fp out of 5000")
  }

  test("column probe matches the kernel and survives codegen") {
    import spark.implicits._
    val bloom = GraftBloom.build(
      Seq(1L, 2L, 3L, Long.MaxValue, -42L).toDF("hv"), "hv", 1 << 10, 3)
    val df = Seq(1L, 2L, 3L, Long.MaxValue, -42L, 999L, -1L).toDF("h")
      .withColumn("m", GraftBloom.mightContainCol(col("h"), bloom, 3))
    val got = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(Seq(1L, 2L, 3L, Long.MaxValue, -42L).forall(got(_)))
    val kernelAgree = df.collect().forall(r =>
      r.getBoolean(1) == GraftBloom.mightContain(bloom, r.getLong(0), 3))
    assert(kernelAgree)
  }
}

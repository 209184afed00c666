package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Brute-force property pin for the prefix-filtered set-similarity join
  * (q_dedup_prefix_filter): against an independent all-pairs Jaccard scan,
  *
  *   - SOUNDNESS: every emitted pair really has J >= 0.7 with the emitted
  *     exact intersection size, and
  *   - COMPLETENESS modulo the documented 2..50 skew cut: every
  *     qualifying pair with at least one shared prefix token whose prefix
  *     posting list has 2..50 docs IS emitted. (PPJoin's guarantee is
  *     exact without the cut; the cut is the family-wide hot-bucket bound
  *     and is mirrored verbatim in the oracle — on a Zipf vocabulary the
  *     prefix is a rare token and the cut is rarely binding, while this
  *     synthetic corpus's tiny vocabulary makes it bind hard, which is
  *     exactly why the property must be pinned modulo the cut.)
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("prefix-filter join: sound, and complete modulo the 2..50 cut") {
    // independent reimplementation: plain Scala over the collected docs
    val docs = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSet)
      .toMap
    val df = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    docs.values.foreach(_.foreach(w => df(w) += 1))
    def prefix(s: Set[String]): Set[String] = {
      val m = s.size
      val p = m - ((7 * m + 9) / 10) + 1
      s.toSeq.sortBy(w => (df(w), w)).take(p).toSet
    }
    val pref = docs.map { case (d, s) => d -> prefix(s) }
    val postings = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    pref.values.foreach(_.foreach(w => postings(w) += 1))
    def jaccardMicro(a: Set[String], b: Set[String]): (Long, Long) = {
      val ni = (a & b).size.toLong
      (ni, ni * 1000000L / (a.size + b.size - ni))
    }
    val ids = docs.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      (ni, jm) = jaccardMicro(docs(a), docs(b))
      if jm >= 700000L &&
        (pref(a) & pref(b)).exists(w => postings(w) >= 2 && postings(w) <= 50)
    } yield ((a, b), (ni, jm))).toMap

    val got = graft.SparkEntry.queries("q_dedup_prefix_filter")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap

    // soundness: emitted pairs carry the true intersection and qualify
    got.foreach { case (p, (ni, jm)) =>
      val (eni, ejm) = jaccardMicro(docs(p._1), docs(p._2))
      assert(ni === eni && jm === ejm && jm >= 700000L, s"pair $p")
    }
    // completeness modulo the cut: exact set equality with the replica
    assert(got.keySet === expected.keySet,
      s"missing=${(expected.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
  }
}

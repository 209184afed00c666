package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication primitives for document corpora at scale: shingling,
  * MinHash, SimHash, n-gram Jaccard.
  *
  * Design constraints:
  *   - Column expressions only (codegen'd, distributed, no UDFs).
  *   - Deterministic: hashes derive from md5 so the DuckDB oracle can
  *     reproduce them bit-for-bit (`CAST('0x'||substr(md5(s),1,15) AS
  *     BIGINT)` == Spark `conv(substring(md5(s),1,15),16,10)`).
  *   - LSH banding turns the O(n^2) pair space into an equi-join on
  *     (band, band-hash) — a shuffle join on a compact key, which is the
  *     100 TB-viable path (candidate pairs only, then exact rescoring).
  */
object DedupFunctions {
  import TextFunctions.{md5Long, normalizeText, tokens}

  private val Prime = 2147483647L // 2^31 - 1 (Mersenne)

  /** Distinct word n-gram shingles of the normalized text. */
  def wordShingles(c: Column, n: Int): Column = {
    val ts = tokens(normalizeText(c))
    val count = size(ts) - (n - 1)
    array_distinct(
      when(count <= 0, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(1), count), i =>
          concat_ws(" ", slice(ts, i, lit(n))))))
  }

  /** Distinct character k-gram shingles of the normalized text. */
  def charShingles(c: Column, k: Int): Column = {
    val s = normalizeText(c)
    val count = length(s) - (k - 1)
    array_distinct(
      when(count <= 0, array(s))
        .otherwise(transform(sequence(lit(1), count), i => s.substr(i, lit(k)))))
  }

  /** Universal-hash parameters for the i-th MinHash function (fixed,
    * engine-independent). */
  def minhashParams(i: Int): (Long, Long) = (2L * i + 1, 12345L + 7919L * i)

  /** Base hashes of the shingle array, folded into [0, P). Computed once
    * per shingle; the k signature rows are cheap affine transforms of
    * these (md5 is ~100x the cost of the multiply-add, so hashing once
    * instead of k times dominates MinHash throughput). */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => md5Long(s) % Prime)

  /** One MinHash value from pre-computed base hashes: min of (a*h + b)
    * mod P. */
  def minhashOne(hashes: Column, i: Int): Column = {
    val (a, b) = minhashParams(i)
    array_min(transform(hashes, h => (h * a + b) % Prime))
  }

  /** MinHash signature of length k as an array column. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hs = shingleHashes(shingles)
    array((0 until k).map(i => minhashOne(hs, i)): _*)
  }

  /** LSH band key: hash of one band (contiguous rows of the signature).
    * Docs sharing any band key are candidate pairs. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        md5Long(concat_ws(",",
          transform(slice(signature, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
          .as("bandhash"))
    }: _*)

  /** Exact Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash over the word multiset: for each bit position, sum +1/-1
    * according to the md5-derived hash bit of each token; the sign of the
    * sum is the fingerprint bit. Near-dups differ in few bits. */
  def simhash64(c: Column, bits: Int = 60): Column = {
    val ts = tokens(normalizeText(c))
    val hashes = transform(ts, t => md5Long(t))
    (0 until bits).map { bit =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two long-encoded fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}

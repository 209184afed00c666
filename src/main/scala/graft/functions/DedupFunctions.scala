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

  /** Distinct word n-gram shingles of the normalized text.
    *
    * The token array is lambda-bound so it's computed once per row — a
    * subtree referenced inside a `transform` lambda is otherwise
    * re-evaluated per output element (one regex tokenization per shingle). */
  def wordShingles(c: Column, n: Int): Column =
    bindOnce(tokens(normalizeText(c))) { ts =>
      val count = size(ts) - (n - 1)
      array_distinct(
        when(count <= 0, array(concat_ws(" ", ts)))
          .otherwise(transform(sequence(lit(1), count), i =>
            concat_ws(" ", slice(ts, i, lit(n))))))
    }

  /** Distinct character k-gram shingles of the normalized text. */
  def charShingles(c: Column, k: Int): Column =
    bindOnce(normalizeText(c)) { s =>
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

  /** Bind `c`'s value once and use it several times inside `f` — the
    * array-wrap lambda idiom. Catalyst's CollapseProject freely inlines
    * aliased expressions into every use site, so an expensive subtree
    * (md5 over every shingle) referenced k times would be *evaluated* k
    * times; a lambda variable is bound exactly once per row. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** MinHash signature of length k as an array column. Base md5 hashes are
    * computed once per shingle; the k rows are affine transforms
    * (a_i = 2i+1, b_i from [[minhashParams]]). */
  def minhashSignature(shingles: Column, k: Int): Column =
    bindOnce(shingleHashes(shingles)) { hs =>
      transform(sequence(lit(0), lit(k - 1)), i =>
        array_min(transform(hs, h =>
          (h * (i * 2 + 1) + (lit(12345L) + lit(7919L) * i)) % Prime)))
    }

  /** LSH band key: hash of one band (contiguous rows of the signature).
    * Docs sharing any band key are candidate pairs. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    bindOnce(signature) { sig =>
      array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          md5Long(concat_ws(",",
            transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), _.cast("string"))))
            .as("bandhash"))
      }: _*)
    }

  /** All ordered pairs (a < b) from a bucket's id list — candidate-pair
    * generation after grouping by band/shingle/bucket key. One pass over
    * the corpus + one shuffle on the bucket key, instead of a self-join
    * that recomputes the signature pipeline for both sides. Bucket size
    * is expected small; enormous buckets (stopword shingles) should be
    * doc-frequency-cut upstream. */
  def orderedPairs(ids: Column): Column =
    bindOnce(array_sort(ids)) { s =>
      flatten(transform(s, (x, i) =>
        transform(
          slice(s, i + 2, greatest(size(s) - i - 1, lit(0))),
          y => struct(x.as("a"), y.as("b")))))
    }

  /** Exact Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash over the word multiset: for each bit position, sum +1/-1
    * according to the md5-derived hash bit of each token; the sign of the
    * sum is the fingerprint bit. Near-dups differ in few bits.
    *
    * Single-pass shape: one md5 per token, one fold producing the 60 vote
    * counters as an array, one weighted sum — not 60 folds over the token
    * hashes. */
  def simhash64(c: Column, bits: Int = 60): Column =
    // digest-direct one-pass kernel (r16) — bit-identical to the
    // interpreted fold it replaces (tokens(normalizeText) → md5Long per
    // token → zip_with vote → pack); equivalence pinned by
    // NativeHashSpec's kernel-vs-column property. The md5 hash family
    // (the oracle contract) is unchanged.
    graft.plans.NativeHash.md5SimHash64(c.cast("string"), bits)

  /** Hamming distance between two long-encoded fingerprints. */
  def hammingDist(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}

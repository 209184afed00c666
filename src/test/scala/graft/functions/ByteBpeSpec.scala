package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}
import graft.functions.{TextFunctions => T}

/** Byte-level BPE (GPT-2 family): the pre-tokenizer contract, the
  * hex-pair byte alphabet, lossless coverage (concatenating pre-tokens
  * reproduces the document; concatenating a segmentation's symbols
  * reproduces the pre-token's exact UTF-8 bytes), and the structural
  * zero-OOV property the q_bpe_byte_stats catalog query reports. */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def pretokens(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(T.bytePretokens(col("text")).as("pt"))
      .head().getSeq[String](0)

  test("pre-tokenizer: contractions, space-prefixed runs, whitespace runs") {
    // hand-pinned against the pattern's documented semantics (GPT-2's
    // encoder.py behavior minus the trailing-space lookahead: an N-space
    // run before a word stays one whitespace pre-token)
    assert(pretokens("Hello  world, don't stop 123 naïve\tok\n") ===
      Seq("Hello", "  ", "world", ",", " don", "'t", " stop", " 123",
        " naïve", "\t", "ok", "\n"))
    // digits split from letters; punctuation runs group; apostrophe not
    // followed by a contraction suffix falls to the punctuation branch
    assert(pretokens("v2.0 isn't... 'x") ===
      Seq("v", "2", ".", "0", " isn", "'t", "...", " '", "x"))
  }

  test("pre-tokenization is lossless: concatenation reproduces the text") {
    val texts = Seq("a  b\t\tc", "don't; it's été 2024!",
      "\n\nleading and trailing \n")
    for (t <- texts) assert(pretokens(t).mkString === t)
  }

  test("byteInit: UTF-8 bytes as space-joined uppercase hex pairs") {
    def init(w: String): String =
      Seq(w).toDF("w").select(T.byteInit(col("w"))).head().getString(0)
    assert(init("ab") === "61 62")
    assert(init(" A") === "20 41")
    assert(init("é") === "C3 A9") // é = 2-byte UTF-8
    assert(init("€") === "E2 82 AC") // € = 3-byte UTF-8
  }

  test("merge fold works unchanged on hex symbols (incl. self-chains)") {
    def merge(sw: String, a: String, b: String): String =
      Seq(sw).toDF("sw").select(T.bpeMerge(col("sw"), a, b)).head().getString(0)
    assert(merge("61 62 63", "61", "62") === "6162 63")
    // greedy left-to-right, non-overlapping: "20 20 20" + (20,20) -> "2020 20"
    assert(merge("20 20 20", "20", "20") === "2020 20")
    // a merged symbol never re-matches its left part within the round
    assert(merge("61 62 62", "61", "62") === "6162 62")
  }

  test("catalog: byte encoder covers every pre-token losslessly") {
    val enc = SparkEntry.queries("q_bpe_byte_encode")(spark, dir)
      .select(col("w"), col("segmentation"), col("n_symbols")).collect()
    assert(enc.nonEmpty)
    for (r <- enc) {
      val w = r.getString(0); val seg = r.getString(1)
      val syms = seg.split(" ")
      assert(syms.length === r.getLong(2))
      // every symbol is whole hex bytes; the concatenation is the word
      assert(syms.forall(s => s.length % 2 == 0 && s.matches("[0-9A-F]+")))
      val bytes = syms.mkString.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8) === w)
    }
  }

  test("degenerate corpus: rounds beyond the last possible merge are " +
      "no-ops, not crashes (LEFT JOIN identity-fold parity)") {
    // single-character words -> ZERO adjacent pairs from round 1; the
    // 10-round replay must return the words unmerged (the oracle's
    // LEFT JOIN ON TRUE fold is the identity the same way), where the
    // pre-fix .head() threw NoSuchElementException
    val dirDegP = java.nio.file.Files.createTempDirectory("bpedeg")
    val dirDeg = dirDegP.toString
    try {
      Seq((1L, "a b a", "s1", "en"), (2L, "b a", "s1", "en"))
        .toDF("doc_id", "text", "source", "lang")
        .write.mode("overwrite").parquet(s"$dirDeg/documents.parquet")
      val enc = SparkEntry.queries("q_bpe_encode")(spark, dirDeg).collect()
      assert(enc.map(_.getString(0)).sorted === Seq("a", "b"))
      assert(enc.forall(_.getLong(2) === 1L)) // n_symbols: never merged
      // byte twin: " a"/"a"/"b"/" b" pre-tokens are all 1-byte, same story
      val benc = SparkEntry.queries("q_bpe_byte_encode")(spark, dirDeg).collect()
      assert(benc.nonEmpty && benc.forall(_.getLong(2) === 1L))
      // trainer: rounds past the last pair emit no candidate rows
      val merges = SparkEntry.queries("q_bpe_merges")(spark, dirDeg).collect()
      assert(merges.isEmpty)
    } finally { // r13 ADVICE: don't leave the parquet tree in /tmp
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dirDegP).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => p.toFile.delete())
    }
  }

  test("catalog: stats report zero OOV and byte-bounded fertility") {
    val rows = SparkEntry.queries("q_bpe_byte_stats")(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val nPre = r.getAs[Long]("n_pretokens")
      val nBytes = r.getAs[Long]("n_bytes")
      val nTok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("n_oov") === 0L) // byte-level: total coverage
      assert(nTok >= nPre, "every pre-token yields >= 1 token")
      assert(nTok <= nBytes, "merges only shrink the byte-symbol count")
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Double]("bytes_per_token") >= 1.0)
    }
  }
}

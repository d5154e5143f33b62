package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** FastMd5 is bit-identical to java.security.MessageDigest — across block
  * boundaries, empty input, non-ASCII bytes — and its byte-level tokenizer
  * matches the Java-regex Tok contract the old String path used.
  */
class Md5ParitySpec extends AnyFunSuite {

  private def refHead(bytes: Array[Byte], bits: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val h48 = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    if (bits == 48) h48
    else (h48 << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  test("hash48/hash64 match MessageDigest at every padding boundary") {
    val rnd = new scala.util.Random(42)
    // lengths straddling the 55/56/63/64 single-block boundaries and
    // multi-block sizes, plus a sweep of small gram-like lengths
    val lengths = (0 to 70) ++ Seq(119, 120, 127, 128, 129, 200, 1000, 4096)
    for (len <- lengths) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      assert(FastMd5.hash48(b, 0, len) == refHead(b, 48), s"hash48 len=$len")
      assert(FastMd5.hash64(b, 0, len) == refHead(b, 64), s"hash64 len=$len")
    }
  }

  test("offset ranges hash the slice, not the array") {
    val b = "0123456789abcdefghij".getBytes("UTF-8")
    assert(FastMd5.hash48(b, 3, 7) == refHead(b.slice(3, 10), 48))
  }

  test("string overload is UTF-8, matching gram.getBytes hashing") {
    for (s <- Seq("", "a", "the", "thé café", "日本語テキスト", "x" * 100)) {
      assert(FastMd5.hash48(s) == refHead(s.getBytes("UTF-8"), 48), s"'$s'")
    }
  }

  test("hashGram equals hashing the space-joined token strings") {
    val text = "alpha  beta\tgamma\n delta"
    val bytes = text.getBytes("UTF-8")
    val starts = new Array[Int](16); val ends = new Array[Int](16)
    val n = FastMd5.tokenSpans(bytes, bytes.length, starts, ends)
    assert(n == 4)
    val toks = Seq("alpha", "beta", "gamma", "delta")
    for (m <- 1 to 4; i <- 0 to (n - m)) {
      val joined = toks.slice(i, i + m).mkString(" ")
      assert(FastMd5.hashGram(bytes, starts, ends, i, m, 48) ==
        refHead(joined.getBytes("UTF-8"), 48), s"m=$m i=$i")
      assert(FastMd5.hashGram(bytes, starts, ends, i, m, 64) ==
        refHead(joined.getBytes("UTF-8"), 64), s"m=$m i=$i (64)")
    }
  }

  test("tokenize matches the Java-regex Tok split on every whitespace class") {
    val cases = Seq(
      "", "   ", "\t\n", "one", " one ", "a b", "ab\fc\rd",
      "多字节 tokens mixed\twith  ascii", "trailing space ", "\n\nleading")
    for (s <- cases) {
      val expected0 = TextExpressions.Tok.tokens(s)
      val expected =
        if (expected0.length == 1 && expected0(0).isEmpty) Array.empty[String]
        else expected0
      val (bytes, starts, ends, n) = FastMd5.tokenize(UTF8String.fromString(s))
      val got = (0 until n).map(i =>
        new String(bytes, starts(i), ends(i) - starts(i), "UTF-8"))
      assert(got == expected.toSeq, s"'$s'")
    }
  }

  test("randomized cross-check against the old String-based bucket path") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab éθ\t\n x "
    for (_ <- 1 to 500) {
      val s = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val (bytes, starts, ends, n) = FastMd5.tokenize(UTF8String.fromString(s))
      val toks0 = TextExpressions.Tok.tokens(s)
      val toks = if (toks0.length == 1 && toks0(0).isEmpty) Array.empty[String] else toks0
      assert(n == toks.length, s"'$s'")
      for (i <- 0 until n) {
        assert(FastMd5.hash48(bytes, starts(i), ends(i) - starts(i)) ==
          refHead(toks(i).getBytes("UTF-8"), 48), s"'$s' tok $i")
      }
    }
  }
}

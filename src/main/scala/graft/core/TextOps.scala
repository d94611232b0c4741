package graft.core

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels (tokenize / n-gram / shingle / hash / dedup
  * signatures) as JVM statics for `StaticInvoke` registration — see
  * graft.functions.TextFunctions for the SQL surface and
  * graft.core.VecOps for why statics beat SQL-macro lambda HOFs here
  * (boxing per element + janino compile time of the expanded plans).
  *
  * SEMANTICS CONTRACT: every function reproduces the exact Spark-SQL macro
  * it replaced, which in turn mirrors the DuckDB oracle formulation:
  *  - `tokens` = `split(trim(s), '\\s+')`: trim strips ONLY ' ' (SQL trim),
  *    split keeps trailing empty strings (Spark split limit = -1), and an
  *    empty/all-space input yields [""] (one empty token), not [].
  *  - `ngrams`/`substring` operate on Unicode code points (Spark `length`/
  *    `substring` semantics), not UTF-16 chars.
  *  - `hash32` = `conv(substring(md5(s), 1, 8), 16, 10)`: the first 4 md5
  *    bytes as an unsigned 32-bit value in a long.
  *  - folds accumulate left-to-right for bit-identical doubles.
  */
object TextOps {

  private val ws = Pattern.compile("\\s+")
  private val punct = Pattern.compile("[.,!?;]")
  private val md5tl = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** SQL `trim`: strip leading/trailing ' ' only (NOT \t/\n — unlike
    * java.lang.String.trim). */
  private def sqlTrim(s: String): String = {
    var from = 0
    var until = s.length
    while (from < until && s.charAt(from) == ' ') from += 1
    while (until > from && s.charAt(until - 1) == ' ') until -= 1
    s.substring(from, until)
  }

  private def tokenize(s: UTF8String): Array[String] =
    ws.split(sqlTrim(s.toString), -1) // -1: keep trailing empties like Spark

  private def md5hex8AsLong(s: String): Long = {
    val d = md5tl.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) | ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }

  private def toArrayData(a: Array[String]): ArrayData =
    new GenericArrayData(a.map(UTF8String.fromString(_).asInstanceOf[AnyRef]))

  // ── SQL-visible kernels ───────────────────────────────────────────────

  /** 32-bit-in-long portable hash: first 8 hex chars of md5. */
  def hash32(s: UTF8String): Long = md5hex8AsLong(s.toString)

  def tokens(s: UTF8String): ArrayData = toArrayData(tokenize(s))

  def tokenCount(s: UTF8String): Int = tokenize(s).length

  /** GPT-2-style BPE pre-tokenizer, restricted to the regex subset Java
    * and RE2 (DuckDB `regexp_extract_all`) evaluate IDENTICALLY: no
    * lookahead (the original GPT-2 pattern's `\s+(?!\S)` is unsupported
    * by RE2), explicit ASCII classes instead of `\p{L}`/`\s` (whose
    * definitions differ by a vertical tab between engines), and
    * leftmost-first alternation — contractions, space-prefixed letter
    * runs, space-prefixed digit runs, space-prefixed punctuation runs,
    * then whitespace runs. "it's 3.14, ok!" →
    * [it][&#39;s][ 3][.][14][,][ ok][!]. Whitespace-run matches count as
    * tokens on both engines (single inter-word spaces are consumed by the
    * ` ?` prefixes and never surface). */
  private val bpeRe = java.util.regex.Pattern.compile(
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+")

  /** The exact pattern string an SQL oracle passes to RE2 — exposed so the
    * query text and this kernel can never drift apart. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+|[ \\t\\n\\r]+"

  private def bpeSplit(s: String): Array[String] = {
    val m = bpeRe.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  def bpeTokens(s: UTF8String): ArrayData = toArrayData(bpeSplit(s.toString))

  def bpeCount(s: UTF8String): Int = bpeSplit(s.toString).length

  /** Character n-grams over code points; length(s) < n → empty. Deliberately
    * NOT deduplicated (consumers are duplicate-insensitive; dedup is O(n²)). */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < n) new GenericArrayData(Array.empty[AnyRef])
    else {
      val out = new Array[AnyRef](cps.length - n + 1)
      var i = 0
      while (i + n <= cps.length) {
        out(i) = UTF8String.fromString(new String(cps, i, n))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Fixed-size sliding character chunks — the context-window split that
    * feeds embedding / retrieval pipelines (chunk k starts at code point
    * k·stride, spans `size` code points; stride < size ⇒ overlapping
    * windows, the RAG default). Counts CODE POINTS via `substringSQL`,
    * Spark's own SUBSTRING semantics — the DuckDB mirror is
    * `substr(text, k*stride + 1, size)` over
    * `generate_series(0, (len(text)-1) // stride)`, which indexes code
    * points the same way, so chunk boundaries agree byte-for-byte even
    * on multi-byte (CJK) text. Empty input → no chunks. */
  def chunks(s: UTF8String, size: Int, stride: Int): ArrayData = {
    val n = s.numChars()
    if (n == 0 || size <= 0 || stride <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val m = (n - 1) / stride + 1
    val out = new Array[AnyRef](m)
    var k = 0
    while (k < m) { out(k) = s.substringSQL(k * stride + 1, size); k += 1 }
    new GenericArrayData(out)
  }

  /** Word k-shingles — the document-dedup unit (word, not char, shingles:
    * char n-grams of a small shared vocabulary make unrelated docs look
    * similar and blow up LSH candidate counts). */
  def shingles(s: UTF8String, k: Int): ArrayData = {
    val ts = tokenize(s)
    if (ts.length < k) new GenericArrayData(Array.empty[AnyRef])
    else {
      val out = new Array[AnyRef](ts.length - k + 1)
      var i = 0
      while (i + k <= ts.length) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(ts(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)|; 0 for two
    * empties (mirrors the array_intersect/array_union macro). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { sa.add(a.getUTF8String(i)); i += 1 }
    val sb = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < b.numElements()) { sb.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size() + sb.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** 32-bit simhash over whitespace tokens: one md5 per token, 32 signed
    * counters, bit set where the counter is positive. */
  def simhash(s: UTF8String): Long = {
    val ts = tokenize(s)
    val counters = new Array[Long](32)
    var i = 0
    while (i < ts.length) {
      val h = md5hex8AsLong(ts(i))
      var b = 0
      while (b < 32) {
        counters(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) { if (counters(b) > 0) acc += (1L << b); b += 1 }
    acc
  }

  /** minhash signature: h min-hashes over char n-grams — one md5 per
    * shingle, per-seed affine permutations (a_k·x+b_k) mod 4294967311,
    * single pass keeping h running minimums (init = the modulus). */
  def minhash(s: UTF8String, n: Int, h: Int): ArrayData = {
    val P = 4294967311L
    val mins = Array.fill(h)(P)
    val cps = s.toString.codePoints().toArray
    var i = 0
    while (i + n <= cps.length) {
      val x = md5hex8AsLong(new String(cps, i, n))
      var k = 0
      while (k < h) {
        val v = (((k + 1).toLong * 1000003L % 16777216L) * x + k.toLong * 30011L + 1L) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Same affine-permutation minhash over a PRECOMPUTED shingle array (the
    * t07 topology keeps the shingles for the jaccard verify step): md5 once
    * per shingle, h running minimums in one pass. Arithmetic must stay
    * exactly `(((k+1)·1000003 % 2^24)·x + k·30011 + 1) % 4294967311` — the
    * DuckDB oracle mirrors it term-by-term. */
  def minhashSigs(ng: ArrayData, h: Int): ArrayData = {
    val P = 4294967311L
    val mins = Array.fill(h)(P)
    val n = ng.numElements()
    var i = 0
    while (i < n) {
      val x = md5hex8AsLong(ng.getUTF8String(i).toString)
      var k = 0
      while (k < h) {
        val v = (((k + 1).toLong * 1000003L % 16777216L) * x + k.toLong * 30011L + 1L) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val stopSet: java.util.Set[String] =
    java.util.Set.of("the", "a", "of", "and", "in", "to", "is")

  /** stopword ratio over a fixed english stop set. */
  def stopRatio(s: UTF8String): Double = {
    val ts = tokenize(s)
    var stops = 0
    var i = 0
    while (i < ts.length) { if (stopSet.contains(ts(i))) stops += 1; i += 1 }
    stops.toDouble / math.max(ts.length, 1)
  }

  /** composite quality score in [0,1]:
    * 0.3·stopRatio + 0.4·min(1, tokens/100) + 0.3·(1 − min(1, punct/tokens)). */
  def quality(s: UTF8String): Double = {
    val ts = tokenize(s)
    var stops = 0
    var i = 0
    while (i < ts.length) { if (stopSet.contains(ts(i))) stops += 1; i += 1 }
    val nTok = math.max(ts.length, 1)
    val m = punct.matcher(s.toString)
    var nPunct = 0
    while (m.find()) nPunct += 1
    0.3 * (stops.toDouble / nTok) +
      0.4 * math.min(1.0, ts.length / 100.0) +
      0.3 * (1.0 - math.min(1.0, nPunct / nTok.toDouble))
  }

  /** rolling-hash fingerprint of the first 64 tokens:
    * fold (acc·31 + hash32(t)) mod 1e9+7, acc₀ = 7. */
  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every k-gram of code points with a base-31 polynomial (no modulus —
    * values stay < 2^53, so the DuckDB oracle's exact-integer arithmetic
    * reproduces them bit-for-bit), take the min of each w-window of
    * consecutive hashes, and return the distinct mins in first-seen order.
    * Guarantees any shared substring of length ≥ k + w - 1 contributes at
    * least one common fingerprint — the partial-overlap dedup primitive
    * (complements [[fingerprint]], which is whole-doc).
    * Fewer than w hashes → one window over all of them; length < k → []. */
  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    require(k > 0 && w > 0, s"fingerprints: k=$k, w=$w must be positive")
    val cps = s.toString.codePoints().toArray
    val nh = cps.length - k + 1
    if (nh <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](nh)
    var p = 0
    while (p < nh) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31L + cps(p + j); j += 1 }
      hs(p) = h
      p += 1
    }
    val windows = math.max(nh - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < windows) {
      var min = hs(i)
      var j = i + 1
      val end = math.min(i + w, nh)
      while (j < end) { if (hs(j) < min) min = hs(j); j += 1 }
      seen.add(min)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }

  def fingerprint(s: UTF8String): Long = {
    val ts = tokenize(s)
    val n = math.min(64, ts.length)
    var acc = 7L
    var i = 0
    while (i < n) { acc = (acc * 31L + md5hex8AsLong(ts(i))) % 1000000007L; i += 1 }
    acc
  }

  // ── repetition signals (Gopher/MassiveText-style quality filters) ──────
  // Word n-grams use the same semantics as [[shingles]] (tokenize, join k
  // consecutive tokens with ' '), so the DuckDB oracle mirrors them with
  // string_split_regex + list slices.

  /** Builds the word-n-gram multiset counts; shared by the two ratios. */
  private def ngramCounts(s: UTF8String, n: Int): (java.util.HashMap[String, Int], Int) = {
    val ts = tokenize(s)
    val total = ts.length - n + 1
    val m = new java.util.HashMap[String, Int]()
    if (total <= 0) return (m, 0)
    var i = 0
    while (i < total) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(ts(i + j)); j += 1 }
      m.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    (m, total)
  }

  /** Fraction of word n-grams taken by the single most frequent one
    * (Gopher "top n-gram fraction"); 0 when the doc has no n-grams. */
  def topNgramFrac(s: UTF8String, n: Int): Double = {
    val (m, total) = ngramCounts(s, n)
    if (total == 0) return 0.0
    var mx = 0
    val it = m.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > mx) mx = c }
    mx.toDouble / total
  }

  /** Fraction of word n-grams that are repeats of an earlier one
    * (Gopher "duplicate n-gram fraction" = 1 − distinct/total); 0 when the
    * doc has no n-grams. */
  def dupNgramFrac(s: UTF8String, n: Int): Double = {
    val (m, total) = ngramCounts(s, n)
    if (total == 0) return 0.0
    1.0 - m.size.toDouble / total
  }

  // ── PII detection / redaction ─────────────────────────────────────────
  // Patterns deliberately stay in the Java-regex ∩ RE2 common subset
  // (character classes, \d, \b, bounded repetition; no lookaround) so the
  // DuckDB oracle (RE2) sees the exact same matches.

  private val emailRe = Pattern.compile("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
  private val phoneRe = Pattern.compile("\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}")
  private val ipv4Re = Pattern.compile("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  private def countMatches(p: Pattern, s: UTF8String): Int = {
    val m = p.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def piiEmails(s: UTF8String): Int = countMatches(emailRe, s)
  def piiPhones(s: UTF8String): Int = countMatches(phoneRe, s)
  def piiIpv4(s: UTF8String): Int = countMatches(ipv4Re, s)

  /** Replace emails → `<EMAIL>`, then phones → `<PHONE>`, then IPv4s →
    * `<IP>` — sequential global replacements, same order as the oracle's
    * stacked regexp_replace(…, 'g'). */
  def redact(s: UTF8String): UTF8String = {
    var t = s.toString
    t = emailRe.matcher(t).replaceAll("<EMAIL>")
    t = phoneRe.matcher(t).replaceAll("<PHONE>")
    t = ipv4Re.matcher(t).replaceAll("<IP>")
    UTF8String.fromString(t)
  }

  // crawl-to-text extraction (trafilatura-lite): patterns are RE2-safe (no
  // backreferences — script/style each get their own pattern) and the
  // whitespace class is the explicit [ \t\n\r] so Java (whose \s adds
  // \x0B) and RE2 replay identically
  private val scriptRe = java.util.regex.Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val styleRe = java.util.regex.Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val commentRe = java.util.regex.Pattern.compile("(?s)<!--.*?-->")
  private val tagRe = java.util.regex.Pattern.compile("<[^>]+>")
  private val wsRe = java.util.regex.Pattern.compile("[ \t\n\r]+")

  /** Strip HTML to text: drop script/style bodies (their CONTENT is code,
    * and un-stripped `<` inside it would corrupt the tag pass), drop
    * comments, drop tags (→ space, so adjacent text nodes don't weld),
    * decode the six common entities, collapse whitespace. The raw-crawl →
    * training-text extraction step; element text (title, headings) is
    * kept — tag-strip semantics, not readability scoring. */
  def stripHtml(s: UTF8String): UTF8String = {
    var t = s.toString
    t = scriptRe.matcher(t).replaceAll(" ")
    t = styleRe.matcher(t).replaceAll(" ")
    t = commentRe.matcher(t).replaceAll(" ")
    t = tagRe.matcher(t).replaceAll(" ")
    t = t.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    UTF8String.fromString(wsRe.matcher(t).replaceAll(" ").trim)
  }

  /** Unicode NFC normalization (canonical composition) — the step a
    * dedup pipeline needs BEFORE hashing: 'e'+U+0301 and U+00E9 are the
    * same text but different bytes, so unnormalized corpora under-dedup.
    * Exact JDK `java.text.Normalizer` NFC, mirrored by DuckDB's
    * `nfc_normalize` in the oracle. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Unicode NFKC (compatibility composition): folds fullwidth forms,
    * ligatures, circled/superscript digits etc. onto their plain
    * equivalents — tokenizers treat '１２３' and '123' as different
    * tokens unless this runs first. Lossy by design (compatibility
    * mappings erase styling), so it's a SEPARATE opt-in from [[nfc]]. */
  def nfkc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKC))

  /** Strip invisible formatting code points: zero-widths U+200B–U+200F,
    * bidi embeds U+202A–U+202E, word-joiner block U+2060–U+2064, BOM/zwnbsp
    * U+FEFF, soft hyphen U+00AD. These survive crawls, break exact-hash
    * dedup, and are a known prompt-smuggling channel — stripping them is
    * standard corpus hygiene. Mirrored by the oracle's RE2 class. */
  def stripInvisible(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val invisible =
        (cp >= 0x200B && cp <= 0x200F) || (cp >= 0x202A && cp <= 0x202E) ||
        (cp >= 0x2060 && cp <= 0x2064) || cp == 0xFEFF || cp == 0xAD
      if (!invisible) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

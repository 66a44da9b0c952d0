package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._

import graft.expressions.{MinHashBandKeys, MinHashSignature, ShingleHashes, SimHashPacked, WinnowMins}

/** Text-analysis `Column` builders for the LLM-data-pipeline surface:
  * tokenization, shingling, quality signals, fingerprints. All pure
  * Catalyst expression trees (array higher-order functions) — per-row
  * work with NO shuffle and no UDF; they stay codegen-friendly and
  * scale linearly with the corpus.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish regex token count: word pieces + standalone punctuation. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** k-token shingles (contiguous). Caller must guard size >= k. */
  def shingles(toks: Column, k: Int): Column =
    transform(sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))

  /** Count of tokens in `stop` (exact match). */
  def stopwordCount(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, w => stop.map(s => w === s).reduce(_ || _)))

  /** Fraction of distinct tokens — a repetition / degeneracy signal. */
  def uniqueRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** Mean token length in characters. */
  def meanWordLen(toks: Column): Column =
    aggregate(transform(toks, w => length(w)), lit(0),
      (acc, x) => acc + x).cast("double") / size(toks)

  /** PII scrub patterns (conservative, low-false-positive — the
    * C4/Dolma-style pre-training scrub). Order matters and is fixed
    * by [[redactPii]]: URLs first (an email-shaped `user@host.tld`
    * inside a URL is part of the URL, not a standalone address), then
    * emails, then bare IPv4s.
    *
    * Dialect constraint: these run under Java regex in Spark AND RE2
    * in the DuckDB oracle (q62), so no lookaround — both engines agree
    * on every construct used here. Consequences, pinned by spec:
    *  - urlRe ends on a non-punctuation char, so `see https://x.com.`
    *    redacts the URL and keeps the sentence period;
    *  - ipv4Re requires in-range octets (0–255), so `999.999.999.999`
    *    and version strings never match;
    *  - a LONGER dotted sequence still partial-matches leftmost-first:
    *    `1.2.3.4.5` → `<IP>.5` (ACCEPTED over-match — excluding it
    *    needs lookaround, which RE2 lacks; for a scrub, redacting more
    *    of an IP-looking run is the conservative direction). */
  private val octet = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val urlRe = "https?://[^ ]*[^ .,;:!?)\\]]"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = s"\\b(?:$octet\\.){3}$octet\\b"

  /** Per-row PII occurrence counts `(n_urls, n_emails, n_ipv4)` as a
    * struct — the audit numbers a scrub pass reports per document.
    * Counts follow [[redactPii]]'s precedence (an email inside a URL
    * counts as the URL only), so `counts == 0 ⟺ redaction is identity`.
    * Pure expression work, zero shuffle. */
  def piiCounts(text: Column): Column = {
    val noUrl = regexp_replace(text, urlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, emailRe, "<EMAIL>")
    struct(
      size(regexp_extract_all(text, lit(urlRe), lit(0))).as("n_urls"),
      size(regexp_extract_all(noUrl, lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(noEmail, lit(ipv4Re), lit(0))).as("n_ipv4"))
  }

  /** Redact URLs → `<URL>`, emails → `<EMAIL>`, bare IPv4s → `<IP>`
    * (in that order — see [[urlRe]]). Deterministic per-row rewrite,
    * zero shuffle: the scrub step of a pre-training text pipeline. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, urlRe, "<URL>"),
        emailRe, "<EMAIL>"),
      ipv4Re, "<IP>")

  /** Unicode NFC canonical composition — [[graft.expressions.NfcNormalize]]
    * as a Column (also SQL-registered as `graft_nfc`). */
  def nfcNormalize(text: Column): Column =
    GraftColumnBridge.column(
      graft.expressions.NfcNormalize(GraftColumnBridge.expression(text)))

  /** Text-cleaning patterns. Both run under Java regex (Spark) and RE2
    * (DuckDB oracle, q69) with IDENTICAL pattern text — `\xHH`/`\x{HHHH}`
    * escapes and char-class ranges mean the same thing in both dialects.
    *  - [[controlRe]]: C0 control chars except \t \n \r (stripped — the
    *    mojibake bytes a crawl drags in);
    *  - [[unicodeSpaceRe]]: ASCII whitespace + NBSP/narrow-NBSP/figure
    *    space (collapsed to one space). */
  val controlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  val unicodeSpaceRe = "[ \\t\\n\\r\\x{00A0}\\x{202F}\\x{2007}]+"

  /** The text-cleaning station (C4/CCNet lineage): strip control chars,
    * NFC-normalize, collapse unicode whitespace, trim — IN THAT ORDER,
    * and the order is contractual: stripping a control byte can make a
    * base letter adjacent to a combining mark, so NFC must run AFTER
    * the strip for the pair to compose (spec-pinned). Per-row expression
    * work, zero shuffle; the NFC step is the native [[nfcNormalize]]
    * kernel with an allocation-free ASCII fast path. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      nfcNormalize(regexp_replace(text, controlRe, "")),
      unicodeSpaceRe, " "))

  /** 60-bit hash from the md5 hex prefix — slower than xxhash64 but
    * reproducible in any engine with md5 (the DuckDB oracle recomputes
    * it as `('0x'||substr(md5(w),1,15))::UBIGINT`). 15 hex chars = 60
    * bits, comfortably inside a signed 64-bit long. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SimHash bit votes over whitespace tokens, computed per row with an
    * array fold (no explode, no shuffle): each token votes ±1 on each
    * bit of its hash. Returns an array<int> of `bits` vote tallies —
    * materialize it as a column, then pack with [[simhashPack]] (two
    * steps so the fold isn't duplicated per-bit in the expression
    * tree). `tokenHash` defaults to xxhash64 (fastest); pass
    * [[md5Hash60]] with bits=60 for the engine-portable variant. */
  def simhashVotes(toks: Column, bits: Int = 64,
      tokenHash: Column => Column = xxhash64(_)): Column =
    aggregate(
      // hash each token ONCE, then fold over the hashes — the bit loop
      // below references the lambda variable, not a re-computed hash
      transform(toks, w => tokenHash(w)),
      array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc,
        array((0 until bits).map(j =>
          when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)): _*),
        (a, b) => a + b))

  /** Pack vote tallies into the SimHash fingerprint (bit j set iff
    * tally j is positive). */
  def simhashPack(votes: Column, bits: Int = 64): Column =
    (0 until bits)
      .map(j => when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Fused positional k-gram hashes — native one-pass loop
    * ([[graft.expressions.ShingleHashes]]); bit-identical to
    * `transform(shingles(toks, k), g => hash(g))` for
    * algo = "xx64" (≡ xxhash64) / "md5_60" (≡ [[md5Hash60]]). */
  def shingleHashes(toks: Column, k: Int, algo: String = "xx64"): Column =
    GraftColumnBridge.column(ShingleHashes(
      GraftColumnBridge.expression(toks), k, algo))

  /** Fused SimHash fingerprint — native codegen'd loops end to end
    * (token hashing via [[shingleHashes]] k=1, votes+pack via
    * [[graft.expressions.SimHashPacked]]); bit-identical to
    * `simhashPack(simhashVotes(...))`, which stays as the semantics
    * reference for the parity spec. */
  def simhashPacked(toks: Column, bits: Int = 64,
      algo: String = "xx64"): Column =
    GraftColumnBridge.column(SimHashPacked(
      GraftColumnBridge.expression(shingleHashes(toks, 1, algo)), bits))

  /** MinHash signature: for each seed, the min over shingles of a
    * seed-salted 64-bit hash. One array column per row. HOF reference
    * form — kept as the semantics twin for the parity spec. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingleArr, s => xxhash64(s, seed))))

  /** Fused MinHash signature — native codegen'd one-pass loop
    * ([[graft.expressions.MinHashSignature]]); bit-identical values to
    * [[minhashSignature]] (same xxhash64 kernel and seed fold). */
  def minhashSignatureNative(shingleArr: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(
      GraftColumnBridge.expression(shingleArr), numHashes))

  /** Winnowing window minima, HOF reference form: each w-window's
    * minimum over the hash sequence, distinct keep-first — kept as the
    * semantics twin for the parity spec. O(n·w) per row (each window
    * re-sliced); callers guard `size(hashes) >= w`. */
  def winnowMinsHof(hashes: Column, w: Int): Column =
    array_distinct(transform(sequence(lit(0), size(hashes) - w),
      i => array_min(slice(hashes, i + 1, lit(w)))))

  /** Fused winnowing window minima — native monotonic-deque one-pass
    * loop ([[graft.expressions.WinnowMins]]), O(n) regardless of w;
    * bit- and order-identical to [[winnowMinsHof]]. */
  def winnowMins(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(WinnowMins(
      GraftColumnBridge.expression(hashes), w))

  /** Fused MinHash LSH band keys — shingles → per-seed minima → per-band
    * XXH64 long-fold, one primitive-only pass
    * ([[graft.expressions.MinHashBandKeys]]); no signature array or
    * per-band string render ever materializes. */
  def minhashBandKeysNative(shingleArr: Column, numHashes: Int,
      bands: Int): Column =
    GraftColumnBridge.column(MinHashBandKeys(
      GraftColumnBridge.expression(shingleArr), numHashes, bands))
}

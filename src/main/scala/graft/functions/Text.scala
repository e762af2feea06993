package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the large-scale training-data pipeline:
  * tokenization, character n-grams, deterministic polynomial hashing,
  * language-ID markers, quality ratios, fingerprinting.
  *
  * Everything is built from codegen'd `functions._` higher-order
  * functions — no UDFs — so the hot path stays inside whole-stage
  * codegen and the same formulas are expressible in ANSI-ish SQL for
  * the DuckDB oracle (the oracle SQL lives next to each registered
  * query in graft.queries; keep the two in sync).
  */
object Text {

  /** Normalize to lowercase a-z + space. Makes downstream `ascii`-based
    * hashing engine-portable (single-byte code points only). */
  def normalizeAz(c: Column): Column =
    regexp_replace(lower(c), "[^a-z ]", "")

  /** Whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(c, " "), w => length(w) > lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** The string as a materialized single-char array. Higher-order
    * lambdas are interpreted (not codegen'd), so any per-index
    * `substr(c, i, 1)` re-evaluates the WHOLE expression tree of `c`
    * per character — O(len·cost(c)) per row, quadratic when `c` is the
    * normalize regex over the same string. Splitting once makes every
    * per-char op read a materialized element instead. */
  private def chars(c: Column): Column =
    filter(split(c, ""), ch => length(ch) > lit(0))

  /** Character n-grams of a (normalized) string; empty array when the
    * string is shorter than n. Built as a chain of zip_with over n
    * shifted slices: every slice is an ARGUMENT (evaluated once per
    * row), never a lambda-body subtree — an indexed
    * transform(sequence, i => slice(cs, i, n)) re-evaluates the whole
    * split tree per index (interpreted HOFs have no CSE), O(len²)
    * per row. */
  def charNgrams(c: Column, n: Int): Column = {
    val cs = chars(c)
    val m = greatest(size(cs) - lit(n - 1), lit(0))
    val grams = (2 to n).foldLeft(slice(cs, lit(1), m)) { (acc, k) =>
      zip_with(acc, slice(cs, lit(k), m), (a, b) => concat(a, b))
    }
    when(size(cs) >= lit(n), grams).otherwise(array().cast("array<string>"))
  }

  /** Large prime for all polynomial hashing; fits comfortably in Long
    * arithmetic (acc < P ~1e9; a*h < ~1e18 < Long.MaxValue). */
  val P: Long = 1000000007L

  /** Deterministic polynomial rolling hash of a string:
    * fold(acc*31 + codepoint) mod P. Engine-portable (same formula in
    * DuckDB via list_reduce) unlike Spark's xxhash64/murmur. Apply to
    * normalized a-z text only. */
  def polyHash(c: Column): Column = {
    val codes = transform(chars(c), ch => ascii(ch).cast("long"))
    val folded = aggregate(codes, lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(P))
    when(length(c) > lit(0), folded).otherwise(lit(0L))
  }

  /** polyHash applied inside a lambda (element of an array of strings).
    * `mult` selects an independent hash family (default 31; 131 gives a
    * second family for e.g. SimHash's upper bits). */
  def polyHashElem(s: Column, mult: Long = 31L): Column = {
    val codes = transform(sequence(lit(1), length(s)),
      i => ascii(s.substr(i, lit(1))).cast("long"))
    aggregate(codes, lit(0L), (acc, x) => (acc * lit(mult) + x) % lit(P))
  }

  /** 1-based chunk start positions for stride-`stride` windows over a
    * token array: 1, 1+stride, … up to size(toks). GUARDED for empty
    * arrays: Spark's sequence(1, 0, step) is an "illegal boundaries"
    * runtime error (it does NOT return empty), so an unguarded
    * sequence would kill a corpus scan on the first empty document. */
  def chunkStarts(toks: Column, stride: Int): Column =
    when(size(toks) >= 1, sequence(lit(1), size(toks), lit(stride)))
      .otherwise(array().cast("array<int>"))

  /** Ratio of tokens that appear in `words`. */
  def wordSetRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, w => w.isin(words.map(lit): _*)))
    when(size(toks) > lit(0), hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  def countTokensIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isin(words.map(lit): _*)))
}

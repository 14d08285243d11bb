package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the word-count parity query and the
  * LLM-pipeline operators (dedup / text analysis).
  *
  * Tokenization reproduces the reference's `wc::map`
  * (/root/reference/src/mr/function.rs:9-16): strip non-word, non-space
  * characters with a regex, split on whitespace, drop empty tokens, and do
  * NOT lowercase. The `(?U)` flag makes Java's `\w` Unicode-aware to match
  * Rust-regex semantics (SURVEY.md §7.4-1).
  *
  * Everything here is a pure `Column` expression — codegen'd by Tungsten,
  * no Scala UDF in the hot path, so whole-stage codegen spans stay wide.
  */
object TextFunctions {

  /** Tokens of `c` after punctuation strip; empty tokens removed.
    * Array stays row-local — no explode, no shuffle. */
  def tokens(c: Column): Column =
    filter(split(regexp_replace(c, "(?U)[^\\w\\s]+", ""), "\\s+"),
      t => length(t) > lit(0))

  /** Word n-gram shingles over the token array: "a b c" for n=3.
    * slice is 1-based; sequence is inclusive on both ends. */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Character n-grams of the raw string (for Jaccard near-dup). */
  def charNGrams(c: Column, n: Int): Column =
    when(length(c) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(c) - lit(n - 1)),
        i => c.substr(i, lit(n))))

  /** MinHash value for one hash family member `seed` over a string array:
    * min over elements of md5(seed || ':' || element).
    *
    * md5 hex output is identical across Spark and DuckDB, and for
    * fixed-length lowercase hex strings lexicographic MIN == numeric MIN —
    * which makes the whole MinHash pipeline SQL-expressible in the DuckDB
    * oracle (list_min + list_transform) with bit-identical results.
    */
  def minhash(elems: Column, seed: Int): Column =
    array_min(transform(elems, e => md5(concat(lit(s"$seed:"), e))))

  /** Full k-element MinHash signature as an array<string>. */
  def minhashSignature(elems: Column, k: Int): Column =
    array((0 until k).map(i => minhash(elems, i)): _*)
}

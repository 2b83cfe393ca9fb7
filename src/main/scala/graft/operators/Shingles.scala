package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-shingle construction shared by the dedup operators. Pure
  * expression (no UDF), evaluated row-local inside codegen. */
object Shingles {

  /** Distinct k-word shingles of `text` under simple space splitting.
    * Space splitting (not `\S+`) is used deliberately so the DuckDB
    * oracle (`string_split(text, ' ')`) tokenizes identically. Documents
    * with fewer than k tokens yield an empty array.
    *
    * Built by zipping k−1 shifted copies of the token array rather than
    * indexing with `element_at` inside a `transform` lambda — the lambda
    * form re-evaluates the `split` per element (O(n²) splits per doc,
    * measured 14 s for a 5000-doc shingle explode at sf0.1 vs <1 s this
    * way). `zip_with` pads the shorter (shifted) side with null and
    * `concat` propagates it, so off-the-end shingles drop in the filter.
    */
  def wordShingles(text: Column, k: Int = 3): Column =
    array_distinct(wordShinglesAll(text, k))

  /** All k-word shingles in order, duplicates retained (the repetition
    * metrics need the multiset; dedup keeps only the distinct set). */
  def wordShinglesAll(text: Column, k: Int = 3): Column = {
    require(k >= 1, "shingle size must be positive")
    val toks = split(text, " ")
    val joined = (1 until k).foldLeft(toks) { (acc, j) =>
      val shifted = slice(toks, lit(j + 1), greatest(size(toks) - j, lit(0)))
      zip_with(acc, shifted, (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, x => x.isNotNull)
  }
}

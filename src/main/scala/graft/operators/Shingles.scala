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
    * Served by the native one-pass [[graft.functions.WordShingles]]
    * expression — the composable `split → zip_with×(k−1) → filter →
    * array_distinct` chain (kept below as [[wordShinglesAll]] for the
    * multiset consumers) materializes k+2 intermediate arrays per row
    * and is re-evaluated once per USE in the Jaccard-family operators
    * (both posting-join sides + the size projection). Output is
    * bit-identical with `array_distinct(wordShinglesAll(...))`
    * (spec-pinned, including empty-token runs from repeated spaces). */
  def wordShingles(text: Column, k: Int = 3): Column =
    graft.functions.WordShingles.wordShingles(text, k)

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

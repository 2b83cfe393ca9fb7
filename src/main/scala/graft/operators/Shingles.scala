package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-shingle construction shared by the dedup operators. Pure
  * expression (no UDF), evaluated row-local inside codegen. */
object Shingles {

  /** Distinct k-word shingles of `text` under simple space splitting.
    * Space splitting (not `\S+`) is used deliberately so the DuckDB
    * oracle (`string_split(text, ' ')`) tokenizes identically. Documents
    * with fewer than k tokens yield an empty array. */
  def wordShingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - k), i =>
          concat_ws(" ", (0 until k).map(j => element_at(toks, (i + j + 1))): _*)))
        .otherwise(array().cast("array<string>")))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-sample generation from a cleaned corpus: span-corruption
  * pairs (T5/UL2-style masked spans) and causal context/continuation
  * splits — the LAST transform before examples leave the pipeline, so
  * it must be deterministic (re-running the pipeline regenerates
  * byte-identical examples, and train/eval splits stay stable across
  * reruns) and map-only (example generation at 100 TB is a pure
  * projection; any shuffle here is wasted).
  *
  * All positions derive from the [[Curation.weightedSample]]
  * md5-uniform machinery (52-bit hex prefix → integer), so any engine
  * with md5 replays the exact same spans — the property that makes the
  * generators exact-oracle-gated rather than seeded-RNG rows-only.
  */
object Augment {

  private def hashInt(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 13),
      16, 10).cast("long")

  /** T5-style single-span corruption: replace `spanLen` consecutive
    * tokens (start position = md5-derived, uniform over valid starts)
    * with the sentinel, emitting `(id, input, target, n_tokens)` where
    * `target` is the sentinel followed by the masked span. Documents
    * shorter than `spanLen + 1` tokens are dropped (no valid mask
    * leaves context behind). Multi-span corruption is repeated
    * application with distinct seeds on the *output* — each pass stays
    * a pure projection. */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      spanLen: Int = 5,
      sentinel: String = "<X>",
      seed: String = "sc"): DataFrame = {
    require(spanLen >= 1, "span length must be positive")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // 1-based start, uniform over the CLOSED interval
    // [1, n - spanLen + 1]: start = n - spanLen + 1 masks through the
    // last token, leaving an empty suffix (leading context is still
    // guaranteed by the n > spanLen filter) — the simple
    // (n - spanLen + 1) modulus both engines compute.
    val nStarts = n - spanLen + 1
    val start = (hashInt(seed, col(idCol)) % nStarts.cast("long"))
      .cast("int") + 1
    df.filter(n > spanLen)
      .select(
        col(idCol),
        concat_ws(" ",
          concat(
            slice(toks, lit(1), start - 1),
            array(lit(sentinel)),
            slice(toks, start + spanLen, n - (start + spanLen) + 1)))
          .as("input"),
        concat_ws(" ",
          concat(array(lit(sentinel)), slice(toks, start, lit(spanLen))))
          .as("target"),
        n.cast("long").as("n_tokens"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022): cut each
    * document at two md5-derived token positions into (prefix, middle,
    * suffix) and emit the PSM-ordered training string
    * `<PRE> prefix <SUF> suffix <MID> middle` — the infilling format
    * code models train on. Cut1 is uniform over [1, n−1], cut2 over
    * (cut1, n], so every part can be empty except the whole. Documents
    * under 2 tokens are dropped. Same determinism/scale contract as
    * [[spanCorrupt]]: map-only, byte-identical on regeneration. */
  def fimSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seed: String = "fim"): DataFrame = {
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // cut1 in [1, n-1], cut2 in [cut1, n-1]: middle = (cut1, cut2],
    // tokens after cut2 are the suffix.
    val c1 = (hashInt(seed + "a", col(idCol)) % (n - 1).cast("long"))
      .cast("int") + 1
    val c2 = c1 +
      (hashInt(seed + "b", col(idCol)) % (n - c1).cast("long")).cast("int")
    df.filter(n >= 2)
      .select(
        col(idCol),
        concat_ws(" ", slice(toks, lit(1), c1)).as("prefix"),
        concat_ws(" ", slice(toks, c1 + 1, c2 - c1)).as("middle"),
        concat_ws(" ", slice(toks, c2 + 1, n - c2)).as("suffix"))
      .withColumn("psm",
        concat(lit("<PRE> "), col("prefix"), lit(" <SUF> "), col("suffix"),
          lit(" <MID> "), col("middle")))
  }

  /** Causal context/continuation split for LM evaluation: cut each
    * document at an md5-derived token position (uniform over
    * `[minContext, n − minContinuation]`), emitting `(id, context,
    * continuation)`. Documents too short for both minimums are
    * dropped. */
  def causalSplits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minContext: Int = 8,
      minContinuation: Int = 4,
      seed: String = "cs"): DataFrame = {
    require(minContext >= 1 && minContinuation >= 1,
      "minimum context/continuation must be positive")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nCuts = n - minContinuation - minContext + 1
    val cut = (hashInt(seed, col(idCol)) % nCuts.cast("long"))
      .cast("int") + minContext
    df.filter(n >= minContext + minContinuation)
      .select(
        col(idCol),
        concat_ws(" ", slice(toks, lit(1), cut)).as("context"),
        concat_ws(" ", slice(toks, cut + 1, n - cut)).as("continuation"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunked exact-substring deduplication — the fixed-granularity
  * approximation of suffix-array substring dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better"): split
  * every document into aligned `w`-word chunks, then remove repeated
  * chunks either within a document or corpus-wide (first occurrence
  * wins). This is the curation step document-level dedup misses —
  * boilerplate runs repeated inside otherwise-distinct documents.
  *
  * Scale design:
  *   - chunking is a pure row-local projection (split → slice →
  *     array_join in one Project over the scan), so the within-document
  *     variant is a map-only pass — fingerprinting 100 TB never
  *     shuffles;
  *   - the corpus-wide variant shuffles each chunk ONCE to elect its
  *     first occurrence via a partial `min(struct(id, idx))`
  *     aggregation (map-side combine reduces every partition to one
  *     candidate per chunk before the exchange — the window-function
  *     formulation would ship every occurrence of a hot boilerplate
  *     chunk to a single task), then one clustered exchange rebuilds
  *     documents. At web scale, key the election on a 64/128-bit chunk
  *     hash instead of the chunk text to keep the shuffle narrow (the
  *     oracle-checked variant keys on the text so the contract is
  *     provably exact).
  */
object SubstringDedup {

  /** Aligned `w`-word chunks of a token ARRAY, each re-joined with
    * single spaces: chunk k = tokens [k·w, (k+1)·w). The last chunk may
    * be short. Pass a MATERIALIZED column when the lambda cost matters:
    * interpreted higher-order eval re-runs whatever expression `toks`
    * is once per chunk (no common-subexpression elimination inside
    * lambdas), so handing it `split(...)` directly costs O(n²/w) per
    * row, while a pre-projected attribute is a row-field read. */
  def tokenChunks(toks: Column, w: Int): Column = {
    require(w > 0, s"chunk width must be positive, got $w")
    val nChunks = ceil(size(toks).cast("double") / w).cast("int")
    when(nChunks > lit(0),
      transform(sequence(lit(0), nChunks - lit(1)),
        k => array_join(slice(toks, k * w + 1, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** [[tokenChunks]] over space-split `text` — the expression form for
    * one-shot/test use; the operators below pre-project the token array
    * so per-chunk lambda evaluation stays O(w). */
  def wordChunks(text: Column, w: Int): Column =
    tokenChunks(split(text, " "), w)

  /** Remove repeated chunks WITHIN each document, keeping first
    * occurrences in order (`array_distinct` preserves first-appearance
    * order). Pure projection — zero shuffle at any scale. */
  def dedupChunksWithinDoc(
      df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    // STAGED projections ON PURPOSE: lambda-bearing expressions get no
    // codegen common-subexpression elimination, so every reference to
    // an inlined expression re-evaluates its whole subtree per row.
    // Each stage materializes what the next references more than once —
    // split → __toks (read per chunk), chunking → __chunks (read by
    // n_chunks and the distinct), distinct → __kept (read by n_kept and
    // the join) — one evaluation each. CollapseProject leaves the
    // multi-referenced non-cheap aliases un-inlined.
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), tokenChunks(col("__toks"), w).as("__chunks"))
      .select(col(idCol), col("__chunks"),
        array_distinct(col("__chunks")).as("__kept"))
      .select(
        col(idCol),
        size(col("__chunks")).cast("long").as("n_chunks"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("text_dedup"))
  }

  /** Corpus-wide chunk dedup: a chunk value survives only at its
    * globally first occurrence — minimal (id, position) lexicographic,
    * so the winner is deterministic. Documents whose every chunk
    * appeared earlier elsewhere come back with empty text (they are the
    * fully-boilerplate rows a curation pipeline drops next).
    *
    * Exactly two shuffles: the per-chunk first-occurrence election
    * (partial agg) and the per-document rebuild; the rebuild's
    * partitioning is reused by the final left join. */
  def chunkDedupGlobal(
      df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val exploded = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(
        col(idCol), col("__toks"),
        posexplode(tokenChunks(col("__toks"), w)).as(Seq("idx", "chunk")))
      .drop("__toks")
    val firsts = exploded
      .groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("idx"))).as("f"))
      .select(col("f")(idCol).as(idCol), col("f")("idx").as("idx"),
        col("chunk"))
    val rebuilt = firsts
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("idx"), col("chunk"))).as("ps"))
      .select(
        col(idCol),
        size(col("ps")).cast("long").as("n_kept"),
        array_join(
          transform(array_sort(col("ps")), _.getField("chunk")), " ")
          .as("text_dedup"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Anchor-based exact CHARACTER-substring duplication profile — the
    * shift-robust companion to the aligned word-chunk operators above.
    * Fixed-granularity chunking misses duplicated runs that straddle a
    * chunk boundary (insert one word before a copied paragraph and every
    * subsequent chunk misaligns); content-defined anchors do not: a
    * position is an anchor when the `anchorK`-char gram STARTING there
    * hashes into the selected bucket, so the same copied text selects
    * the same anchors no matter where it lands in a document (cf. Lee
    * et al. 2022 suffix-array substring dedup — this is its
    * cluster-shaped approximation; a distributed suffix array is the
    * one formulation we refuse to build).
    *
    * At every anchor position the `spanLen`-char substring is digested;
    * a span is duplicated when its digest occurs ≥ 2 times corpus-wide
    * (`n_dup` counts occurrences in spans with total multiplicity ≥ 2;
    * `n_cross_dup` tightens that to spans seen in ≥ 2 DISTINCT docs, the
    * "copied from elsewhere" signal that within-doc repetition cannot
    * inflate).
    *
    * Scale shape:
    *   - anchor selection + span digesting is ROW-LOCAL (explode of the
    *     filtered position sequence, then an md5 projection): the text
    *     column never reaches an exchange — every shuffle from the first
    *     aggregation on carries only (id, 32-hex digest) and counts;
    *   - anchor density is 16^-zeros (1/16 per leading zero hex char),
    *     so the exploded digest stream is |text|/16^zeros rows, and the
    *     per-span aggregation is map-side combined;
    *   - the hot-span total table is digest-keyed and Zipf-headed; the
    *     occ ⋈ totals join is narrow (digests both sides). At 100 TB,
    *     replace the per-position md5 probe with a native rolling-hash
    *     anchor `Expression` (the [[graft.functions]] winnow expression
    *     is the template) — md5-per-position is portable (DuckDB
    *     replays it bit-for-bit, which is why the oracle can be exact)
    *     but does O(|text|) digest calls in an interpreted lambda.
    */
  def anchoredSpanProfile(
      df: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 50, anchorK: Int = 8, anchorZeros: Int = 1): DataFrame = {
    require(spanLen > 0 && anchorK > 0 && anchorK <= spanLen,
      s"need 0 < anchorK <= spanLen, got anchorK=$anchorK spanLen=$spanLen")
    require(anchorZeros >= 1 && anchorZeros <= 8,
      s"anchorZeros must be in [1, 8], got $anchorZeros")
    val base = df.select(col(idCol), col(textCol).as("__t"))
    // One fused native pass per row: anchor selection + span digesting
    // (bit-identical with the composable filter(sequence)/md5/substr
    // formulation — spec-pinned — but without the boxed position array
    // and the per-position interpreted expression-tree walk).
    val spans = base.select(
      col(idCol),
      explode(graft.functions.AnchoredSpanDigests.anchoredSpanDigests(
        col("__t"), spanLen, anchorK, anchorZeros)).as("h"))
    val occ = spans.groupBy(col("h"), col(idCol))
      .agg(count(lit(1)).as("occ"))
    val totals = occ.groupBy(col("h"))
      .agg(sum(col("occ")).as("tot"), count(lit(1)).as("ndocs"))
    val perDoc = occ.join(totals, Seq("h"))
      .groupBy(col(idCol))
      .agg(
        sum(col("occ")).as("n_spans"),
        sum(when(col("tot") >= 2, col("occ")).otherwise(0L)).as("n_dup"),
        sum(when(col("ndocs") >= 2, col("occ")).otherwise(0L))
          .as("n_cross_dup"))
    base.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_cross_dup"), lit(0L)).as("n_cross_dup"))
  }

  /** Character coverage of cross-doc duplicated spans — the "how much
    * would exact-substring dedup actually remove" planning metric on
    * top of [[anchoredSpanProfile]]. Per document: the number of
    * characters covered by at least one anchored span whose digest
    * occurs in ≥ 2 distinct documents (overlapping spans counted once —
    * an interval UNION, so a long copied run is its length, not
    * anchors × spanLen).
    *
    * Scale shape: same digest-only shuffles as the profile, plus one
    * per-doc `collect_list` of duplicated span START POSITIONS (ints;
    * bounded by numChars/16^zeros — proportional to the doc's own
    * length, i.e. row-local scale) folded into the interval union with
    * a single `aggregate` pass over the sorted array. Text never
    * reaches an exchange.
    */
  def duplicatedSpanChars(
      df: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 50, anchorK: Int = 8, anchorZeros: Int = 1): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("__t"))
    val spans = base.select(
      col(idCol),
      explode(graft.functions.AnchoredSpanPosDigests.anchoredSpanPosDigests(
        col("__t"), spanLen, anchorK, anchorZeros)).as("sp"))
      .select(col(idCol), col("sp.i").as("i"), col("sp.h").as("h"))
    val ndocs = spans.groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("occ"))
      .groupBy(col("h")).agg(count(lit(1)).as("ndocs"))
    val dupStarts = spans
      .join(ndocs.filter(col("ndocs") >= 2).select("h"), Seq("h"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("i"))).as("starts"))
    // interval union fold: acc = (covered chars, rightmost end so far);
    // a start past the frontier adds a full span, an overlapping one
    // only the fresh tail
    val folded = dupStarts.select(
      col(idCol),
      size(col("starts")).cast("long").as("n_dup_spans"),
      aggregate(
        col("starts"),
        struct(lit(0L).as("cov"), lit(0L).as("end")),
        (acc, s) => {
          val sL = s.cast("long")
          val newEnd = sL + lit(spanLen.toLong) - lit(1L)
          struct(
            (acc.getField("cov") + when(sL > acc.getField("end"),
              lit(spanLen.toLong))
              .otherwise(greatest(newEnd - acc.getField("end"), lit(0L))))
              .as("cov"),
            greatest(acc.getField("end"), newEnd).as("end"))
        },
        acc => acc.getField("cov")).as("dup_chars"))
    base.select(col(idCol), length(col("__t")).cast("long").as("n_chars"))
      .join(folded, Seq(idCol), "left")
      .select(
        col(idCol), col("n_chars"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"))
  }

  /** Incremental (cross-snapshot) SPAN overlap: for every document in
    * the arriving `batch`, how many of its anchored `spanLen`-char
    * spans already exist in the `reference` corpus — the batch twin of
    * [[graft.streaming.Streaming.substringMatchesStream]] (every
    * streaming screen in this library has an exact-oracle-gated batch
    * form; this is the substring rung's). A recrawl doc that pastes a
    * reference paragraph into otherwise-new text scores n_matched > 0
    * where document-level digest and similarity dedup both see a new
    * document.
    *
    * Scale shape: the reference reduces to its DISTINCT span digests
    * before any exchange (reference text never moves — the same
    * contract as `Dedup.dedupAgainstReference`), the batch side is the
    * fused native span pass, and the probe is a digest-keyed left semi
    * accounting join: per batch doc, total spans and matched spans. */
  def spanOverlapAgainstReference(
      batch: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, refTextCol: String = "text",
      spanLen: Int = 50, anchorK: Int = 8, anchorZeros: Int = 1): DataFrame = {
    def spans(df: DataFrame, id: Seq[Column], tc: String) = df.select(
      id :+ explode(graft.functions.AnchoredSpanDigests.anchoredSpanDigests(
        col(tc), spanLen, anchorK, anchorZeros)).as("h"): _*)
    val refSpans = spans(reference, Seq.empty, refTextCol).distinct()
      .withColumnRenamed("h", "__ref_h")
    val perDoc = spans(batch, Seq(col(idCol)), textCol)
      .join(refSpans, col("h") === col("__ref_h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        count(col("__ref_h")).as("n_matched"))
    batch.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
  }

  /** LINE-level exact dedup — the RefinedWeb/CCNet pass a crawl
    * pipeline runs first: drop EVERY line that appears in more than
    * `maxDf` distinct documents (navigation bars, cookie banners,
    * footers), keeping the surviving lines in their original order.
    * Line granularity differs from [[stripFrequentChunks]]'s aligned
    * word windows: a "line" is an author-delimited unit (`sep`,
    * default newline), so the rule never splits or merges a
    * boilerplate unit across chunk boundaries.
    *
    * Output per document: `n_lines`, `n_kept`, and `text_dedup` (the
    * kept lines re-joined with `sep`; empty when every line was hot).
    *
    * Scale shape — the corpus text NEVER reaches an exchange:
    *   - the document-frequency pass explodes each document's
    *     DISTINCT lines (row-local `array_distinct`, so a plain
    *     `count(*)` per line is already the distinct-doc count — no
    *     `count(distinct)` expansion) and reduces every line to its
    *     md5 digest BEFORE the aggregation, so the one shuffle
    *     carries (32-hex digest, partial count) rows only;
    *   - the hot set is tiny by construction (a line needs > `maxDf`
    *     distinct documents, so its size is bounded by
    *     total-line-occurrences / maxDf and in practice by the Zipf
    *     head) and collapses to a ONE-ROW `collect_set` aggregate
    *     that broadcasts into a cross join — the removal itself is a
    *     row-local `filter(lines, l -> !contains(hot, md5(l)))`
    *     projection, zero additional shuffle, no per-document
    *     rebuild aggregation at all (the line array never left the
    *     row, so order is preserved for free). */
  def lineDedup(
      df: DataFrame, idCol: String, textCol: String,
      maxDf: Int, sep: String = "\n"): DataFrame =
    stripHotLinesJoin(df, idCol, textCol,
      hotLineDigests(df, textCol, maxDf, sep), sep)

  /** The removal half of [[lineDedup]] against a hot-digest FRAME
    * ([[hotLineDigests]] output or any `__h` digest column): the set
    * collapses to a ONE-ROW sorted `collect_set` aggregate that
    * BROADCASTS into a cross join — the hot set never materializes on
    * the driver, so there is no driver-memory bound to trust; Spark's
    * broadcast size guard is the (executor-side, configurable) cap.
    * The removal itself is a row-local binary-search filter (SORTED
    * hot set: a 10× scaling probe caught the `array_contains` walk
    * going super-linear — 23× wall at 10× input — on a
    * boilerplate-heavy corpus whose hot set grows with it), zero
    * additional shuffle, no per-document rebuild aggregation (the
    * line array never leaves the row, so order is preserved for
    * free). Works unchanged as the STATIC side of a stream-static
    * join ([[graft.streaming.Streaming.lineDedupStream]]). */
  def stripHotLinesJoin(
      df: DataFrame, idCol: String, textCol: String,
      hotDigests: DataFrame, sep: String = "\n"): DataFrame = {
    val hot = hotDigests
      .agg(sort_array(collect_set(col("__h"))).as("__hot"))
    df.select(col(idCol), lineSplit(col(textCol), sep).as("__lines"))
      .crossJoin(broadcast(hot))
      .select(col(idCol), col("__lines"),
        keptLines(col("__lines"), col("__hot")).as("__kept"))
      .select(lineDedupOutput(idCol, sep): _*)
  }

  /** Paragraph-level exact dedup — the CCNet/RefinedWeb-style pass
    * sitting between [[lineDedup]] (line granularity) and
    * [[chunkDedupGlobal]] (fixed-width chunks): the unit is a
    * double-newline-separated PARAGRAPH, dropped everywhere once it
    * appears in more than `maxDf` distinct documents. Pure
    * parameterization of the line machinery, so it inherits the same
    * scale shape verbatim: one digest-only shuffle for the hot set,
    * hot set as a one-row sorted broadcast, removal a row-local
    * binary-search filter — paragraph text never reaches an exchange. */
  def paraDedup(
      df: DataFrame, idCol: String, textCol: String, maxDf: Int): DataFrame =
    lineDedup(df, idCol, textCol, maxDf, sep = "\n\n")

  /** The document-frequency half of [[lineDedup]], exposed for census
    * use (the streaming twin learns its hot set from a batch census —
    * a stream cannot count its own line df): md5 digests of every
    * line appearing in MORE THAN `maxDf` distinct census documents.
    * One digest-only shuffle; bounded by the Zipf head. */
  def hotLineDigests(
      census: DataFrame, textCol: String, maxDf: Int,
      sep: String = "\n"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    census
      .select(explode(array_distinct(lineSplit(col(textCol), sep))).as("__l"))
      .select(md5(col("__l")).as("__h"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select("__h")
  }

  /** The MAP-ONLY removal half of [[lineDedup]] against an
    * already-known hot set folded in as a LITERAL: no join at all, a
    * pure projection. The caller-supplied-set form for when the hot
    * digests are already small driver-side data (a config list, a
    * prior release's exported head); the STREAMING twin
    * ([[graft.streaming.Streaming.lineDedupStream]]) instead goes
    * through [[stripHotLinesJoin]] — the checkpointed broadcast form
    * that never materializes the set on the driver. Shares
    * [[keptLines]]/[[lineDedupOutput]] with both, so all three forms
    * agree row for row (spec-pinned). */
  def stripHotLines(
      df: DataFrame, idCol: String, textCol: String,
      hotDigests: Seq[String], sep: String = "\n"): DataFrame =
    df.select(col(idCol), lineSplit(col(textCol), sep).as("__lines"))
      .select(col(idCol), col("__lines"),
        keptLines(col("__lines"),
          typedLit(hotDigests.sorted).as("__hot")).as("__kept"))
      .select(lineDedupOutput(idCol, sep): _*)

  private def lineSplit(text: Column, sep: String): Column = {
    require(sep.nonEmpty, "separator must be non-empty")
    split(text, java.util.regex.Pattern.quote(sep))
  }

  /** `hot` MUST be sorted in binary string order (`sort_array`, or a
    * `.sorted` literal of hex digests — ASCII, so JVM and binary
    * orders agree): the membership probe is a native binary search,
    * spec-pinned behavior-identical to `array_contains`. */
  private def keptLines(lines: Column, hot: Column): Column =
    filter(lines, l =>
      !graft.functions.SortedArrayContains.sortedContains(hot, md5(l)))

  private def lineDedupOutput(idCol: String, sep: String): Seq[Column] = Seq(
    col(idCol),
    size(col("__lines")).cast("long").as("n_lines"),
    size(col("__kept")).cast("long").as("n_kept"),
    array_join(col("__kept"), sep).as("text_dedup"))

  /** Boilerplate STRIP: remove EVERY occurrence of any `w`-word chunk
    * whose corpus document frequency exceeds `maxDf` — the
    * RefinedWeb-style "repeated across documents ⇒ it's boilerplate,
    * drop all copies" rule. Distinct from [[chunkDedupGlobal]], which
    * keeps the globally-first occurrence: a navigation header repeated
    * in 10 000 documents is noise in ALL of them, including the first.
    *
    * Scale shape: the hot set is tiny by construction (a chunk needs
    * > `maxDf` DISTINCT documents to qualify, so the set size is
    * bounded by corpus-chunk-occurrences / maxDf and in practice by the
    * Zipf head), so it BROADCASTS and the removal is a map-side anti
    * join — the corpus text itself never shuffles. Two aggregations
    * total: the df count (partial count-distinct) and the per-document
    * rebuild. Size `maxDf` so the hot set stays broadcast-sized; if it
    * cannot, drop the `broadcast` hint and let AQE pick the join. */
  def stripFrequentChunks(
      df: DataFrame, idCol: String, textCol: String, w: Int, maxDf: Int): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val exploded = df
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(
        col(idCol),
        posexplode(tokenChunks(col("__toks"), w)).as(Seq("idx", "chunk")))
    val hot = exploded
      .groupBy(col("chunk"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") > maxDf)
      .select("chunk")
    val kept = exploded.join(broadcast(hot), Seq("chunk"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("idx"), col("chunk"))).as("ps"))
      .select(
        col(idCol),
        size(col("ps")).cast("long").as("n_kept"),
        array_join(
          transform(array_sort(col("ps")), _.getField("chunk")), " ")
          .as("text_stripped"))
    df.select(col(idCol),
        ceil(size(split(col(textCol), " ")).cast("double") / w)
          .cast("long").as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(
        col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_stripped"), lit("")).as("text_stripped"))
  }
}

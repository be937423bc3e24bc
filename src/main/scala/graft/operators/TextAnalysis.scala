package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions — codegen-friendly, no UDFs, no shuffles beyond
  * what the caller adds.
  */
object TextAnalysis {

  /** Largest reference vocabulary compiled into a plan-constant
    * token→nano table by [[lmScore]]/[[bigramLmScore]]; past this the
    * explode → join dataflow takes over (the ivfAssignTopLsh
    * size-gating rule applied to literal maps). 2^17 entries ≈ a few MB
    * of plan — well under broadcast-table scale. */
  private[graft] val LmVocabGate: Int = 1 << 17

  // --------------------------------------------------------------- tokens

  // the ONE corpus tokenizer — Dedup shares it, and several DuckDB
  // oracles replay it bit-for-bit as regexp_split_to_array(trim, '\s+')
  def tokens(textCol: Column): Column = graft.operators.Dedup.tokens(textCol)

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** One-pass token statistics (count / char sum / distinct / long-word
    * surplus / per-language stopword hits) — a custom codegen expression;
    * the HOF formulations it replaces were CodegenFallback and re-split
    * the text once per reference. */
  def tokenStats(textCol: Column): Column =
    graft.functions.TokenStatsExpression.tokenStats(
      tokens(textCol), langProfiles.map(_._2))

  /** BPE-ish subword count estimate: words + punctuation clusters + digit
    * runs counted separately (a cheap stand-in for a real tokenizer's
    * token count — useful for budget estimates at corpus scale). */
  def subwordCountEstimate(textCol: Column): Column =
    subwordFrom(textCol, tokenStats(textCol))

  private def subwordFrom(textCol: Column, st: Column): Column = {
    val words = st.getField("n_tokens")
    val punct = length(regexp_replace(textCol, "[^\\p{Punct}]", ""))
    val digits = size(regexp_extract_all(textCol, lit("[0-9]+"), lit(0)))
    // long words tokenize into ~len/4 subwords
    words + punct + digits + st.getField("long_extra")
  }

  // ----------------------------------------------------------- language ID

  /** Tiny per-language stopword profiles (top function words). Public
    * knowledge; enough signal for coarse routing. */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was",
      "for", "on", "are", "with", "as", "his", "they", "at", "be", "this"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "los", "del", "se",
      "las", "por", "un", "para", "con", "una", "su", "al", "es", "lo"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das",
      "mit", "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au")
  )

  /** Stopword profiles in deterministic language order — the
    * `profile_hits` array of [[tokenStats]] follows this order. */
  private val langProfiles: Seq[(String, Seq[String])] =
    stopwords.toSeq.sortBy(_._1)

  /** Heuristic language ID over {en, es, de, fr, zh, unknown}:
    * CJK character ratio decides zh; otherwise the language whose
    * stopword profile overlaps the token set most (ties → lexicographic,
    * no overlap → "unknown"). N-gram-profile classification in the
    * Cavnar-Trenkle tradition, reduced to function-word profiles.
    */
  def languageId(textCol: Column): Column =
    languageIdFrom(textCol, tokenStats(textCol))

  private def languageIdFrom(textCol: Column, st: Column): Column = {
    val cjkCount = length(regexp_replace(textCol, "[^\\x{4E00}-\\x{9FFF}]", ""))
    val scores = langProfiles.zipWithIndex.map { case ((lang, _), i) =>
      struct(
        st.getField("profile_hits").getItem(i).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(cjkCount > length(textCol) * 0.2, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  // ------------------------------------------------------------ quality

  /** Heuristic quality score in [0, 1]: blend of alphabetic ratio, word
    * count sanity, mean word length sanity, punctuation ratio, and
    * repetition (distinct-token ratio). The usual pre-training filter
    * features (C4/Gopher-style rules), expressed as one Column. */
  def qualityScore(textCol: Column): Column =
    qualityFrom(textCol, tokenStats(textCol))

  private def qualityFrom(textCol: Column, st: Column): Column = {
    val len = greatest(length(textCol), lit(1))
    val alphaRatio =
      length(regexp_replace(textCol, "[^\\p{L} ]", "")).cast("double") / len
    val nTok = greatest(st.getField("n_tokens"), lit(1L))
    val meanWordLen = st.getField("char_sum").cast("double") / nTok
    val wordLenScore =
      when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val sizeScore =
      when(nTok.between(10, 100000), 1.0)
        .when(nTok.between(3, 9), 0.5)
        .otherwise(0.1)
    val punctRatio =
      length(regexp_replace(textCol, "[^\\p{Punct}]", "")).cast("double") / len
    val punctScore = when(punctRatio < 0.2, 1.0).otherwise(0.3)
    val distinctRatio = st.getField("n_distinct").cast("double") / nTok
    val repetitionScore = when(distinctRatio > 0.3, 1.0)
      .when(distinctRatio > 0.1, 0.6).otherwise(0.2)
    round(
      alphaRatio * 0.3 + wordLenScore * 0.2 + sizeScore * 0.2 +
        punctScore * 0.15 + repetitionScore * 0.15, 6)
  }

  // -------------------------------------------------------- fingerprinting

  /** Winnowing-style document fingerprint: the k smallest hashes of the
    * character n-gram set (a compact, order-insensitive sketch; equal
    * docs → equal fingerprints, near-equal docs → mostly-equal). */
  def fingerprintSketch(textCol: Column, n: Int = 8, k: Int = 4): Column =
    // charNgramHashes output is already sorted ascending
    slice(graft.functions.SketchExpressions.charNgramHashes(textCol, n), 1, k)

  /** Full-content 64-bit fingerprint. */
  def contentHash(textCol: Column): Column = xxhash64(textCol)

  // ------------------------------------------------------------- pipeline

  /** Gopher-style repetition signal: the duplicate word-bigram fraction
    * (1 − distinct/total). Boilerplate and template spam repeat phrases;
    * a high fraction flags them for the curation filter. Bigrams ride
    * the hashed word-shingle expression (distinct 64-bit hashes), so no
    * string arrays shuffle or sort. */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val total = greatest(size(toks) - 1, lit(1)).cast("long")
    val distinctBg = size(graft.functions.SketchExpressions
      .wordShingleHashes(toks, 2)).cast("long")
    df.select(col(idCol), total.as("n_bigrams"),
        distinctBg.as("n_distinct_bigrams"))
      .withColumn("dup_frac", round(
        lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"),
        6))
  }

  /** Benchmark decontamination: for every corpus document, the number of
    * distinct character n-grams it shares with a benchmark/eval corpus.
    * Docs with n_shared > 0 are contamination candidates to drop before
    * training.
    *
    * Scale shape: the benchmark's distinct gram-hash set is tiny next to
    * the corpus (eval sets are MBs) — it is aggregated once and
    * BROADCAST; the corpus side explodes its per-doc gram hashes map-side
    * and the broadcast join filters them immediately, so the only shuffle
    * carries (doc_id) for MATCHED grams — at 100 TB that is proportional
    * to the contamination, not the corpus. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    def grams = graft.functions.SketchExpressions.charNgramHashes(col(textCol), n)
    val benchGrams = benchmark.select(explode(grams).as("g")).distinct()
    // per-doc grams are already distinct (charNgramHashes dedups), so a
    // plain count after the join counts distinct shared grams
    corpus.select(col(idCol), explode(grams).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** One-pass document profile: id, language, token count, quality,
    * fingerprint — the per-document columns a corpus-curation pipeline
    * materializes before filtering/dedup. The token statistics struct is
    * computed once per row and shared by every derived column. */
  /** C4-style LINE-level cleaning (Raffel et al. 2020, §2.2 — the rules
    * the C4 pipeline applies before any document-level filter): keep
    * only lines that (a) have at least `minWords` words, (b) end in
    * terminal punctuation (. ! ? "), (c) contain no curly brace (the
    * JSON/code-spill heuristic), and (d) do not contain "lorem ipsum"
    * (case-insensitive). Per document: (id, n_lines, n_kept, text_kept)
    * with surviving lines rejoined by newline in original order.
    *
    * Map-only — higher-order array functions over the line split, no
    * shuffle, no state; at 100 TB this runs at scan speed alongside
    * projection. (Line DEDUP across documents is the separate
    * [[Dedup.spanDedup]]/[[Dedup.duplicatedSubstringSpans]] concern.) */
  def c4LineClean(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    def keep(l: Column): Column = {
      val t = trim(l)
      size(split(t, "\\s+")) >= minWords &&
        t.rlike("[.!?\"]$") &&
        !t.contains("{") && !t.contains("}") &&
        !lower(t).contains("lorem ipsum")
    }
    val kept = filter(lines, keep _)
    df.select(col(idCol).as("id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("text_kept"))
  }

  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("_text"),
        tokenStats(col(textCol)).as("_st"))
      .select(
        col(idCol),
        languageIdFrom(col("_text"), col("_st")).as("lang_pred"),
        col("_st").getField("n_tokens").as("n_tokens"),
        subwordFrom(col("_text"), col("_st")).as("n_subwords_est"),
        qualityFrom(col("_text"), col("_st")).as("quality"),
        contentHash(col("_text")).as("content_hash"),
        fingerprintSketch(col("_text")).as("fingerprint"))

  // ------------------------------------------------------------ chunking

  /** Split documents into fixed-width token windows with overlap — the
    * context-window preparation step (training shards / RAG indexing).
    * Output: (idCol, chunk_idx, chunk_text, n_tokens), one row per
    * window; stride = width − overlap; the final window may be short;
    * a window is emitted only if it starts before `n − overlap` (later
    * starts would be pure suffixes of the previous window). Built from
    * `sequence` + `posexplode` + `slice` — codegen'd, no UDFs; the
    * explode multiplies rows ~n/stride but each output row carries one
    * window, not the document, so the stage streams at corpus scale. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      width: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && width > overlap, s"need width > overlap >= 0")
    val stride = width - overlap
    df.select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), size(col("_toks")) - 1, lit(stride))))
      .where(col("col") === 0 ||
        col("col") < size(col("_toks")) - overlap)
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        array_join(slice(col("_toks"), col("col") + 1, lit(width)), " ")
          .as("chunk_text"),
        least(size(col("_toks")) - col("col"), lit(width)).cast("long")
          .as("n_tokens"))
  }

  // -------------------------------------------------------- PII redaction

  /** PII patterns, ordered: each is both RE2- and java.util.regex-
    * compatible (ASCII `\b`, non-capturing groups, bounded repeats), so
    * an external auditor can replay the scrub in any engine. SSN runs
    * before PHONE: both are digit-dash shapes and order makes the
    * precedence explicit even though the patterns cannot overlap. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "EMAIL" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "IP" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "SSN" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "PHONE" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** Replace every PII match with `[<TYPE>]`. A chain of codegen'd
    * `regexp_replace` calls — one pass per pattern class, zero UDFs;
    * at corpus scale this is a map-only stage that composes with any
    * downstream filter/dedup without adding a shuffle. */
  def redactPii(textCol: Column): Column =
    piiPatterns.foldLeft(textCol) { case (c, (tag, re)) =>
      regexp_replace(c, re, s"[$tag]")
    }

  /** Per-class PII match counts as a struct column (computed on the
    * UNREDACTED text): `n_email`, `n_ip`, `n_ssn`, `n_phone`. */
  def piiCounts(textCol: Column): Column =
    struct(piiPatterns.map { case (tag, re) =>
      size(regexp_extract_all(textCol, lit(re), lit(0)))
        .as(s"n_${tag.toLowerCase}")
    }: _*)

  // ------------------------------------------------------ LM quality score

  /** CCNet-style language-model quality scoring (Wenzek et al., 2020,
    * arXiv:1911.00359 §4.3): score each document by its per-token
    * negative log-likelihood under a model trained on a REFERENCE corpus
    * — low scores read like the reference, high scores are outliers; a
    * quantile cut on the score is the classic "perplexity filter". The
    * in-container model is an add-one-smoothed unigram LM (honest
    * stand-in for CCNet's KenLM; same dataflow, same filter contract).
    *
    * Dataflow at 100 TB: one groupBy(token) count over the reference
    * (partial/final — hot stopwords collapse map-side), a 1-row totals
    * aggregate broadcast as a scalar, then score = explode → join on
    * token → per-doc aggregate. The count table joins by token; AQE
    * broadcasts it when small, otherwise both sides hash-partition on
    * token — never on text. Per-token NLL is rounded to 9 places and
    * accumulated in DECIMAL so the per-doc sum is identical under any
    * row order or partitioning (and replayable by an external engine).
    *
    * Output: (id, n_tok, avg_nll) per scored document. */
  def lmScore(scored: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String): DataFrame =
    lmScoreGated(scored, idCol, textCol, reference, refTextCol, LmVocabGate)

  /** [[lmScore]] with the vocabulary gate injectable — the test seam
    * that exercises the explode → join fallback (gate = 0) against the
    * compiled path on the same corpus. */
  private[graft] def lmScoreGated(scored: DataFrame, idCol: String,
      textCol: String, reference: DataFrame, refTextCol: String,
      gate: Int): DataFrame = {
    val refCounts = reference
      .select(explode(tokens(col(refTextCol))).as("_w"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_c"))
    // Size-gated compiled path (the t15 lesson): the per-token term
    // round(-ln((c+1)/(N+V)), 9) depends only on the token's reference
    // count, so a plan-constant vocabulary compiles to a token→nano-long
    // table scored in ONE codegen walk per document — no (doc, token)
    // explode, no shuffled join, no per-doc aggregation. The limit probe
    // collects at most gate+1 vocabulary rows: fewer means the probe IS
    // the whole vocabulary (N = Σc over it). Reference corpora here are
    // benchmark-sized (CCNet's KenLM side is a fixed reference, not the
    // 100 TB side); a vocabulary past the gate falls back to the
    // explode → join dataflow below, the same way ivfAssignTopLsh
    // size-gates its centroid broadcast.
    val probe = refCounts.limit(gate + 1).collect()
    if (probe.length <= gate) {
      val n = probe.iterator.map(_.getLong(1)).sum.toDouble
      val denom = n + probe.length.toDouble
      val table = probe.iterator.map { r =>
        r.getString(0) -> graft.functions.SketchExpressions.nanosOf(
          -math.log((r.getLong(1) + 1L).toDouble / denom))
      }.toMap
      val oov = graft.functions.SketchExpressions.nanosOf(
        -math.log(1.0 / denom))
      // null text drops out, matching the join path (explode of a null
      // token array emits no rows, so the document never aggregates)
      scored.where(col(textCol).isNotNull)
        .select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
        .select(col("id"), size(col("_toks")).cast("long").as("n_tok"),
          graft.functions.SketchExpressions
            .tokenNanoLookupSum(col("_toks"), table, oov).as("_nanos"))
        // convert the nano sum to double at scale 9 exactly, like the
        // join path's DECIMAL(27,9) → double: a bare long/double divide
        // rounds the long FIRST and diverges by an ulp once the sum
        // passes 2^53 (a ~500k-token document). scaledLongToDouble is
        // conf-independent — the old decimal(38,9)/1e9 divide's quotient
        // type hinged on spark.sql.decimalOperations.allowPrecisionLoss
        // and overflowed to null with precision loss disabled
        .select(col("id"), col("n_tok"),
          (graft.functions.SketchExpressions
            .scaledLongToDouble(col("_nanos"), 9) / col("n_tok"))
            .as("avg_nll"))
    } else {
      val totals = refCounts.agg(
        sum(col("_c")).cast("double").as("_n"),
        count(lit(1)).cast("double").as("_v"))
      val tok = scored.select(col(idCol).as("_id"),
        explode(tokens(col(textCol))).as("_w"))
      val nll = tok.join(refCounts, Seq("_w"), "left")
        .crossJoin(broadcast(totals))
        .select(col("_id"),
          round(-log((coalesce(col("_c"), lit(0L)) + lit(1)).cast("double")
            / (col("_n") + col("_v"))), 9).as("_nll"))
      nll.groupBy(col("_id"))
        .agg(count(lit(1)).as("n_tok"),
          (sum(col("_nll").cast(org.apache.spark.sql.types.DecimalType(27, 9)))
            .cast("double") / count(lit(1))).as("avg_nll"))
        .select(col("_id").as("id"), col("n_tok"), col("avg_nll"))
    }
  }

  /** Token-distribution drift between two slices of one corpus — the
    * data-ops gate a pipeline runs before mixing a new crawl batch into
    * a training corpus (vocabulary drift, template infestation, language
    * contamination all surface as token-frequency divergence). `inA`
    * labels slice A rows; everything else (with a non-null label
    * outcome) is slice B. Output: one row per token with its slice
    * counts and `diff_num = |c_a·N_b − c_b·N_a|` — the exact integer
    * numerator of |p_A(w) − p_B(w)| over the common denominator
    * N_a·N_b, so ranking by it ranks by probability drift with ZERO
    * floating point anywhere (the t13 determinism contract, taken one
    * step further: not even a rounded log).
    *
    * Scale shape (100 TB): ONE explode pass over the corpus, ONE
    * token-keyed aggregation with map-side partials carrying two longs
    * per token, a 1-row total broadcast, and the caller's top-k is
    * TakeOrderedAndProject. No joins. The cross-products run in
    * DecimalType(38,0) unconditionally (the s26 rule — int64 would wrap
    * silently past ~3e9 tokens per slice) and narrow back to the
    * emitted long through a guarded cast that RAISES on overflow
    * instead of mis-ranking; the decimal column is one narrow value on
    * a vocabulary-sized frame, not a corpus-sized cost. */
  def tokenDrift(df: DataFrame, textCol: String, inA: Column): DataFrame = {
    val toks = df.select(inA.as("_a"),
      explode(tokens(col(textCol))).as("_w"))
    // null slice labels count in NEITHER slice (when → otherwise(0) on
    // both sides), mirroring SQL CASE semantics exactly
    val c = toks.groupBy(col("_w")).agg(
      sum(when(col("_a"), 1L).otherwise(0L)).as("c_a"),
      sum(when(!col("_a"), 1L).otherwise(0L)).as("c_b"))
    val n = c.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    // exact DECIMAL(38,0) cross-products (c·N ≈ 1e13·1e13 = 1e26 at
    // 100 TB — a LONG product wraps silently past ~3e9 tokens/slice
    // under non-ANSI arithmetic and mis-ranks with no error; the DuckDB
    // oracle computes the same products through HUGEINT), then a
    // CHECKED narrow back to the long the entry emits: the guarded
    // branch raises instead of wrapping, so an overflow is loud in both
    // engines (DuckDB's BIGINT cast errors on overflow too).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = abs(col("c_a").cast(dec) * col("n_b").cast(dec)
      - col("c_b").cast(dec) * col("n_a").cast(dec))
    c.crossJoin(broadcast(n))
      .select(col("_w").as("token"), col("c_a"), col("c_b"),
        when(d <= lit(Long.MaxValue), d.cast("long"))
          .otherwise(raise_error(concat(
            lit("tokenDrift diff_num overflows BIGINT for token "),
            col("_w")))).as("diff_num"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, arXiv:2302.03169):
    * each document scores by how target-like its unigram distribution
    * is — Σ_tokens ln(p_target(w) / p_raw(w)), add-1 smoothed, where
    * target is the `targetLang` slice of the SAME corpus and raw is the
    * whole corpus. Per-token terms are rounded to 9 decimals and
    * carried as nano-unit LONGS (the [[lmScore]] contract), so the
    * per-doc sum is integer-exact under any partitioning.
    *
    * Output: (id, lang, n_tok, score_nanos) per non-null-text document.
    *
    * Scale/compile posture mirrors [[lmScore]]: both count tables are
    * FEATURE-space-sized (hashed n-gram buckets in production, raw
    * vocabulary here). When the raw vocabulary fits the plan-constant
    * gate the whole score compiles to one token→nano table walked in a
    * single codegen pass per document — no explode, no shuffled count
    * joins, no broadcast-stat jobs (the N/V/target-total constants fold
    * into the table at plan time). Past the gate: the explode → two
    * broadcast joins → one doc-keyed aggregation dataflow. */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
      langCol: String, targetLang: String): DataFrame =
    dsirScoreGated(df, idCol, textCol, langCol, targetLang, LmVocabGate)

  /** [[dsirScore]] with the vocabulary gate injectable (test seam). */
  private[graft] def dsirScoreGated(df: DataFrame, idCol: String,
      textCol: String, langCol: String, targetLang: String,
      gate: Int): DataFrame = {
    val toks = df.select(col(idCol).as("_id"), col(langCol).as("_lang"),
      explode(tokens(col(textCol))).as("_t"))
    val rawC = toks.groupBy(col("_t")).agg(count(lit(1)).as("_rc"))
    val tgtC = toks.where(col("_lang") === targetLang)
      .groupBy(col("_t")).agg(count(lit(1)).as("_tc"))
    // Cheap pre-gate (ADVICE r13): unlike lmScore, whose reference side
    // is benchmark-sized by contract, the raw counts here aggregate the
    // WHOLE corpus — an over-gate corpus would pay one full token
    // aggregation at DataFrame-construction time just to learn it must
    // take the dataflow route. Consult plan statistics first (the
    // statsBytes posture): past 64 MB of estimated uncompressed text
    // the vocabulary cannot plausibly fit the plan-constant gate, and
    // at that size the explode → broadcast-join dataflow is the right
    // plan regardless, so the exact probe is skipped without any job.
    val probeWorthRunning = graft.operators.Dedup.statsBytes(df)
      .forall(_ <= (64L << 20))
    val probe =
      if (probeWorthRunning) rawC.limit(gate + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (probeWorthRunning && probe.length <= gate) {
      // target vocabulary ⊆ raw vocabulary, so the raw probe passing the
      // gate bounds the target collect too. Constants fold on the
      // driver; per-token double arithmetic mirrors the join path's
      // cast/multiply/divide order exactly (cast each exact-integer
      // factor to double, multiply once, divide once) so both routes
      // round the same doubles to the same nano-longs.
      val tgt = tgtC.collect()
      val rtot = probe.iterator.map(_.getLong(1)).sum
      val vsz = probe.length.toLong
      val ttot = tgt.iterator.map(_.getLong(1)).sum
      val tmap = tgt.iterator
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val table = probe.iterator.map { r =>
        val t = r.getString(0)
        val a = (tmap.getOrElse(t, 0L) + 1L).toDouble *
          (rtot + vsz).toDouble
        val b = (r.getLong(1) + 1L).toDouble * (ttot + vsz).toDouble
        t -> graft.functions.SketchExpressions.nanosOf(math.log(a / b))
      }.toMap
      // default is unreachable: every corpus token is in the raw
      // vocabulary the table was built from
      df.where(col(textCol).isNotNull)
        .select(col(idCol).as("id"), col(langCol).as("lang"),
          tokens(col(textCol)).as("_toks"))
        .select(col("id"), col("lang"),
          size(col("_toks")).cast("long").as("n_tok"),
          graft.functions.SketchExpressions
            .tokenNanoLookupSum(col("_toks"), table, 0L).as("score_nanos"))
    } else {
      val consts = rawC.agg(sum(col("_rc")).as("_rtot"),
          count(lit(1)).as("_vsz"))
        .crossJoin(toks.where(col("_lang") === targetLang)
          .agg(count(lit(1)).as("_ttot")))
      val ratio =
        ((coalesce(col("_tc"), lit(0L)) + 1L).cast("double") *
          (col("_rtot") + col("_vsz")).cast("double")) /
        ((col("_rc") + 1L).cast("double") *
          (col("_ttot") + col("_vsz")).cast("double"))
      val nanos = round(round(log(ratio), 9) * lit(1e9), 0).cast("long")
      toks.join(broadcast(rawC), Seq("_t"))
        .join(broadcast(tgtC), Seq("_t"), "left")
        .crossJoin(broadcast(consts))
        .groupBy(col("_id"))
        .agg(max(col("_lang")).as("lang"),
          count(lit(1)).as("n_tok"),
          sum(nanos).as("score_nanos"))
        .select(col("_id").as("id"), col("lang"), col("n_tok"),
          col("score_nanos"))
    }
  }

  /** Interpolated bigram LM scoring — the n-gram upgrade of [[lmScore]]
    * (real perplexity filters are n-gram models, not unigram bags):
    * per adjacent token pair,
    *   nll = −ln( λ·(c(w1,w2)+1)/(c(w1)+V) + (1−λ)·(c(w2)+1)/(N+V) )
    * with add-1 smoothing in both components, counts from a reference
    * corpus. Degenerate documents (< 2 tokens) drop out — they have no
    * bigram evidence, and a curation pipeline gates those on length
    * (t17/p10), not perplexity.
    *
    * 100 TB shape: bigrams are extracted MAP-SIDE by zipping the token
    * array with its own tail (no posexplode self-join); the shuffle
    * carries (doc, w1, w2) hit rows, and the reference tables join by
    * their keys (AQE broadcasts while they fit). Determinism: per-pair
    * round-9 + DECIMAL accumulation (the t13 contract).
    *
    * Output: (id, n_pairs, avg_nll). */
  def bigramLmScore(scored: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      lambda: Double = 0.5): DataFrame =
    bigramLmScoreGated(scored, idCol, textCol, reference, refTextCol,
      lambda, LmVocabGate)

  /** [[bigramLmScore]] with the table gate injectable (test seam — see
    * [[lmScoreGated]]). */
  private[graft] def bigramLmScoreGated(scored: DataFrame, idCol: String,
      textCol: String, reference: DataFrame, refTextCol: String,
      lambda: Double, gate: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(27, 9)
    def bigrams(textCol: Column): Column = {
      val t = tokens(textCol)
      arrays_zip(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))))
    }
    val refBi = reference
      .select(explode(bigrams(col(refTextCol))).as("_p"))
      .select(col("_p").getField("0").as("_w1"),
        col("_p").getField("1").as("_w2"))
      .groupBy(col("_w1"), col("_w2"))
      .agg(count(lit(1)).as("_cb"))
    val refUni = reference
      .select(explode(tokens(col(refTextCol))).as("_w"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_cu"))
    // Size-gated compiled path (the t13/t15 lesson, extended to two
    // tables): when both the unigram vocabulary and the bigram table fit
    // the plan-constant gate, reference bigrams pre-round to nano-longs
    // at plan time and scoring is one codegen walk over each document's
    // token array (BigramNanoSum) — no bigram explode, no three shuffled
    // count joins, no per-doc aggregation. The probes collect at most
    // gate+1 rows each; the unigram probe doubles as (N, V). Larger
    // references fall back to the explode → join dataflow below.
    val uniProbe = refUni.limit(gate + 1).collect()
    if (uniProbe.length <= gate) {
      val biProbe = refBi.limit(gate + 1).collect()
      if (biProbe.length <= gate) {
        val nTok = uniProbe.iterator.map(_.getLong(1)).sum.toDouble
        val vCnt = uniProbe.length.toDouble
        val uni = uniProbe.iterator
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val bi = biProbe.iterator
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        return scored.where(col(textCol).isNotNull)
          .select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
          .where(size(col("_toks")) >= 2)
          .select(col("id"),
            (size(col("_toks")) - 1).cast("long").as("n_pairs"),
            graft.functions.SketchExpressions.bigramNanoSum(
              col("_toks"), uni, bi, lambda, nTok, vCnt).as("_nanos"))
          // the join path rounds the DECIMAL(27,9) sum to 6 places
          // before the divide; on non-negative nano-longs that is
          // (nanos + 500) div 1000 micros, converted to double at
          // scale 6 exactly (same 2^53 double-rounding guard and same
          // conf-independence note as lmScore above)
          .select(col("id"), col("n_pairs"),
            (graft.functions.SketchExpressions.scaledLongToDouble(
              expr("(_nanos + 500) div 1000"), 6)
              / col("n_pairs")).as("avg_nll"))
      }
    }
    val totals = refUni.agg(
      sum(col("_cu")).cast("double").as("_n"),
      count(lit(1)).cast("double").as("_v"))
    val pairs = scored
      .select(col(idCol).as("_id"), explode(bigrams(col(textCol))).as("_p"))
      .select(col("_id"), col("_p").getField("0").as("_w1"),
        col("_p").getField("1").as("_w2"))
    val nll = pairs
      .join(refBi, Seq("_w1", "_w2"), "left")
      .join(refUni.withColumnRenamed("_w", "_w1")
        .withColumnRenamed("_cu", "_c1"), Seq("_w1"), "left")
      .join(refUni.withColumnRenamed("_w", "_w2")
        .withColumnRenamed("_cu", "_c2"), Seq("_w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col("_id"),
        round(-log(
          lit(lambda) *
            ((coalesce(col("_cb"), lit(0L)) + lit(1)).cast("double")
              / (coalesce(col("_c1"), lit(0L)).cast("double") + col("_v")))
          + lit(1.0 - lambda) *
            ((coalesce(col("_c2"), lit(0L)) + lit(1)).cast("double")
              / (col("_n") + col("_v")))), 9).as("_nll"))
    nll.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_pairs"),
        (round(sum(col("_nll").cast(dec)), 6).cast("double")
          / count(lit(1))).as("avg_nll"))
      .select(col("_id").as("id"), col("n_pairs"), col("avg_nll"))
  }

  // --------------------------------------------------------------- TF-IDF

  /** Per-document TF-IDF mass: score(d) = Σ_t (c_td / |d|) · ln(N / df_t)
    * over the document's own terms — the relevance/distinctiveness score
    * a curation pipeline uses for keyword weighting, near-boilerplate
    * down-ranking, and per-source vocabulary drift tracking.
    *
    * Dataflow at 100 TB: explode → groupBy(doc, token) — partial
    * aggregation collapses repeated terms map-side, so the shuffle
    * carries (doc_id, token, count), never document text. The
    * document-frequency table is a second groupBy over those counts
    * keyed by token alone; it joins back by token, where AQE broadcasts
    * it while it fits and hash-partitions both sides on token otherwise.
    * The corpus size N is a 1-row aggregate broadcast as a scalar.
    *
    * Determinism (the t13 contract): each per-term product is rounded to
    * 9 places and accumulated in DECIMAL(27,9), so the per-doc sum is
    * identical under any row order or partitioning and replayable by an
    * external engine.
    *
    * Output: (id, n_tokens, tfidf) per document. */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol).as("_id"),
        explode(tokens(col(textCol))).as("_w"))
      .groupBy(col("_id"), col("_w"))
      .agg(count(lit(1)).as("_c"))
    val lens = tf.groupBy(col("_id")).agg(sum(col("_c")).as("_len"))
    val dfT = tf.groupBy(col("_w")).agg(count(lit(1)).as("_df"))
    val n = df.agg(count(lit(1)).cast("double").as("_n"))
    tf.join(dfT, Seq("_w"))
      .join(lens, Seq("_id"))
      .crossJoin(broadcast(n))
      .select(col("_id"), col("_len"),
        round((col("_c").cast("double") / col("_len"))
          * log(col("_n") / col("_df")), 9).as("_s"))
      .groupBy(col("_id"))
      .agg(min(col("_len")).as("n_tokens"),
        // round the exact DECIMAL, then cast: rounding after the
        // decimal→double conversion is engine-dependent when the exact
        // sum ends in ...5 at the 7th decimal (a real t14 corpus case:
        // 0.2525975 → 0.252598 here, 0.252597 in DuckDB)
        round(sum(col("_s").cast(org.apache.spark.sql.types.DecimalType(27, 9))),
          6).cast("double").as("tfidf"))
      .select(col("_id").as("id"), col("n_tokens"), col("tfidf"))
  }

  // ------------------------------------------- linear classifier scoring

  /** fastText-style linear text classifier applied at corpus scale
    * (Joulin et al., 2017, arXiv:1607.01759: a quality/domain classifier
    * is a weight per vocabulary term + a bias; score = σ(b + Σ w_t·tf_t)).
    * The classic curation gate — CCNet/Llama-style "does this look like a
    * reference page" filtering — is exactly this shape.
    *
    * Dataflow at 100 TB — the point of the operator: the vocabulary is
    * BOUNDED (fastText prunes to a fixed table; `vocabSize` here), so the
    * weights collapse to a plan-constant literal map and scoring is
    * MAP-ONLY — no explode, no join, no shuffle of any kind on the scored
    * corpus. One `functions.aggregate` walks each document's token array
    * inside whole-stage codegen; a 100 TB corpus scores in a single scan.
    * Compare `lmScore`/`tfidf`, which must shuffle (their vocabulary is
    * unbounded). Building the vocab costs one small groupBy over the
    * REFERENCE corpus only (typically ~1000× smaller than the scored
    * corpus), with the same bounded-driver-collect contract as the BPE
    * vocab (`Bpe.scala`): `vocabSize` rows, plan-time.
    *
    * In-container stand-in for trained weights (deterministic, externally
    * replayable): vocabulary = top-`vocabSize` reference tokens by
    * document frequency (ties broken lexicographically), weight_t =
    * ln(N_ref/df_t) rounded to 6 places, signed + for tokens < "m" and −
    * otherwise. Swapping in real trained weights changes none of the
    * dataflow. Per-token terms are rounded to 9 places and accumulated in
    * DECIMAL(27,9) — the t13 determinism contract — so the score is
    * identical under any partitioning and replayable by an external
    * engine.
    *
    * Output: (id, n_tok, score, keep) — keep = score ≥ 0.5. */
  def linearClassifierScore(scored: DataFrame, idCol: String,
      textCol: String, reference: DataFrame, refTextCol: String,
      vocabSize: Int = 32, bias: Double = -0.25): DataFrame = {
    require(vocabSize > 0 && vocabSize <= 65536,
      s"vocabSize $vocabSize outside (0, 65536] — the weight table is a " +
        "plan-constant literal and must stay broadcast-sized")
    val nRef = reference.count().toDouble
    val weights: Map[String, Double] = reference
      .select(explode(array_distinct(tokens(col(refTextCol)))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_df"))
      .orderBy(col("_df").desc, col("_w").asc)
      .limit(vocabSize) // TakeOrdered — deterministic under ties
      .collect() // bounded: vocabSize rows, plan-time (the Bpe contract)
      .map { r =>
        val w = r.getString(0)
        val wt = math.rint(math.log(nRef / r.getLong(1)) * 1e6) / 1e6
        w -> (if (w < "m") wt else -wt)
      }.toMap
    // scoring loop is ONE compiled pass per row (WeightedNanoSum):
    // per-token round-9 terms are exact multiples of 1e-9, so the
    // nano-unit long sum equals the old DECIMAL(27,9) accumulation
    // term-for-term (and /1e9 below is the same double the decimal
    // cast produced) — the aggregate() HOF version ran interpreted
    // with a BigDecimal add and an O(vocab) literal-map scan per token
    val toks = tokens(col(textCol))
    scored
      .select(col(idCol).as("id"), toks.as("_toks"),
        size(toks).cast("long").as("n_tok"))
      .select(col("id"), col("n_tok"),
        graft.functions.SketchExpressions
          .weightedNanoSum(col("_toks"), weights).as("_nanos"))
      .select(col("id"), col("n_tok"),
        round(lit(1.0) / (lit(1.0)
          + exp(-(lit(bias) + col("_nanos") / lit(1e9)))), 4).as("score"))
      .withColumn("keep", col("score") >= 0.5)
  }

  // ------------------------------------------------------- log templates

  /** Variable-token masking rules for log-template mining, applied in
    * order (the masking half of Drain — He et al., ICWS 2017): UUIDs
    * before hex runs (a UUID's groups are hex), IPv4 before bare
    * numbers (an IP's octets are numbers), hex runs before numbers
    * (a hex run may be all digits). Every pattern stays inside the
    * Java-regex ∩ RE2 common dialect so a DuckDB oracle replays the
    * exact chain. */
  val templateRules: Seq[(String, String)] = Seq(
    "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
      -> "<uuid>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<ip>",
    "\\b[0-9a-f]{12,}\\b" -> "<hex>",
    "[0-9]+" -> "<num>")

  /** Collapse a raw log message to its TEMPLATE by masking the variable
    * tokens ([[templateRules]]) — map-side, zero shuffle, the masking
    * half of log-pattern mining. Compiled as ONE hand-rolled codegen
    * scan ([[graft.functions.LogMask]]) rather than four sequential
    * `regexp_replace` passes: the chain re-walks and re-allocates every
    * message through java.util.regex four times (~5 µs/line — the whole
    * cost of the entry), while the compiled form is value-identical by
    * construction (LogMaskSpec pins equivalence against this exact rule
    * chain on planted + property-generated corpora). */
  def logTemplate(msgCol: Column): Column =
    graft.functions.LogMask.logTemplate(msgCol)

  /** The reference spelling of [[logTemplate]] — the literal rule chain,
    * kept as the executable SPEC the equivalence test replays (and the
    * exact chain the DuckDB oracle runs). */
  def logTemplateRegex(msgCol: Column): Column =
    templateRules.foldLeft(msgCol) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Log-pattern mining: group messages by [[logTemplate]] and emit
    * (template, n, example) where example is the lexicographically
    * smallest raw message of the template (deterministic under any
    * partitioning). 100 TB shape: masking is map-side codegen; the ONE
    * shuffle carries (template, partial count, partial min-example) —
    * partial-aggregated, so each map task contributes at most one row
    * per distinct template, and template counts are tiny by
    * construction (that is the point of the operator). */
  def logTemplates(df: DataFrame, msgCol: Column): DataFrame =
    df.select(logTemplate(msgCol).as("template"), msgCol.as("_msg"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n"), min(col("_msg")).as("example"))
}

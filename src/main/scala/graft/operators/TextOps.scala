package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFuns

/** Text-analysis operators (SURVEY.md §2-B rows 31-34): language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All four are single-pass row-level expression pipelines (no shuffle
  * except the fingerprint's per-doc min) that stay inside WholeStageCodegen
  * — exactly what you want when the corpus is 100 TB: cost is one scan.
  */
object TextOps {

  /** Marker-word sets per language. The synthetic corpus shares one
    * vocabulary, so these act as a deterministic n-gram-style heuristic
    * (the real-corpus analog would use per-language stopword lists). */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "fr" -> Seq("table", "part"),
    "de" -> Seq("window", "batch"),
    "es" -> Seq("data", "row"),
    "zh" -> Seq("vector", "stream"))

  /** Argmax over per-language marker scores with deterministic priority =
    * declaration order ([[Markers]]); `scores(i)` is the hit count for
    * `Markers(i)`. */
  private def argmaxLang(scores: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column = {
    val langs = Markers.map(_._1)
    langs.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), els) =>
      val rest = (i + 1) until langs.length
      if (rest.isEmpty) els
      else when(rest.map(r => scores(i) >= scores(r)).reduce(_ && _), lit(l))
        .otherwise(els)
    }
  }

  /** Language prediction as a single row-level Column (for composition in
    * corpus-wide pipelines — same semantics as [[langId]]'s pred_lang). */
  def predLang(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = TextFuns.tokens(text)
    argmaxLang(Markers.map { case (_, ws) =>
      size(filter(toks, t => t.isin(ws.map(lit(_)): _*)))
    })
  }

  /** §2-31 `q_lang_id`: marker-word language identification — count marker
    * hits per language over the token array (higher-order `filter`, no
    * explode), argmax with a fixed priority order for ties. */
  def langId(documents: DataFrame): DataFrame = {
    val toks = TextFuns.tokens(col("text"))
    val scored = documents.select(
      (col("doc_id") +: Markers.map { case (l, ws) =>
        size(filter(toks, t => t.isin(ws.map(lit(_)): _*))).as(s"s_$l")
      }): _*)
    scored
      .withColumn("pred_lang",
        argmaxLang(Markers.map { case (l, _) => col(s"s_$l") }))
      .orderBy("doc_id")
  }

  /** Stopword list for the quality heuristic. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Quality score as a single row-level Column (same formula as
    * [[quality]]'s quality_score — token count, stopword ratio, average
    * token length band; the operands are identical doubles). */
  def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = TextFuns.norm(text)
    val toks = TextFuns.tokens(text)
    val nTokens = size(toks)
    val avgLen = (length(t) - (nTokens - 1)) * lit(1.0) / nTokens
    val stopRatio =
      size(filter(toks, tk => tk.isin(Stopwords.map(lit(_)): _*))) * lit(1.0) / nTokens
    least(lit(1.0), nTokens / 100.0) * 0.6 + stopRatio * 0.2 +
      when(avgLen >= 3.0 && avgLen <= 8.0, 0.2).otherwise(0.0)
  }

  /** §2-32 `q_quality`: document quality scoring from surface statistics —
    * token count, average token length, stopword ratio (reference-style
    * heuristics scaled to row-level expressions; cf. published quality
    * filters à la C4/Gopher rules). All ratios divide identical operands
    * in both engines, so no rounding is needed. */
  def quality(documents: DataFrame): DataFrame = {
    val t = TextFuns.norm(col("text"))
    val toks = TextFuns.tokens(col("text"))
    documents.select(col("doc_id"),
      length(t).as("n_chars_norm"),
      size(toks).as("n_tokens"),
      ((length(t) - (size(toks) - 1)) * lit(1.0) / size(toks)).as("avg_token_len"),
      (size(filter(toks, tk => tk.isin(Stopwords.map(lit(_)): _*))) * lit(1.0)
        / size(toks)).as("stopword_ratio"))
      .withColumn("quality_score",
        least(lit(1.0), col("n_tokens") / 100.0) * 0.6
          + col("stopword_ratio") * 0.2
          + when(col("avg_token_len") >= 3.0 && col("avg_token_len") <= 8.0, 0.2)
            .otherwise(0.0))
      .orderBy("doc_id")
  }

  /** §2-33 `q_tokens`: token counting — whitespace tokens and a BPE-ish
    * regex segmentation (letter runs / digit runs / single other chars),
    * plus a chars-per-token ratio (the usual tokens≈chars/4 estimator). */
  def tokenCounts(documents: DataFrame): DataFrame = {
    val t = TextFuns.norm(col("text"))
    documents.select(col("doc_id"),
      size(TextFuns.tokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(t, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_bpe_tokens"),
      length(t).as("n_chars_norm"))
      .withColumn("chars_per_token",
        col("n_chars_norm") * lit(1.0) / col("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** §2-113 `q_seqlen_hist`: per-source sequence-length histogram over
    * the BPE-ish token count — the PACKING PLANNER's input: bin counts
    * tell you how many docs fit a context window whole, how many must
    * chunk, and what `q_pack`'s bin utilization will be BEFORE running
    * it. One row per (source, bin of `binWidth` tokens), with each
    * bin's doc count, token mass, and its share of the source's docs.
    *
    * Shape: row-level token count (codegen'd regex, no explode) → ONE
    * shuffle on (source, bin) with map-side partials → per-source
    * totals as a window over the bin frame (sources × bins rows — KBs).
    * The share division is exact-integer → IEEE, oracle-hashable. */
  def seqlenHist(documents: DataFrame, binWidth: Int = 32): DataFrame = {
    val t = TextFuns.norm(col("text"))
    val nTok = size(regexp_extract_all(t, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    val binned = documents
      .select(col("source"), nTok.cast("long").as("n_tok"))
      .withColumn("bin", (col("n_tok") / binWidth).cast("long") * binWidth)
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    binned
      .withColumn("doc_share",
        col("n_docs") * lit(1.0) / sum(col("n_docs")).over(w))
      .orderBy("source", "bin")
  }

  /** §2-84 `q_hash_embed`: feature-hashed bag-of-words embedding — the
    * "hashing trick": every token maps to one of `dims` slots by a hash
    * of the token itself (no vocabulary, no model, no training pass),
    * with a ±1 sign bit from the next hash character so collisions
    * cancel in expectation (the signed variant that keeps inner
    * products unbiased). This is the model-free featurization bridge
    * from the documents world to the embedding estate: its output is a
    * sparse integer vector per doc that the dedup/ANN family
    * (cosine blocking, k-means, PQ) can consume when no learned
    * embedding exists — the classic first-pass clustering
    * representation for a raw crawl.
    *
    * Cross-engine exactness: slot = (first md5 hex byte) mod dims and
    * sign = (third hex char < '8') are pure string/integer operations
    * on the SAME md5 both engines compute — no engine hash function
    * (DuckDB's hash() is murmur-incompatible with Spark's xxhash64),
    * no float. Values are exact int64 sums of ±1 — hash-checked.
    *
    * Scale: ONE shuffle, keyed (doc_id, slot) with map-side partials —
    * the token stream never moves un-aggregated; slot/sign are
    * codegen'd row-level expressions. Output is the sparse long form
    * (doc_id, slot, v) with only occupied slots, like q_quantize's. */
  def hashEmbed(documents: DataFrame, dims: Int = 64): DataFrame = {
    val t = documents
      .select(col("doc_id"), explode(TextFuns.tokens(col("text"))).as("term"))
      .withColumn("h", md5(col("term").cast("binary")))
      .select(col("doc_id"),
        (conv(substring(col("h"), 1, 2), 16, 10).cast("int") % dims).as("slot"),
        when(substring(col("h"), 3, 1) < "8", lit(1L)).otherwise(lit(-1L))
          .as("sgn"))
    t.groupBy(col("doc_id"), col("slot"))
      .agg(sum(col("sgn")).cast("bigint").as("v"))
      .orderBy("doc_id", "slot")
  }

  /** [[hashEmbed]] assembled into the DENSE (vec_id, label, embedding)
    * layout the embedding estate consumes — the documents→index bridge
    * made physical: hashEmbedDense → [[AnnOps.kmeans]] →
    * [[AnnOps.annIvf]]/[[AnnOps.pqSearch]] is a complete model-free
    * retrieval index over a raw text corpus (composition spec-asserted:
    * a planted near-dup doc ranks top-1 for its twin's query vector).
    * Values stay the exact small-integer sums (ints are exact floats),
    * `label` is a placeholder 0 — kmeans LEARNS the cells downstream.
    * Built on [[hashEmbed]] itself so slot/sign can never drift; the
    * assembly adds one (doc_id)-keyed shuffle of ≤ dims-row groups.
    * Note the index family's |component| ≤ 100 guard: a doc whose net
    * signed count in one slot exceeds 100 drops from the downstream fit
    * — fine for quality-bounded corpora; scale-normalize first if
    * feeding book-length documents. */
  def hashEmbedDense(documents: DataFrame, dims: Int = 64): DataFrame =
    hashEmbed(documents, dims)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("slot"), col("v"))).as("sv"))
      .select(col("doc_id").as("vec_id"), lit(0).as("label"), expr(
        s"transform(sequence(0, ${dims - 1}), i -> " +
          "cast(coalesce(element_at(map_from_entries(sv), i), " +
          "cast(0 as bigint)) as float))").as("embedding"))

  /** §2-34 `q_fingerprint`: winnowing-style document fingerprint — the
    * minimum md5 over char 16-gram shingles (the min-hash member of the
    * winnowing window family), plus the shingle count. Computed entirely
    * row-level in ONE pass by the native `fingerprint_min` expression
    * (graft.plans.FingerprintMin — minimum tracked on raw digest bytes,
    * bit-identical to the `transform`+`array_min` HOF formulation, which
    * allocated a hex string per position and ran interpreted): no
    * explode, no shuffle — a pure map over the corpus. */
  def fingerprint(documents: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(documents.sparkSession)
    documents
      .repartition(documents.sparkSession.sparkContext.defaultParallelism)
      .filter(length(TextFuns.norm(col("text"))) >= 16)
      .select(col("doc_id"), TextFuns.norm(col("text")).as("t"))
      .select(col("doc_id"),
        call_function("fingerprint_min", col("t"), lit(16)).as("fingerprint"),
        (length(col("t")) - 15).cast("long").as("n_shingles"))
      .orderBy("doc_id")
  }

  /** Escape a probe phrase into a regex LITERAL that Java and RE2
    * (DuckDB) read identically: backslash every char outside
    * [a-zA-Z0-9 ] (both engines treat escaped punctuation as the
    * literal char; a space is left bare because RE2 rejects `\ `).
    * Today's probes are plain lowercase phrases and pass through
    * unchanged — this guards the FUTURE probe containing `.` or `+`,
    * which would otherwise silently change matching on both engines
    * (and differently on each). Exposed for the invariant spec. */
  private[graft] def regexLiteral(s: String): String =
    s.replaceAll("([^a-zA-Z0-9 ])", "\\\\$1")

  /** Redaction pattern chain, applied IN ORDER to the running text (so a
    * later pattern never re-matches inside an earlier replacement):
    * emails, IPv4s, long digit runs (phone/ID-ish), then the eval-probe
    * phrases ([[CorpusOps.Probes]] — in-place decontamination: scrub the
    * leaked eval text instead of dropping the whole document).
    *
    * Regex subset chosen for cross-engine identity: character classes +
    * greedy counted quantifiers only for the PII patterns, and an
    * escaped-literal alternation for the probes whose branches start
    * with distinct first tokens and are mutually non-prefix
    * (spec-asserted over [[CorpusOps.Probes]]) — shapes on which Java's
    * leftmost-first and RE2's (DuckDB's) leftmost-longest semantics
    * provably agree: at any position at most ONE branch can match, so
    * branch preference never arises. */
  val RedactPatterns: Seq[(String, String, String)] = Seq(
    ("n_email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
    ("n_ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("n_num", "\\d{7,}", "[NUM]"),
    ("n_probe", CorpusOps.Probes.map(regexLiteral).mkString("|"), "[REDACTED]"))

  /** Per-doc augmentation suffixes for `q_gopher` — shared VERBATIM by
    * both engines (doc_id % 4 selects), so the symbol/line rules
    * genuinely vary: a hash-heavy non-alpha tail, a bullet-list tail,
    * and an ellipsis-ended-lines tail. */
  private[graft] val GopherAug: Seq[String] = Seq(
    "",
    "\n####### ###### ##### #### ###",
    "\n- one\n- two\n- three\n- four\n- five\n- six\n- seven" +
      "\n- eight\n- nine\n- ten",
    "\nread more...\nto be continued...")

  /** The Gopher rule set's stopword presence list (Rae et al. 2021,
    * table A1: ≥2 of these must appear). */
  private[graft] val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** §2 `q_gopher`: the FULL published Gopher quality-rule set (Rae et
    * al. 2021, "Scaling Language Models", appendix A1.1) — `q_quality`
    * scores three surface statistics; this gate evaluates all eight
    * documented rules, each INTEGER-EXACT (every ratio threshold is a
    * cross-multiplied integer comparison — the estate's hash-exactness
    * discipline; no float ratio ever forms):
    *  1. word count in [50, 100 000];
    *  2. mean word length in [3, 10] (3·n ≤ totalLen ≤ 10·n);
    *  3. hash-symbol share ≤ 0.1 (hash·10 ≤ n);
    *  4. ellipsis share ≤ 0.1 (diff·10 ≤ 3·n — the `...` count rides
    *     its ×3 length difference, division-free);
    *  5. bullet-started lines ≤ 90% (bullets·10 ≤ 9·lines);
    *  6. ellipsis-ended lines ≤ 30% (ends·10 ≤ 3·lines);
    *  7. alphabetic-word share ≥ 80% (alpha·5 ≥ 4·n);
    *  8. ≥ 2 distinct [[GopherStops]] present.
    * The corpus is augmented per doc ([[GopherAug]], both engines) so
    * rules 3-6 genuinely vary; 1-2 and 7-8 vary with the corpus.
    * Output: counts + one boolean per rule + the AND (`gopher_pass`).
    * Pure row-level map, zero shuffles — the shape of a 100 TB
    * quality gate (it fuses into the ingest scan like q_quality).
    *
    * The q_ key applies the synthetic [[GopherAug]] suffixes to the
    * corpus BEFORE the call (both engines identically), so the general
    * face [[gopherOf]] sees only the user's `text` column — the
    * operator-vs-fixture separation (the `crawlTrapsBy` convention). */
  def gopher(documents: DataFrame): DataFrame = {
    val aug = when(col("doc_id") % 4 === 1, lit(GopherAug(1)))
      .when(col("doc_id") % 4 === 2, lit(GopherAug(2)))
      .when(col("doc_id") % 4 === 3, lit(GopherAug(3)))
      .otherwise(lit(""))
    gopherOf(documents.withColumn("text", concat(col("text"), aug)))
  }

  /** [[gopherOf]]'s eight-rule verdict as ONE row-level boolean Column
    * over a text expression — the form [[CorpusOps.curateFullOf]] fuses
    * into its single gate scan (an operator call would be a second
    * subtree). Kept textually beside [[gopherOf]] and PINNED equivalent
    * to its `gopher_pass` by spec so the two cannot drift; repeated
    * sub-expressions (tokens/lines) are collapsed by codegen
    * subexpression elimination within the project. */
  def gopherPassCol(t: Column): Column = {
    val nrm = TextFuns.norm(t)
    val toks = TextFuns.tokens(t)
    val lines = split(t, "\n")
    val nWords = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    val totalLen = (length(nrm) - (size(toks) - 1)).cast("long")
    val hashCnt = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    val ell3 = (length(t) - length(replace(t, lit("..."), lit("")))).cast("long")
    val bullets = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellend = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val alpha = size(filter(toks, tk => tk.rlike("[a-z]"))).cast("long")
    val stops = GopherStops.map(s =>
      when(array_contains(toks, s), 1).otherwise(0)).reduce(_ + _)
    (nWords >= 50 && nWords <= 100000) &&
      (totalLen >= nWords * 3 && totalLen <= nWords * 10) &&
      (hashCnt * 10 <= nWords) && (ell3 * 10 <= nWords * 3) &&
      (bullets * 10 <= nLines * 9) && (ellend * 10 <= nLines * 3) &&
      (alpha * 5 >= nWords * 4) && (stops >= 2)
  }

  /** The fixture-free face of [[gopher]]: the full published Gopher
    * rule set over the frame's OWN `text` column, no augmentation —
    * what a user runs on their corpus. Requires (doc_id, text). */
  def gopherOf(documents: DataFrame): DataFrame = {
    val t2 = col("text")
    val nrm = TextFuns.norm(t2)
    val toks = TextFuns.tokens(t2)
    val lines = split(t2, "\n")
    documents
      .select(col("doc_id"),
        size(toks).cast("long").as("n_words"),
        size(lines).cast("long").as("n_lines"),
        (length(nrm) - (size(toks) - 1)).cast("long").as("_total_len"),
        (length(t2) - length(replace(t2, lit("#"), lit(""))))
          .cast("long").as("_hash_cnt"),
        (length(t2) - length(replace(t2, lit("..."), lit(""))))
          .cast("long").as("_ell3"),
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ")))
          .cast("long").as("_bullets"),
        size(filter(lines, l => l.endsWith("...")))
          .cast("long").as("_ellend"),
        size(filter(toks, tk => tk.rlike("[a-z]")))
          .cast("long").as("_alpha"),
        GopherStops.map(s =>
          when(array_contains(toks, s), 1).otherwise(0))
          .reduce(_ + _).as("_stops"))
      .select(col("doc_id"), col("n_words"), col("n_lines"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("wc_ok"),
        (col("_total_len") >= col("n_words") * 3 &&
          col("_total_len") <= col("n_words") * 10).as("mean_len_ok"),
        (col("_hash_cnt") * 10 <= col("n_words")).as("hash_ok"),
        (col("_ell3") * 10 <= col("n_words") * 3).as("ellipsis_ok"),
        (col("_bullets") * 10 <= col("n_lines") * 9).as("bullets_ok"),
        (col("_ellend") * 10 <= col("n_lines") * 3).as("ell_lines_ok"),
        (col("_alpha") * 5 >= col("n_words") * 4).as("alpha_ok"),
        (col("_stops") >= 2).as("stop_ok"))
      .withColumn("gopher_pass",
        col("wc_ok") && col("mean_len_ok") && col("hash_ok") &&
          col("ellipsis_ok") && col("bullets_ok") && col("ell_lines_ok") &&
          col("alpha_ok") && col("stop_ok"))
      .orderBy("doc_id")
  }

  /** Planted material for `q_c4_clean`, shared VERBATIM by both
    * engines: three always-appended GOOD lines (the synthetic base
    * line carries no terminal punctuation, so these make the kept set
    * non-trivial), and per-doc%5 bad tails — an unpunctuated line, a
    * four-word line, a lorem-ipsum page marker, a code brace. */
  private[graft] val C4Good: String =
    "\nThis first planted line definitely has enough words and ends properly." +
      "\nThe second planted line also carries plenty of words and a stop." +
      "\nFinally a third planted line completes the minimum sentence count."
  private[graft] val C4Aug: Seq[String] = Seq(
    "",
    "\nshort line",
    "\nOnly four words here.",
    "\nlorem ipsum dolor sit amet.",
    "\nif (x) { return 1; }")

  /** §2 `q_c4_clean`: the C4 line-filtering pipeline (Raffel et al.
    * 2020 §2.2 — the OTHER canonical published cleaning recipe beside
    * [[gopher]]'s thresholds, and unlike it a TRANSFORM, not just a
    * gate): keep only lines that END IN TERMINAL PUNCTUATION
    * (`.` `!` `?` `"`) and carry ≥ 5 words; drop the PAGE when it
    * contains `lorem ipsum` or a code brace `{`, or when fewer than 3
    * lines survive (the paper's three-sentence floor in this
    * pipeline's line units); survivors re-join in order. Output
    * (doc_id, n_lines, n_kept, page_ok, kept_text — NULL for dropped
    * pages), the kept TEXT byte-identical across engines (the
    * q_substring_excise_text discipline). Pure row-level map, zero
    * shuffles — fuses into the ingest scan.
    *
    * The q_ key applies the planted [[C4Good]]/[[C4Aug]] material to
    * the corpus BEFORE the call (both engines identically); the general
    * face [[c4CleanOf]] sees only the user's `text` column (the
    * operator-vs-fixture separation, the `crawlTrapsBy` convention). */
  def c4Clean(documents: DataFrame): DataFrame = {
    val aug = when(col("doc_id") % 5 === 1, lit(C4Aug(1)))
      .when(col("doc_id") % 5 === 2, lit(C4Aug(2)))
      .when(col("doc_id") % 5 === 3, lit(C4Aug(3)))
      .when(col("doc_id") % 5 === 4, lit(C4Aug(4)))
      .otherwise(lit(""))
    c4CleanOf(documents.withColumn("text",
      concat(col("text"), lit(C4Good), aug)))
  }

  /** [[c4CleanOf]]'s page verdict as ONE row-level boolean Column over
    * a text expression — the [[gopherPassCol]] convention; PINNED
    * equivalent to `c4CleanOf`'s `page_ok` by spec. */
  def c4PageOkCol(t: Column): Column = {
    val kept = filter(split(t, "\n"), l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) && size(split(l, " ")) >= 5)
    !lower(t).contains("lorem ipsum") && !t.contains("{") && size(kept) >= 3
  }

  /** Planted tails for `q_gopher_rep` (shared VERBATIM by both
    * engines, doc_id % 5 selects): a triple-repeated line, a duplicated
    * paragraph, a hammered 2-gram run, and a 6-token passage repeated
    * verbatim — each drives one repetition-rule family; %5==0 stays
    * clean so the pass path is exercised too. */
  private[graft] val GopherRepAug: Seq[String] = Seq(
    "",
    "\nrepeat this line\nrepeat this line\nrepeat this line",
    "\n\nsame paragraph block here\n\nsame paragraph block here",
    " spark fast" * 12,
    " alpha beta gamma delta epsilon zeta filler words" +
      " alpha beta gamma delta epsilon zeta")

  /** The published thresholds (percent) of the Gopher REPETITION rules
    * (Rae et al. 2021, table A1): duplicate line / paragraph fraction
    * ≤ 30%, duplicate line / paragraph CHARACTER fraction ≤ 20%, top
    * {2,3,4}-gram character fraction ≤ {20,18,16}%, duplicate
    * {5..10}-gram character fraction ≤ {15,14,13,12,11,10}%. */
  private[graft] val TopGramPct: Map[Int, Int] =
    graft.plans.GopherRepCore.TopGramPct
  private[graft] val DupGramPct: Map[Int, Int] =
    graft.plans.GopherRepCore.DupGramPct

  /** §2-165 `q_gopher_rep`: the FULL Gopher REPETITION rule set —
    * [[gopher]] evaluates appendix A1.1's quality rules; this is its
    * other half (`q_repetition` scores only the top-trigram share).
    * All thirteen published rules, integer-exact:
    *  - duplicate line / paragraph fraction (all occurrences of any
    *    repeated value count as duplicated) and the CHARACTER twins;
    *  - top {2,3,4}-gram character fraction: the most frequent gram's
    *    occurrences × its token characters over the doc's total token
    *    characters (ties by that product — deterministic both engines);
    *  - duplicate {5..10}-gram character fraction, OVERLAP-AWARE: a
    *    token position covered by ANY occurrence of ANY repeated
    *    n-gram counts once (the paper's "taking care not to count
    *    characters in overlapping n-grams more than once").
    * Character denominators are token-character sums (gram rules) and
    * line/paragraph-character sums (line rules) — self-consistent and
    * shared with the oracle; every threshold is a cross-multiplied
    * integer comparison, no float forms.
    *
    * Scale shape: every rule is WITHIN-document, so the whole gate is
    * ONE zero-shuffle per-doc pass — the native struct expression
    * `gopher_rep_flags` (round 18; [[graft.plans.GopherRepFlags]],
    * [[graft.plans.GopherRepCore]] shared with the fused
    * `gopher_rep_pass` gate, so operator and gate cannot drift). The
    * per-doc hash-map pass beats exploding a 9×-token gram stream
    * through windows (measured 13.3 s → sub-second at sf0.1); staying a
    * codegen'd expression (not an RDD hop) keeps the face inside
    * Tungsten and NULL-SAFE: a null text row emits (n_lines = 0,
    * tok_chars = 0, all-false, rep_pass = false) — the gate's
    * null → false, not an NPE. At 100 TB it fuses into the ingest scan
    * exactly like [[gopher]], the row-level half of the published
    * filter. */
  def gopherRepOf(documents: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(documents.sparkSession)
    documents
      .select(col("doc_id").cast("long").as("doc_id"),
        call_function("gopher_rep_flags", col("text")).as("f"))
      .select(col("doc_id"), col("f.*"))
      .orderBy("doc_id")
  }

  /** [[gopherRepOf]] on the planted-augmented corpus (the `queries()`
    * binding): [[GopherRepAug]] tails applied BEFORE the call — the
    * fixture-outside-operator convention — so every rule family
    * genuinely fires at test scale. */
  def gopherRep(documents: DataFrame): DataFrame = {
    val aug = when(col("doc_id") % 5 === 1, lit(GopherRepAug(1)))
      .when(col("doc_id") % 5 === 2, lit(GopherRepAug(2)))
      .when(col("doc_id") % 5 === 3, lit(GopherRepAug(3)))
      .when(col("doc_id") % 5 === 4, lit(GopherRepAug(4)))
      .otherwise(lit(""))
    gopherRepOf(documents.withColumn("text", concat(col("text"), aug)))
  }

  /** Planted tails for `q_dedup_lines_within` (both engines, doc_id %
    * 4): an interleaved nav-menu repeat, a triple footer, and a
    * no-duplicate control. */
  private[graft] val DedupLinesAug: Seq[String] = Seq(
    "",
    "\nnav menu home\nsome body text here\nnav menu home",
    "\nfooter fine print\nfooter fine print\nfooter fine print",
    "\nunique line one\nunique line two")

  /** §2-169 `q_dedup_lines_within`: WITHIN-document duplicate-line
    * removal — the page-local scrub real cleaners run before any
    * scoring (nav menus, footers, and cookie banners repeat INSIDE a
    * page; row 104's `q_dedup_lines` dedups segments across the
    * corpus, this transform fixes the page itself): keep each line's
    * FIRST occurrence in order, rejoin. Output (doc_id, n_lines,
    * n_kept, kept_text) with the kept TEXT hash-checked byte-identical
    * (the excise-text discipline). Spark side is one order-preserving
    * `array_distinct`; the oracle replays it as a rank-1 window over
    * line positions. Pure row-level map, zero shuffles. */
  def dedupLinesWithinOf(documents: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = array_distinct(lines)
    documents.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("kept_text"))
      .orderBy("doc_id")
  }

  /** [[dedupLinesWithinOf]] on the planted-augmented corpus (the
    * `queries()` binding — the fixture-outside-operator convention). */
  def dedupLinesWithin(documents: DataFrame): DataFrame = {
    val aug = when(col("doc_id") % 4 === 1, lit(DedupLinesAug(1)))
      .when(col("doc_id") % 4 === 2, lit(DedupLinesAug(2)))
      .when(col("doc_id") % 4 === 3, lit(DedupLinesAug(3)))
      .otherwise(lit(""))
    dedupLinesWithinOf(documents.withColumn("text", concat(col("text"), aug)))
  }

  /** The benchmark blocklist for `q_c4_badwords` — corpus-vocabulary
    * words so the gate genuinely bites at every SF (in production this
    * is the C4 paper's public "dirty/naughty" word list). */
  val C4Badwords: Seq[String] = Seq("slow", "merge")

  /** The blocklist verdict as ONE row-level boolean Column (true =
    * page clean) — the [[gopherPassCol]] convention, composable into
    * [[CorpusOps.curateFullOf]]; token-exact matching (a blocklisted
    * WORD, not substring — "class" must not trip on "ass", the
    * documented C4 overreach this avoids). */
  def c4BadwordsOkCol(t: Column, words: Seq[String]): Column = {
    val toks = TextFuns.tokens(t)
    !words.map(w => array_contains(toks, w)).reduce(_ || _)
  }

  /** §2-164 `q_c4_badwords`: the C4 recipe's OTHER published page gate
    * (Raffel et al. 2020 §2.2 — [[c4Clean]] is the line filter, this is
    * the word-blocklist drop: any page containing a listed word is
    * removed wholesale). Parameterized by the CALLER's list (the
    * [[redact]]/[[CorpusOps.contamination]] convention); token-exact
    * over the normalized token stream. Output (doc_id, n_bad = listed
    * token occurrences, page_ok). Pure row-level map, zero shuffles —
    * fuses into the ingest scan beside the other gates. */
  def c4BadwordsOf(documents: DataFrame, words: Seq[String]): DataFrame = {
    val toks = TextFuns.tokens(col("text"))
    val nBad = words.map(w => size(filter(toks, tk => tk === w)))
      .reduce(_ + _)
    documents
      .select(col("doc_id"), nBad.cast("long").as("n_bad"))
      .withColumn("page_ok", col("n_bad") === 0)
      .orderBy("doc_id")
  }

  /** [[c4BadwordsOf]] with the benchmark [[C4Badwords]] list (the
    * `queries()` binding). */
  def c4Badwords(documents: DataFrame): DataFrame =
    c4BadwordsOf(documents, C4Badwords)

  /** Load a ONE-WORD-PER-LINE blocklist artifact — the shape the C4
    * paper's public "dirty/naughty" list ships in, so deploying the
    * published gate is one call instead of ten re-implemented lines
    * (round 18; the `readTokenizer` persisted-artifact precedent).
    * Blank lines and `#` comments drop; words lowercase to match the
    * normalized token stream. The list is KBs at any corpus size, so
    * it collects to the driver ONCE and parameterizes the codegen'd
    * row-level gate — a list, not a join side. */
  def readBadwords(spark: org.apache.spark.sql.SparkSession,
                   path: String): Seq[String] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(w => w.nonEmpty && !w.startsWith("#"))
      .distinct

  /** [[c4BadwordsOf]] straight off a blocklist artifact file. */
  def c4BadwordsOf(documents: DataFrame, path: String): DataFrame =
    c4BadwordsOf(documents, readBadwords(documents.sparkSession, path))

  /** The fixture-free face of [[c4Clean]]: the C4 line filter over the
    * frame's OWN `text` column, no planted material — what a user runs
    * on their corpus. Requires (doc_id, text). */
  def c4CleanOf(documents: DataFrame): DataFrame = {
    val t2 = col("text")
    val lines = split(t2, "\n")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) && size(split(l, " ")) >= 5)
    documents
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        (!lower(t2).contains("lorem ipsum") && !t2.contains("{") &&
          size(kept) >= 3).as("page_ok"),
        kept.as("_kept"))
      .withColumn("kept_text",
        when(col("page_ok"), array_join(col("_kept"), "\n")))
      .drop("_kept")
      .orderBy("doc_id")
  }

  /** §2-77 `q_redact`: PII scrubbing + in-place decontamination — the
    * pattern chain above over the normalized text, emitting per-pattern
    * match counts (counted on the running text, i.e. post-prior-
    * redactions) and the final redacted text. One pass, pure row-level
    * codegen'd regexps, no shuffle — at 100 TB the cost is exactly one
    * read + one write, the canonical scrub-on-ingest shape. The
    * synthetic corpus has no PII (those counts exercise the zero path;
    * planted-fixture spec covers the hit path); the probe phrases DO
    * occur, so redaction is exercised for real under the oracle. */
  /** §2-D `q_compress_ratio`: zlib compressibility as a QUALITY signal —
    * compressed/raw byte ratio per document. The classic cheap detector
    * (Gopher/RefinedWeb lineage): near-zero ratio = templated/repetitive
    * boilerplate, ratio near 1 = high-entropy noise (binary soup,
    * encrypted junk); natural prose sits in a band between. Emitted
    * per-doc so `curate`-style gates can threshold both tails.
    *
    * Deterministic for a fixed zlib level, but NOT SQL-expressible →
    * rows-only driver check + behavioral spec (planted repetitive vs
    * high-entropy text). Scale shape: pure map over partitions; ONE
    * `Deflater` per partition, `reset()` between docs (allocating a
    * native zlib stream per row would dominate the pass), freed on
    * iterator exhaustion. No shuffle at all. */
  def compressRatio(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
        // release the native zlib stream however the task ends — an
        // early-terminating consumer (limit/take) never drains the
        // iterator, so an exhaustion-triggered end() would leak one
        // native stream per partition
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        it.map { case (id, src, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          d.reset()
          d.setInput(raw)
          d.finish()
          // stored-mode worst case: ~5 bytes per 16 KB block + header
          val buf = new Array[Byte](raw.length + (raw.length >> 9) + 64)
          var n = 0
          while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
          val ratio = if (raw.length == 0) 1.0 else n.toDouble / raw.length
          (id, src, raw.length.toLong, n.toLong, ratio)
        }
      }
      .toDF("doc_id", "source", "n_bytes", "n_compressed", "compress_ratio")
      .orderBy("doc_id")
  }

  def redact(documents: DataFrame): DataFrame =
    redact(documents, CorpusOps.Probes)

  /** Parameterized face of the redaction chain: the PII patterns plus
    * the CALLER's eval-probe phrases (the [[CorpusOps.contamination]]
    * convention — the q_ key instantiates with [[CorpusOps.Probes]]).
    * Probes are a driver-side literal list, not a DataFrame, because
    * they compile into the codegen'd regexp alternation — the same
    * reason the probe set must stay KB-scale, which real eval suites
    * are. Oracle-hash-exactness across engines additionally requires
    * the probes be mutually non-prefix with distinct first tokens (the
    * [[RedactPatterns]] contract); the operator itself is correct for
    * any literal phrases under Java semantics. */
  def redact(documents: DataFrame, probes: Seq[String]): DataFrame = {
    val patterns = RedactPatterns.init :+
      (("n_probe", probes.map(regexLiteral).mkString("|"), "[REDACTED]"))
    val start = documents.select(col("doc_id"), TextFuns.norm(col("text")).as("t"))
    val (done, counts) = patterns.foldLeft((start, Seq.empty[String])) {
      case ((df, cols), (cnt, pat, repl)) =>
        (df.withColumn(cnt, regexp_count(col("t"), lit(pat)).cast("int"))
          .withColumn("t", regexp_replace(col("t"), pat, repl)),
          cols :+ cnt)
    }
    done.select(col("doc_id") +: counts.map(col) :+
      col("t").as("text_redacted"): _*)
      .orderBy("doc_id")
  }

  private val normSql = "lower(trim(text))"
  private val toksSql = s"string_split($normSql, ' ')"

  /** Script classes as literal-BMP-range char classes — ONE string per
    * script, shared verbatim by both engines (RE2 and Java both read
    * bracket ranges over literal codepoints identically; every range is
    * BMP so no surrogate games). */
  private[graft] val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z",
    "cyrillic" -> "\u0400-\u04FF",
    "greek" -> "\u0370-\u03FF",
    "arabic" -> "\u0600-\u06FF",
    "hangul" -> "\uAC00-\uD7A3",
    "cjk" -> "\u4E00-\u9FFF")

  /** Deterministic per-doc script injections (script, token, modulus):
    * the corpus is ASCII, so both engines append `doc_id % modulus`
    * copies of a native-script token — the script profile then VARIES by
    * document and the counting/routing logic is actually exercised. */
  private val ScriptInjections: Seq[(String, String, Int)] = Seq(
    ("cyrillic", " привет", 7),
    ("greek", " δεδομένα", 6),
    ("arabic", " بيانات", 3),
    ("hangul", " 데이터", 4),
    ("cjk", " 数据", 5))

  /** §2 `q_script_mix`: Unicode-SCRIPT profiling — the routing signal a
    * multilingual pipeline needs before language ID is even meaningful
    * (marker-word lang-id assumes Latin tokens; a Cyrillic or CJK page
    * must route to its own pipeline): per-document character counts for
    * six script classes, the dominant NON-Latin script (first-in-order
    * tie-break, `none` when the page is pure Latin), and an integer
    * non-Latin permille. Pure row-level regexp counting — zero shuffles,
    * one scan, fuses into WholeStageCodegen. */
  def scriptMix(documents: DataFrame): DataFrame = {
    val aug = concat((col("text") +: ScriptInjections.map { case (_, tok, m) =>
      expr(s"repeat('$tok', CAST(doc_id % $m AS INT))")
    }): _*)
    val counted = documents.select((col("doc_id") +:
      Scripts.map { case (name, cls) =>
        length(regexp_replace(aug, s"[^$cls]", "")).cast("long").as(s"n_$name")
      }): _*)
    val nonLatinNames = Scripts.map(_._1).filterNot(_ == "latin")
    val nonLatin = nonLatinNames.map(n => col(s"n_$n")).reduce(_ + _)
    val total = nonLatin + col("n_latin")
    val dominant = nonLatinNames.foldRight(lit("none"): org.apache.spark.sql.Column) {
      case (name, rest) =>
        val others = nonLatinNames.filterNot(_ == name).map(n => col(s"n_$n"))
        when(col(s"n_$name") > 0 &&
          col(s"n_$name") >= greatest(others: _*), name)
          .otherwise(rest)
    }
    counted
      .withColumn("dominant_nonlatin", dominant)
      .withColumn("nonlatin_permille",
        when(total === 0, 0L).otherwise(expr(
          s"(1000 * (${nonLatinNames.map(n => s"n_$n").mkString(" + ")})) div " +
            s"(${Scripts.map { case (n, _) => s"n_$n" }.mkString(" + ")})")))
      .orderBy("doc_id")
  }

  /** §2 `q_normalize`: Unicode NFC normalization on ingest — the fix for
    * mixed-normalization crawl text (the same word as precomposed `é` or
    * decomposed `e`+U+0301 breaks every byte-keyed operator downstream:
    * exact dedup, token counting, contamination screens). The native
    * codegen'd `utf8_nfc` expression ([[graft.plans.UnicodeCodec]] —
    * `java.text.Normalizer`, the UAX #15 algorithm DuckDB's
    * `nfc_normalize` also implements, so the output text is hash-checked
    * cross-engine). The ASCII corpus is augmented with deterministic
    * DECOMPOSED sequences per doc (both engines build the same bytes) so
    * composition actually fires. Pure map — zero shuffles, one scan. */
  def normalize(documents: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(documents.sparkSession)
    // the third injection is a LENGTH-PRESERVING NFC singleton (U+212B
    // ANGSTROM SIGN \u2192 U+00C5): docs carrying only it are rewritten
    // without changing length, so `changed` must compare TEXT, not size
    val aug = concat(col("text"),
      expr("repeat(' cafe\u0301', CAST(doc_id % 3 AS INT))"),
      expr("repeat(' u\u0308ber', CAST(doc_id % 2 AS INT))"),
      expr("repeat(' \u212b', CAST(doc_id % 5 AS INT))"))
    documents.select(col("doc_id"), aug.as("_aug"),
      call_function("utf8_nfc", aug).as("text_nfc"),
      length(aug).cast("long").as("n_chars_raw"))
      .withColumn("n_chars_nfc", length(col("text_nfc")).cast("long"))
      .withColumn("changed", col("text_nfc") =!= col("_aug"))
      .drop("_aug")
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q_normalize" ->
      """WITH a AS (
        |  SELECT doc_id,
        |    text || repeat(' cafe' || chr(769), CAST(doc_id % 3 AS INT))
        |         || repeat(' u' || chr(776) || 'ber', CAST(doc_id % 2 AS INT))
        |         || repeat(' ' || chr(8491), CAST(doc_id % 5 AS INT))
        |      AS aug
        |  FROM documents
        |)
        |SELECT doc_id,
        |  nfc_normalize(aug) AS text_nfc,
        |  CAST(length(aug) AS BIGINT) AS n_chars_raw,
        |  CAST(length(nfc_normalize(aug)) AS BIGINT) AS n_chars_nfc,
        |  (nfc_normalize(aug) <> aug) AS changed
        |FROM a
        |ORDER BY doc_id""".stripMargin,
    "q_script_mix" -> {
      val augSql = "text || " + ScriptInjections.map { case (_, tok, m) =>
        s"repeat(${TextFuns.sqlLit(tok)}, CAST(doc_id % $m AS INT))"
      }.mkString(" || ")
      val countSql = Scripts.map { case (name, cls) =>
        s"CAST(length(regexp_replace(aug, ${TextFuns.sqlLit(s"[^$cls]")}, '', 'g')) AS BIGINT) AS n_$name"
      }.mkString(",\n  ")
      val nonLatinNames = Scripts.map(_._1).filterNot(_ == "latin")
      val nonLatinSum = nonLatinNames.map(n => s"n_$n").mkString(" + ")
      val totalSum = Scripts.map { case (n, _) => s"n_$n" }.mkString(" + ")
      val dominantSql = nonLatinNames.map { name =>
        val others = nonLatinNames.filterNot(_ == name)
          .map(n => s"n_$n").mkString(", ")
        s"WHEN n_$name > 0 AND n_$name >= greatest($others) THEN '$name'"
      }.mkString("\n    ")
      s"""WITH a AS (
         |  SELECT doc_id, $augSql AS aug FROM documents
         |), c AS (
         |  SELECT doc_id,
         |  $countSql
         |  FROM a
         |)
         |SELECT doc_id, ${Scripts.map { case (n, _) => s"n_$n" }.mkString(", ")},
         |  CASE
         |    $dominantSql
         |    ELSE 'none'
         |  END AS dominant_nonlatin,
         |  CASE WHEN ($totalSum) = 0 THEN 0
         |       ELSE (1000 * ($nonLatinSum)) // ($totalSum)
         |  END AS nonlatin_permille
         |FROM c
         |ORDER BY doc_id""".stripMargin
    },
    "q_hash_embed" ->
      s"""WITH t AS (
        |  SELECT doc_id, unnest($toksSql) AS term
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, md5(term) AS hh FROM t
        |), s AS (
        |  -- first md5 hex byte mod 64 = Spark's conv(substr(h,1,2),16,10)%64
        |  SELECT doc_id,
        |    CAST(((strpos('0123456789abcdef', substr(hh, 1, 1)) - 1) * 16
        |          + (strpos('0123456789abcdef', substr(hh, 2, 1)) - 1)) % 64
        |      AS INTEGER) AS slot,
        |    CASE WHEN substr(hh, 3, 1) < '8' THEN 1 ELSE -1 END AS sgn
        |  FROM h
        |)
        |SELECT doc_id, slot, CAST(SUM(sgn) AS BIGINT) AS v
        |FROM s GROUP BY doc_id, slot
        |ORDER BY doc_id, slot""".stripMargin,
    "q_lang_id" -> {
      val scores = Markers.map { case (l, ws) =>
        val in = ws.map(TextFuns.sqlLit).mkString(", ")
        s"len(list_filter($toksSql, t -> t IN ($in))) AS s_$l"
      }.mkString(",\n  ")
      val langs = Markers.map(_._1)
      val cases = langs.init.zipWithIndex.map { case (l, i) =>
        val conds = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      s"""WITH s AS (
         |  SELECT doc_id, $scores FROM documents
         |)
         |SELECT *, CASE $cases ELSE '${langs.last}' END AS pred_lang
         |FROM s
         |ORDER BY doc_id""".stripMargin
    },
    "q_dedup_lines_within" -> {
      s"""WITH d AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 4 = 1 THEN ${TextFuns.sqlLit(DedupLinesAug(1))}
         |         WHEN doc_id % 4 = 2 THEN ${TextFuns.sqlLit(DedupLinesAug(2))}
         |         WHEN doc_id % 4 = 3 THEN ${TextFuns.sqlLit(DedupLinesAug(3))}
         |         ELSE '' END AS text
         |  FROM documents
         |), t AS (
         |  SELECT doc_id, string_split(text, chr(10)) AS ls FROM d
         |), x AS (
         |  SELECT doc_id, p, ls[p] AS line, len(ls) AS nl
         |  FROM (SELECT doc_id, ls,
         |          unnest(generate_series(1, len(ls))) AS p FROM t)
         |), k AS (
         |  SELECT doc_id, p, line, nl,
         |    row_number() OVER (PARTITION BY doc_id, line ORDER BY p) AS rn
         |  FROM x
         |)
         |SELECT doc_id, CAST(MAX(nl) AS BIGINT) AS n_lines,
         |  CAST(count(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
         |  array_to_string(list(line ORDER BY p) FILTER (rn = 1), chr(10))
         |    AS kept_text
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q_gopher_rep" -> {
      s"""WITH d AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 1 THEN ${TextFuns.sqlLit(GopherRepAug(1))}
         |         WHEN doc_id % 5 = 2 THEN ${TextFuns.sqlLit(GopherRepAug(2))}
         |         WHEN doc_id % 5 = 3 THEN ${TextFuns.sqlLit(GopherRepAug(3))}
         |         WHEN doc_id % 5 = 4 THEN ${TextFuns.sqlLit(GopherRepAug(4))}
         |         ELSE '' END AS text
         |  FROM documents
         |), b AS (
         |  SELECT doc_id,
         |    string_split(text, chr(10)) AS lines,
         |    string_split(text, chr(10) || chr(10)) AS paras,
         |    string_split(lower(trim(text)), ' ') AS toks
         |  FROM d
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(lines) AS BIGINT) AS n_lines,
         |    CAST(len(paras) AS BIGINT) AS n_paras,
         |    CAST(list_sum(list_transform(lines, x -> length(x))) AS BIGINT)
         |      AS line_chars,
         |    CAST(list_sum(list_transform(paras, x -> length(x))) AS BIGINT)
         |      AS para_chars,
         |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
         |      AS tok_chars
         |  FROM b
         |), ldup AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_lines,
         |    CAST(sum(length(v)) AS BIGINT) AS dup_line_chars
         |  FROM (SELECT doc_id, v,
         |          count(*) OVER (PARTITION BY doc_id, v) AS c
         |        FROM (SELECT doc_id, unnest(lines) AS v FROM b))
         |  WHERE c >= 2 GROUP BY doc_id
         |), pdup AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_paras,
         |    CAST(sum(length(v)) AS BIGINT) AS dup_para_chars
         |  FROM (SELECT doc_id, v,
         |          count(*) OVER (PARTITION BY doc_id, v) AS c
         |        FROM (SELECT doc_id, unnest(paras) AS v FROM b))
         |  WHERE c >= 2 GROUP BY doc_id
         |), gn AS (
         |  SELECT doc_id, toks, unnest(generate_series(2, 10)) AS n FROM b
         |), gi AS (
         |  SELECT doc_id, toks, n,
         |    unnest(generate_series(1, len(toks) - n + 1)) AS i
         |  FROM gn WHERE len(toks) >= n
         |), g AS (
         |  SELECT doc_id, n, i,
         |    array_to_string(toks[i : i + n - 1], ' ') AS gm,
         |    CAST(list_sum(list_transform(toks[i : i + n - 1],
         |      x -> length(x))) AS BIGINT) AS gc
         |  FROM gi
         |), gcnt AS (
         |  SELECT *, count(*) OVER (PARTITION BY doc_id, n, gm) AS cnt FROM g
         |), mx AS (
         |  SELECT doc_id, n, max(cnt) AS mc FROM gcnt GROUP BY 1, 2
         |), top AS (
         |  SELECT g.doc_id, g.n, CAST(max(g.cnt * g.gc) AS BIGINT) AS prod
         |  FROM gcnt g JOIN mx
         |    ON g.doc_id = mx.doc_id AND g.n = mx.n AND g.cnt = mx.mc
         |  WHERE g.n <= 4 GROUP BY 1, 2
         |), cpos AS (
         |  SELECT DISTINCT doc_id, n, p FROM (
         |    SELECT doc_id, n, unnest(generate_series(i, i + n - 1)) AS p
         |    FROM gcnt WHERE n >= 5 AND cnt >= 2)
         |), tp AS (
         |  SELECT doc_id, p, length(toks[p]) AS tl FROM (
         |    SELECT doc_id, toks,
         |      unnest(generate_series(1, len(toks))) AS p FROM b)
         |), cov AS (
         |  SELECT cpos.doc_id, cpos.n, CAST(sum(tp.tl) AS BIGINT) AS cv
         |  FROM cpos JOIN tp ON cpos.doc_id = tp.doc_id AND cpos.p = tp.p
         |  GROUP BY 1, 2
         |)
         |SELECT m.doc_id, m.n_lines, m.tok_chars,
         |  coalesce(ldup.dup_lines, 0) * 10 <= m.n_lines * 3 AS dup_line_ok,
         |  coalesce(pdup.dup_paras, 0) * 10 <= m.n_paras * 3 AS dup_para_ok,
         |  coalesce(ldup.dup_line_chars, 0) * 10 <= m.line_chars * 2
         |    AS dup_line_char_ok,
         |  coalesce(pdup.dup_para_chars, 0) * 10 <= m.para_chars * 2
         |    AS dup_para_char_ok,
         |  coalesce(t2.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(2)} AS top2_ok,
         |  coalesce(t3.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(3)} AS top3_ok,
         |  coalesce(t4.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(4)} AS top4_ok,
         |  coalesce(c5.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(5)} AS dup5_ok,
         |  coalesce(c6.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(6)} AS dup6_ok,
         |  coalesce(c7.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(7)} AS dup7_ok,
         |  coalesce(c8.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(8)} AS dup8_ok,
         |  coalesce(c9.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(9)} AS dup9_ok,
         |  coalesce(c10.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(10)} AS dup10_ok,
         |  (coalesce(ldup.dup_lines, 0) * 10 <= m.n_lines * 3
         |    AND coalesce(pdup.dup_paras, 0) * 10 <= m.n_paras * 3
         |    AND coalesce(ldup.dup_line_chars, 0) * 10 <= m.line_chars * 2
         |    AND coalesce(pdup.dup_para_chars, 0) * 10 <= m.para_chars * 2
         |    AND coalesce(t2.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(2)}
         |    AND coalesce(t3.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(3)}
         |    AND coalesce(t4.prod, 0) * 100 <= m.tok_chars * ${TopGramPct(4)}
         |    AND coalesce(c5.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(5)}
         |    AND coalesce(c6.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(6)}
         |    AND coalesce(c7.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(7)}
         |    AND coalesce(c8.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(8)}
         |    AND coalesce(c9.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(9)}
         |    AND coalesce(c10.cv, 0) * 100 <= m.tok_chars * ${DupGramPct(10)})
         |    AS rep_pass
         |FROM m
         |LEFT JOIN ldup USING (doc_id)
         |LEFT JOIN pdup USING (doc_id)
         |LEFT JOIN top t2 ON t2.doc_id = m.doc_id AND t2.n = 2
         |LEFT JOIN top t3 ON t3.doc_id = m.doc_id AND t3.n = 3
         |LEFT JOIN top t4 ON t4.doc_id = m.doc_id AND t4.n = 4
         |LEFT JOIN cov c5 ON c5.doc_id = m.doc_id AND c5.n = 5
         |LEFT JOIN cov c6 ON c6.doc_id = m.doc_id AND c6.n = 6
         |LEFT JOIN cov c7 ON c7.doc_id = m.doc_id AND c7.n = 7
         |LEFT JOIN cov c8 ON c8.doc_id = m.doc_id AND c8.n = 8
         |LEFT JOIN cov c9 ON c9.doc_id = m.doc_id AND c9.n = 9
         |LEFT JOIN cov c10 ON c10.doc_id = m.doc_id AND c10.n = 10
         |ORDER BY m.doc_id""".stripMargin
    },
    "q_c4_badwords" -> {
      val in = C4Badwords.map(TextFuns.sqlLit).mkString(", ")
      s"""WITH s AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter($toksSql, t -> t IN ($in))) AS BIGINT)
         |      AS n_bad
         |  FROM documents
         |)
         |SELECT doc_id, n_bad, n_bad = 0 AS page_ok
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q_c4_clean" -> {
      val keepCond = "(l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' " +
        "OR l LIKE '%\"') AND len(string_split(l, ' ')) >= 5"
      val pageOk = "NOT contains(lower(t2), 'lorem ipsum') " +
        "AND NOT contains(t2, '{') AND len(kept) >= 3"
      s"""WITH t AS (
         |  SELECT doc_id, text || ${TextFuns.sqlLit(C4Good)} ||
         |    CASE WHEN doc_id % 5 = 1 THEN ${TextFuns.sqlLit(C4Aug(1))}
         |         WHEN doc_id % 5 = 2 THEN ${TextFuns.sqlLit(C4Aug(2))}
         |         WHEN doc_id % 5 = 3 THEN ${TextFuns.sqlLit(C4Aug(3))}
         |         WHEN doc_id % 5 = 4 THEN ${TextFuns.sqlLit(C4Aug(4))}
         |         ELSE '' END AS t2
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, t2, string_split(t2, chr(10)) AS ls,
         |    list_filter(string_split(t2, chr(10)), l -> $keepCond) AS kept
         |  FROM t
         |)
         |SELECT doc_id,
         |  CAST(len(ls) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  ($pageOk) AS page_ok,
         |  CASE WHEN $pageOk
         |       THEN array_to_string(kept, chr(10)) END AS kept_text
         |FROM s ORDER BY doc_id""".stripMargin
    },
    "q_gopher" -> {
      val stops = GopherStops.map(s =>
        s"(CASE WHEN list_contains(ts, ${TextFuns.sqlLit(s)}) " +
          "THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH t AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 4 = 1 THEN ${TextFuns.sqlLit(GopherAug(1))}
         |         WHEN doc_id % 4 = 2 THEN ${TextFuns.sqlLit(GopherAug(2))}
         |         WHEN doc_id % 4 = 3 THEN ${TextFuns.sqlLit(GopherAug(3))}
         |         ELSE '' END AS t2
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, t2, lower(trim(t2)) AS nrm,
         |    string_split(lower(trim(t2)), ' ') AS ts,
         |    string_split(t2, chr(10)) AS ls
         |  FROM t
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(ts) AS BIGINT) AS n_words,
         |    CAST(len(ls) AS BIGINT) AS n_lines,
         |    CAST(length(nrm) - (len(ts) - 1) AS BIGINT) AS total_len,
         |    CAST(length(t2) - length(replace(t2, '#', '')) AS BIGINT)
         |      AS hash_cnt,
         |    CAST(length(t2) - length(replace(t2, '...', '')) AS BIGINT)
         |      AS ell3,
         |    CAST(len(list_filter(ls,
         |      l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS bullets,
         |    CAST(len(list_filter(ls, l -> l LIKE '%...')) AS BIGINT)
         |      AS ellend,
         |    CAST(len(list_filter(ts,
         |      tk -> regexp_matches(tk, '[a-z]'))) AS BIGINT) AS alpha,
         |    ($stops) AS stop_cnt
         |  FROM s
         |)
         |SELECT doc_id, n_words, n_lines,
         |  (n_words >= 50 AND n_words <= 100000) AS wc_ok,
         |  (total_len >= n_words * 3 AND total_len <= n_words * 10)
         |    AS mean_len_ok,
         |  (hash_cnt * 10 <= n_words) AS hash_ok,
         |  (ell3 * 10 <= n_words * 3) AS ellipsis_ok,
         |  (bullets * 10 <= n_lines * 9) AS bullets_ok,
         |  (ellend * 10 <= n_lines * 3) AS ell_lines_ok,
         |  (alpha * 5 >= n_words * 4) AS alpha_ok,
         |  (stop_cnt >= 2) AS stop_ok,
         |  (n_words >= 50 AND n_words <= 100000
         |    AND total_len >= n_words * 3 AND total_len <= n_words * 10
         |    AND hash_cnt * 10 <= n_words AND ell3 * 10 <= n_words * 3
         |    AND bullets * 10 <= n_lines * 9
         |    AND ellend * 10 <= n_lines * 3
         |    AND alpha * 5 >= n_words * 4 AND stop_cnt >= 2)
         |    AS gopher_pass
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "q_quality" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    length($normSql) AS n_chars_norm,
         |    len($toksSql) AS n_tokens,
         |    (length($normSql) - (len($toksSql) - 1)) * 1.0 / len($toksSql) AS avg_token_len,
         |    len(list_filter($toksSql, t -> t IN (${Stopwords.map(TextFuns.sqlLit).mkString(", ")}))) * 1.0
         |      / len($toksSql) AS stopword_ratio
         |  FROM documents
         |)
         |SELECT *,
         |  least(CAST(1 AS DOUBLE), n_tokens / 100.0) * 0.6
         |    + stopword_ratio * 0.2
         |    + (CASE WHEN avg_token_len >= 3.0 AND avg_token_len <= 8.0
         |            THEN 0.2 ELSE 0.0 END) AS quality_score
         |FROM s
         |ORDER BY doc_id""".stripMargin,
    "q_seqlen_hist" ->
      s"""WITH counted AS (
         |  SELECT source,
         |    CAST(len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tok
         |  FROM documents
         |), binned AS (
         |  SELECT source, (n_tok // 32) * 32 AS bin,
         |    COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         |  FROM counted GROUP BY source, (n_tok // 32) * 32
         |)
         |SELECT source, bin, n_docs, n_tokens,
         |  n_docs * 1.0 / SUM(n_docs) OVER (PARTITION BY source) AS doc_share
         |FROM binned
         |ORDER BY source, bin""".stripMargin,
    "q_tokens" ->
      s"""WITH s AS (
         |  SELECT doc_id,
         |    len($toksSql) AS n_ws_tokens,
         |    len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
         |    length($normSql) AS n_chars_norm
         |  FROM documents
         |)
         |SELECT *, n_chars_norm * 1.0 / n_bpe_tokens AS chars_per_token
         |FROM s
         |ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      s"""WITH n AS (
         |  SELECT doc_id, $normSql AS t FROM documents WHERE length($normSql) >= 16
         |), sh AS (
         |  SELECT doc_id, md5(substr(t, i + 1, 16)) AS h
         |  FROM (SELECT doc_id, t, unnest(generate_series(0, length(t) - 16)) AS i FROM n)
         |)
         |SELECT doc_id, MIN(h) AS fingerprint, COUNT(*) AS n_shingles
         |FROM sh
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,
    "q_redact" -> {
      // one CTE per pattern: count on the incoming text, then rewrite it
      // (star-REPLACE keeps prior counts flowing through the chain)
      val steps = RedactPatterns.zipWithIndex.map {
        case ((cnt, pat, repl), i) =>
          s"""s${i + 1} AS (
             |  SELECT * REPLACE (regexp_replace(t, ${TextFuns.sqlLit(pat)},
             |      ${TextFuns.sqlLit(repl)}, 'g') AS t),
             |    CAST(len(regexp_extract_all(t, ${TextFuns.sqlLit(pat)}))
             |      AS INTEGER) AS $cnt
             |  FROM s$i)""".stripMargin
      }.mkString(",\n")
      val cntCols = RedactPatterns.map(_._1).mkString(", ")
      s"""WITH s0 AS (
         |  SELECT doc_id, $normSql AS t FROM documents
         |),
         |$steps
         |SELECT doc_id, $cntCols, t AS text_redacted
         |FROM s${RedactPatterns.length}
         |ORDER BY doc_id""".stripMargin
    }
  )
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting.
  *
  * Everything here is pure narrow (per-row) Column arithmetic — no shuffle,
  * no UDFs, whole-stage-codegen friendly — so it scales linearly with input
  * splits at 100 TB. Hashing is md5-based (first 15 hex digits → 60-bit
  * int) so oracles in any SQL engine can reproduce it exactly.
  *
  * Perf note: the word array is always materialized (`withColumn`) before
  * any lambda references it — an expression tree referenced inside a
  * higher-order-function lambda is re-evaluated per element, so e.g.
  * `split()` inside a shingle transform would go quadratic in words/doc.
  */
object TextAnalysis {

  /** Small inputs arrive as one parquet split, but the per-doc HOF work
    * (hashing, shingling, regex) is CPU-bound — spread it across cores.
    * (At 100 TB inputs come pre-split; repartition of a small corpus is a
    * trivial shuffle next to the compute it parallelizes.)
    */
  private[pipeline] def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // partition count via the internal RDD (no df.rdd deserialization
    // lineage; physical planning is cached on queryExecution and happens
    // anyway). Catches both the single-split small corpus AND a large
    // non-splittable input (e.g. gzip) arriving as few partitions —
    // already-well-split 100 TB inputs pass through untouched
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Portable 60-bit hash: int(md5(s)[0:15], 16) — the fused codegen
    * kernel (graft.functions.Hash60); bit-identical to the composed
    * `conv(substring(md5(..)))` form the oracles replay (FunctionsSpec).
    */
  def hash60(c: Column): Column = graft.functions.Hash60(c)

  /** The pre-r6 composed form, kept as the equivalence-test reference. */
  private[graft] def hash60Hof(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** 31-bit variant for modular arithmetic that must not overflow in
    * engines with checked BIGINT multiplication.
    */
  def hash31(c: Column): Column = hash60(c) % 2147483647L

  /** Whitespace word list, lowercased. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles (distinct) from a *materialized* words column. */
  def shinglesOf(w: Column, n: Int = 3): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Shingle-hash combination constants (public-knowledge primes; any SQL
    * engine reproduces the arithmetic — all products stay < 2^62).
    */
  val ShingleA = 1000003L
  val ShingleB = 999983L
  val ShingleP = 2147483647L

  /** Sorted distinct 31-bit shingle-hash set from a *word-hash* column
    * (ARRAY<LONG> of per-word [[hash31]] values): the shingle hash is an
    * arithmetic combination of the n word hashes, so md5 runs once per
    * word, not once per shingle — ~n× fewer digests on the hot path.
    */
  def shingleHashesFromWordHashes(wh: Column, n: Int = 3): Column = {
    require(n == 3, "arithmetic shingle combination is defined for n=3")
    when(size(wh) >= n,
      array_sort(array_distinct(transform(sequence(lit(0), size(wh) - n), i =>
        (element_at(wh, i + 1) * ShingleA % ShingleP * ShingleA % ShingleP
          + element_at(wh, i + 2) * ShingleB % ShingleP
          + element_at(wh, i + 3)) % ShingleP))))
      // NULL word-hash list (null text) → NULL set, matching the oracles'
      // comprehension-over-NULL semantics (len(hs) IS NULL, not 0)
      .otherwise(when(wh.isNotNull, array().cast("array<long>")))
  }

  /** (doc_id, hs ARRAY<LONG>) shingle-hash sets, word hashes bound first. */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    spread(docs).withColumn("__w", words(col("text")))
      .withColumn("__wh", transform(col("__w"), x => hash31(x)))
      .select(col("doc_id"), shingleHashesFromWordHashes(col("__wh"), n).as("hs"))

  /** BPE-ish token pattern: letter runs, digit runs, single other glyphs. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** doc_id, n_chars, n_words, n_tokens, avg_word_len.
    *
    * All three counts come from the fused [[graft.functions.TokenCounts]]
    * byte-walk kernel — one pass instead of `regexp_count(TokenPattern)`,
    * the allocation-heavy `length(regexp_replace(\s+, ""))`, and the
    * word-array split used only for its size, with pinned-identical
    * counts (FunctionsSpec; the gate's 3-SF oracle hashes).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    spread(docs)
      .withColumn("__tc", graft.functions.TokenCounts(col("text"))).select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      col("__tc").getField("n_words").as("n_words"),
      col("__tc").getField("n_tokens").as("n_tokens"),
      (floor((col("__tc").getField("n_nonws").cast("double") / col("__tc").getField("n_words")) * 1e4 + 0.5) / 1e4).as("avg_word_len"))

  /** Per-document unigram Shannon entropy (nats) — the repetitiveness/
    * degeneracy signal quality filters threshold on (low entropy = boiler
    * plate, keyboard mash, or a single token repeated; the CCNet/Gopher
    * rule family): H = ln(n) − (Σ c·ln c)/n over whitespace-token counts
    * c, algebraically identical to −Σ p·ln p but folding ln of INTEGER
    * counts only — the same engine-portable float discipline as the
    * moments in [[graft.operators.SeriesWindows.movingZScore]].
    *
    * Scale shape: explode → count per (doc, token) → fold per doc; both
    * aggregates are partial+final hash aggs keyed on the doc family, no
    * window, no token list ever materializes per doc. Docs with zero
    * tokens vanish with the explode (nothing to measure), matching the
    * oracle's unnest.
    */
  def tokenEntropy(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), explode(words(col("text"))).as("__word"))
      .groupBy("doc_id", "__word").agg(count(lit(1)).as("__c"))
      .groupBy("doc_id").agg(
        sum(col("__c")).as("n_words"),
        (floor((log(sum(col("__c")).cast("double")) -
          sum(col("__c").cast("double") * log(col("__c").cast("double"))) /
            sum(col("__c")).cast("double")) * 1e4 + 0.5) / 1e4).as("entropy"))

  // Tiny fixed stopword lexicons (public-knowledge function words).
  val Lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "it", "for", "on", "with", "a"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "den"),
    "es" -> Seq("el", "los", "y", "en", "que", "un", "para", "es", "una", "las"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est", "pour", "que", "dans"))

  private def lexScore(w: Column, lex: Seq[String]): Column =
    floor((size(filter(w, x => x.isin(lex.map(lit): _*))).cast("double") / size(w)) * 1e4 + 0.5) / 1e4

  /** n-gram/stopword heuristic language ID. Ties resolve in Lexicons order;
    * all-zero scores → 'und'.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = spread(docs).withColumn("__w", words(col("text"))).select(
      (col("doc_id") +: Lexicons.map { case (l, lex) => lexScore(col("__w"), lex).as(s"score_$l") }): _*)
    // first lang (in Lexicons order) with a positive score >= all others
    val best = Lexicons.map(_._1).foldRight(lit("und"): Column) { (l, acc) =>
      val dominates = Lexicons.map(_._1).filter(_ != l)
        .map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
      when(col(s"score_$l") > 0 && dominates, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", best)
  }

  /** Quality score in [0,1]: length, stopword ratio, punctuation ratio,
    * word-length sanity. Deterministic arithmetic, mirrored in oracles.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = col("__w")
    val nWords = size(w).cast("double")
    val stopRatio = size(filter(w, x => x.isin(Lexicons.flatMap(_._2).distinct.map(lit): _*))).cast("double") / nWords
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double")
    val punctRatio = punct / length(col("text")).cast("double")
    val awl = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nWords
    spread(docs).withColumn("__w", words(col("text"))).select(
      col("doc_id"),
      (floor((least(nWords / 100.0, lit(1.0)) * 0.3
        + least(stopRatio * 5.0, lit(1.0)) * 0.3
        + (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2
        + least(awl / 8.0, lit(1.0)) * 0.2) * 1e4 + 0.5) / 1e4).as("quality"))
  }

  /** Scrubbing for training corpora: redact URLs, emails, and IPv4
    * addresses; optionally normalize digit runs to a `<num>` token.
    * Patterns are RE2-compatible (no backreferences/lookaround) so any
    * SQL engine's regex reproduces them; IPv4 runs before the number mask
    * so octets aren't half-eaten. Pure narrow `regexp_replace` chain.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val NumberPattern = "\\b[0-9]+\\b"

  def scrub(docs: DataFrame, maskNumbers: Boolean = false): DataFrame = {
    var t = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), UrlPattern, "<url>"),
        EmailPattern, "<email>"),
      Ipv4Pattern, "<ip>")
    if (maskNumbers) t = regexp_replace(t, NumberPattern, "<num>")
    docs.select(col("doc_id"), t.as("text"))
  }

  /** Boilerplate removal: drop repeated lines within a document, keeping
    * the first occurrence in order (`array_distinct` preserves
    * first-occurrence order). Narrow per-row array work.
    */
  def dedupLines(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(array_distinct(split(col("text"), "\n")), "\n").as("text"))

  /** Gopher-style repetition filters (Rae et al. 2021, public): per-doc
    * fractions of repeated lines / word n-grams that flag low-quality,
    * templated, or machine-generated text.
    *
    *  - `dup_line_frac`: fraction of non-empty (trimmed) lines that are
    *    repeats of an earlier line;
    *  - `top_bigram_frac`: fraction of all word 2-grams taken by the most
    *    frequent one;
    *  - `dup_trigram_frac`: fraction of word 3-gram occurrences that are
    *    duplicates.
    *
    * Narrow per-row array arithmetic (no shuffle). The mode count is
    * O(distinct·n) per doc via HOFs — documents are bounded (segment-split
    * upstream), so this stays per-row CPU, not a shuffle. Arrays are
    * materialized before any lambda references them.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val round4 = (c: Column) => floor(c * 1e4 + 0.5) / 1e4
    val frac = (num: Column, den: Column) =>
      when(den === 0, lit(0.0)).otherwise(round4(num.cast("double") / den.cast("double")))
    val lines = col("__lines")
    val bg = col("__bg")
    val tg = col("__tg")
    spread(docs)
      .withColumn("__w", words(col("text")))
      .withColumn("__lines",
        filter(transform(split(col("text"), "\n"), l => trim(l)), l => length(l) > 0))
      .withColumn("__bg", ngramsOf(col("__w"), 2))
      .withColumn("__tg", ngramsOf(col("__w"), 3))
      .select(
        col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        frac(size(lines) - size(array_distinct(lines)), size(lines)).as("dup_line_frac"),
        when(size(bg) === 0, lit(0.0)).otherwise(round4(
          array_max(transform(array_distinct(bg), x =>
            size(filter(bg, y => y === x)))).cast("double") / size(bg).cast("double")))
          .as("top_bigram_frac"),
        frac(size(tg) - size(array_distinct(tg)), size(tg)).as("dup_trigram_frac"))
  }

  /** Word n-grams (NON-distinct, order-preserving) from a materialized
    * words column — repetition counting needs multiplicity, unlike
    * [[shinglesOf]].
    */
  def ngramsOf(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      // NULL input (null text) propagates as NULL, matching SQL-engine
      // comprehension semantics; only a real-but-short word list is empty
      .otherwise(when(w.isNotNull, array().cast("array<string>")))

  /** Per-column corpus profile in one aggregation pass: total rows, null
    * count, and exact distinct count per listed column, unpivoted to one
    * row per column. Exact distincts are the oracle-parity path; swap in
    * `approx_count_distinct` (HLL, mergeable) when profiling 100 TB where
    * a ±2% estimate is fine.
    */
  def profile(df: DataFrame, columns: Seq[String], approx: Boolean = false): DataFrame = {
    // exact distincts expand to one shuffle per column; the approx path
    // (HLL sketches, mergeable, ±~2%) keeps 100 TB profiling to a single
    // partial+final aggregate pass
    val distinctOf: String => Column =
      if (approx) c => approx_count_distinct(col(c)) else c => countDistinct(col(c))
    val aggs = count(lit(1)).as("__total") +: columns.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      distinctOf(c).as(s"__d_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(columns.map(c => struct(
        lit(c).as("column"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__n_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  /** Split each document into consecutive `wordsPerChunk`-word chunks
    * (the RAG/training text splitter): one output row per chunk, text
    * re-joined with single spaces (whitespace-normalizing, so the chunk
    * text is a pure function of the word sequence). Narrow explode — each
    * doc's chunks materialize on the partition that scanned it.
    */
  def chunkText(docs: DataFrame, wordsPerChunk: Int): DataFrame = {
    val w = col("__w")
    spread(docs).withColumn("__w", words(col("text")))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ceil(size(w) / lit(wordsPerChunk.toDouble)).cast("int") - 1),
          i => concat_ws(" ", slice(w, i * wordsPerChunk + 1, lit(wordsPerChunk))))))
      .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk_text"))
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  /** Document fingerprint: k smallest distinct 31-bit shingle hashes,
    * dash-joined (a winnowing-style k-min sketch). Identical docs → equal
    * fingerprints; near-dups share most components.
    */
  def fingerprint(docs: DataFrame, k: Int = 5, n: Int = 3): DataFrame =
    shingleSets(docs, n).select(
      col("doc_id"),
      concat_ws("-", slice(col("hs"), 1, k)).as("fp"))

  /** Corpus vocabulary by document frequency: top-n words with the count of
    * documents containing each (the vocab-building / stopword-discovery
    * pass). Per-doc distinct before the explode keeps the exploded volume
    * at Σ|vocab(doc)|; the (partial+final) count + TakeOrderedAndProject
    * top-n mean only word-level aggregates shuffle.
    */
  def vocabTopK(docs: DataFrame, n: Int = 100): DataFrame =
    spread(docs)
      .select(explode(array_distinct(words(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("word"))
      .limit(n)

  /** Per-doc top TF-IDF terms (keyword extraction): score = tf · ln(N/df)
    * with the corpus-derived document frequencies; the ranking key is the
    * 1e-4-rounded score (then the term) so cross-engine `ln` ulps cannot
    * reorder near-ties. Shapes: one token aggregate, a vocabulary-sized
    * dictionary join, and a per-doc rank that WindowGroupLimit prunes
    * map-side — no whole-corpus sort.
    */
  def tfIdfTopTerms(docs: DataFrame, nDocs: Long, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = spread(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score",
        floor(col("tf") * log(lit(nDocs.toDouble) / col("df")) * 1e4 + 0.5) / 1e4)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** BM25 retrieval scoring — top-k documents for a bag-of-terms query
    * (the relevance primitive behind retrieval-based quality filtering
    * and decontamination-by-retrieval of training corpora). Standard
    * Robertson/Okapi form with the +0.5 idf smoothing:
    * score(d, q) = Σ_{t∈q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) ·
    * tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)).
    *
    * Scale shape (100 TB): the query-term filter prunes the token
    * explode BEFORE any shuffle, so tf aggregates only matching tokens;
    * df is |query|-sized and avgdl/N are scalars (1-row frame,
    * broadcast); scoring is one equi-join on term + one per-doc sum +
    * the shared top-k tail. avgdl is 1e-6-rounded before use and every
    * other step is explicit arithmetic, so an engine replaying the same
    * folds reproduces the ranking.
    */
  def bm25TopK(docs: DataFrame, query: Seq[String], nDocs: Long, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = query.map(_.toLowerCase).distinct
    val wl = spread(docs).select(col("doc_id"),
      size(filter(words(col("text")), t => length(t) > 0)).cast("double").as("dl"))
    val avgdl = wl.agg((floor(avg(col("dl")) * 1e6 + 0.5) / 1e6).as("avgdl"))
    val tf = spread(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfx = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl"))
    val scored = tf.join(broadcast(dfx), "term").join(wl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .groupBy("doc_id")
      .agg(sum(idf * col("tf") * (k1 + 1) / norm).as("__s"))
    // rank on the ROUNDED score (the tfidf precedent): cross-engine ln()
    // ulps cannot flip near-ties, and rounded ties break by doc_id
    // identically everywhere. TakeOrderedAndProject keeps the top-k
    // selection distributed (per-partition heaps); only then does the
    // k-row frame take a global rank.
    val rounded = scored.withColumn("score", floor(col("__s") * 1e4 + 0.5) / 1e4)
    val top = rounded.orderBy(col("score").desc, col("doc_id")).limit(k)
    // empty partition spec over the k-row frame is intentional and bounded
    // (see Sampling.weightedSample — the warning it triggers is documented
    // in SCALE.md and demoted in the tools' logging config)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }

  /** Unigram-surprisal quality score: per-doc mean of `-log2(df/N)` over
    * its tokens, where df = corpus document frequency and N = corpus size —
    * the standard LM-rarity signal (high = rare/uncommon text, low =
    * boilerplate). Two phases: a word→df dictionary aggregated from the
    * corpus itself, then a token→dictionary equi-join + per-doc mean (the
    * dictionary is vocabulary-sized; Catalyst broadcasts it when small and
    * shuffle-joins otherwise — both correct). nDocs is passed in so the
    * caller controls the one count() job.
    */
  def lmSurprisal(docs: DataFrame, nDocs: Long): DataFrame = {
    // cached: the df dictionary and the score join shuffle the token
    // frame on different keys (doc_id+word vs word), so the tokenize+
    // explode would otherwise run twice (r17)
    val tok = spread(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .transform(graft.core.Caches.corpus)
    val dict = tok.select(col("doc_id"), col("word")).distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tok.join(dict, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (floor(avg(-log2(col("df").cast("double") / nDocs)) * 1e4 + 0.5) / 1e4).as("surprisal"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
  }

  /** Interpolated bigram-LM surprisal — the KenLM-shaped upgrade of
    * [[lmSurprisal]]: per-doc mean of
    * `-log2(λ·P(w₂|w₁) + (1−λ)·P(w₂))` over the doc's adjacent word
    * pairs, with both models estimated from the corpus itself
    * (`P(w₂|w₁) = C(w₁w₂)/C(w₁·)` over bigram occurrences,
    * `P(w) = C(w)/T` over all tokens). The unigram interpolation floors
    * every probability above zero, so no smoothing constants are needed —
    * any bigram seen in a doc exists in the corpus counts by
    * construction. All counts are exact integers; the only floats are
    * the final per-position log and the 1e-4-rounded per-doc mean (the
    * same discipline that keeps [[lmSurprisal]] engine-portable).
    *
    * Scale shape: three partial+final hash aggregates build the count
    * tables (bigram, context, unigram — each vocabulary-sized, joined
    * back by key; Catalyst broadcasts the small ones), then one per-doc
    * aggregate. No window, no per-doc token list after the explode.
    * Output: (doc_id, n_bigrams, bigram_surprisal) — null score for docs
    * with fewer than two words.
    */
  def bigramSurprisal(docs: DataFrame, lambda: Double = 0.7,
      lambdaU: Double = 0.3): DataFrame = {
    val wf = filter(words(col("text")), x => length(x) > 0)
    val base = spread(docs).select(col("doc_id"), wf.as("__wf"))
    // cache the exploded bigram frame: three consumers (the two count
    // tables and the per-occurrence score join) shuffle it on DIFFERENT
    // keys, so exchange reuse cannot dedup them and the interpreted
    // struct-building transform would re-run per consumer (r17: ~3×
    // the tokenize+explode work, the hottest text extra by cpu)
    val bg = base.select(col("doc_id"), explode(
        when(size(col("__wf")) >= 2,
          transform(sequence(lit(0), size(col("__wf")) - 2), i =>
            struct(element_at(col("__wf"), i + 1).as("w1"),
              element_at(col("__wf"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("__bg"))
      .select(col("doc_id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .transform(graft.core.Caches.corpus)
    val tok = base.select(col("doc_id"), explode(col("__wf")).as("word"))
    val bgc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cbg"))
    val w1c = bg.groupBy("w1").agg(count(lit(1)).as("cw1"))
    val uc = tok.groupBy("word").agg(count(lit(1)).as("cu"))
    // T = Σ unigram counts — integer-exact, and it saves the second
    // explode pass over the token frame (r17)
    val tot = uc.agg(sum(col("cu")).as("t"))
    val scored = bg
      .join(bgc, Seq("w1", "w2")).join(w1c, Seq("w1"))
      .join(uc, col("word") === col("w2")).crossJoin(broadcast(tot))
      .withColumn("__p",
        lit(lambda) * col("cbg").cast("double") / col("cw1").cast("double") +
          lit(lambdaU) * col("cu").cast("double") / col("t").cast("double"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(avg(-log2(col("__p"))) * 1e4 + 0.5) / 1e4).as("bigram_surprisal"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** CCNet-style perplexity bucketing: split scored docs into
    * head / middle / tail at the score terciles (the standard
    * quality-partitioning step before mixing a training corpus — head =
    * lowest-score/cleanest under a real LM perplexity; with
    * [[lmSurprisal]] as the scorer, LOW surprisal = common/boilerplate,
    * so interpret accordingly or pass any other per-doc score).
    *
    * The cutoffs are exact percentiles of the ROUNDED scores, re-rounded,
    * and assignment compares rounded-to-rounded — a replaying engine
    * makes identical bucket calls. NULL scores (empty docs) land in
    * 'empty'. The threshold frame is one row, broadcast — no driver
    * collect, no second scan of `scored`.
    *
    * Scale shape: one percentile aggregate (two exact percentiles over
    * the score column) + a broadcast-1-row join; both fine at any corpus
    * size (exact percentile shuffles the scores once).
    */
  def perplexityBuckets(scored0: DataFrame,
      scoreCol: String = "surprisal"): DataFrame = {
    // doc-sized cache: the tercile aggregate and the bucket-assignment
    // join both read the scored frame, whose producer (an LM scorer) is
    // the expensive part — score once, not twice (r17)
    // NOTE (r17 ADVICE, documented r18): this caches the CALLER-OWNED
    // frame — a deliberate side effect, since the tercile aggregate and
    // the assignment join would otherwise run the caller's (typically
    // LM-scorer) producer twice; callers that manage their own
    // persistence should pass an already-cached frame (the cache call is
    // then a no-op) and unpersist on their own schedule.
    val scored = scored0.cache()
    val s = col(scoreCol)
    // one array-fraction percentile: two separate aggs would each buffer
    // a full copy of the score column (the q_dq_histogram lesson)
    val th = scored
      .agg(transform(percentile(s, array(lit(1.0 / 3), lit(2.0 / 3))),
        x => floor(x * 1e4 + 0.5) / 1e4).as("__t"))
      .select(element_at(col("__t"), 1).as("__t1"),
        element_at(col("__t"), 2).as("__t2"))
    scored.crossJoin(broadcast(th))
      .withColumn("ppl_bucket",
        when(s.isNull, "empty")
          .when(s <= col("__t1"), "head")
          .when(s <= col("__t2"), "middle")
          .otherwise("tail"))
      .drop("__t1", "__t2")
  }

  /** Document-level pointwise mutual information of word pairs:
    * PMI(a,b) = ln(n_ab · N / (n_a · n_b)) over per-doc distinct words
    * (presence, not term frequency — the collocation-discovery /
    * topic-pair pass of a corpus analysis).
    *
    * Scale shape: the raw pair space is |vocab|² and per-doc pair
    * expansion is |doc vocab|², both ruinous at corpus scale — so the
    * vocabulary is pruned FIRST to the `topV` words by document frequency
    * (deterministic tie-break on the word). The prune dictionary is
    * broadcast (topV rows), the per-doc pair explode is then bounded by
    * topV² per doc, and only (pair → count) aggregates shuffle. `minPair`
    * drops the noise tail (PMI of rare pairs is unstable anyway). The
    * doc_id self-join co-partitions both sides on one shuffle key.
    */
  def pmiPairs(docs: DataFrame, nDocs: Long, topV: Int = 150,
      minPair: Long = 5): DataFrame = {
    val dw = spread(docs)
      .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
    val vocab = dw.groupBy("word").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word")).limit(topV)
    val kept = dw.join(broadcast(vocab), "word")
    val a = kept.select(col("doc_id"), col("word").as("w1"), col("df").as("df1"))
    val b = kept.select(col("doc_id"), col("word").as("w2"), col("df").as("df2"))
    a.join(b, "doc_id").filter(col("w1") < col("w2"))
      .groupBy("w1", "w2", "df1", "df2")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
      .select(col("w1"), col("w2"), col("n_ab"), col("df1"), col("df2"),
        (floor(log(col("n_ab").cast("double") * nDocs.toDouble /
          (col("df1") * col("df2")).cast("double")) * 1e4 + 0.5) / 1e4).as("pmi"))
  }

  /** EXACT heavy hitters — every word with count > totalWords/k, with its
    * exact count — via a distributed two-pass Misra-Gries sketch:
    *
    *  pass 1: each partition runs Misra-Gries with k−1 counters (bounded
    *    memory, amortized O(1)/word: each decrement round cancels k−1
    *    prior increments) and emits its surviving candidate words plus its
    *    word total. The union of per-partition candidates is a SUPERSET of
    *    the true heavy hitters by pigeonhole: if a word's count were
    *    ≤ nₚ/k in every partition, summing gives ≤ n/k overall — so a
    *    global heavy hitter clears the per-partition MG bar somewhere.
    *  pass 2: exact counts for candidate words only (broadcast semi-join —
    *    at most k−1 × numPartitions candidates, metadata-sized), filtered
    *    by the exact threshold count·k > n.
    *
    * So the OUTPUT is exact and deterministic (partition layout only
    * affects the candidate superset, which pass 2 prunes), while nothing
    * the size of the full vocabulary ever shuffles — the contrast with the
    * exact groupBy-count path whose shuffle carries every distinct word.
    */
  /** Distributed BPE merge training (Sennrich et al.): learn the first
    * `numMerges` byte-pair merges of a corpus. Returns one row per merge:
    * (rank, x, y, c) — the pair merged at that round and its weighted
    * count at selection time. Ties break (count desc, x asc, y asc), so
    * the merge table is fully deterministic and oracle-replayable.
    *
    * The classic trainer shape, distributed: training runs over the
    * DISTINCT-WORD frequency table (vocabulary-sized — one corpus pass
    * builds it; at 100 TB the vocab is millions of rows where the corpus
    * is trillions of tokens), per round:
    *   1. pair counts: explode zipped adjacent token pairs weighted by
    *      word count — partial+final sum, shuffle carries distinct pairs;
    *   2. argmax: orderBy/limit(1) → TakeOrderedAndProject, one
    *      metadata-sized driver collect per round (the k-means stance);
    *   3. merge apply: left-to-right non-overlapping replacement via the
    *      POSITIONAL PARITY trick — islands of consecutive matching
    *      positions (islands grp = pos − row_number), select every even
    *      offset in each island, drop the consumed successor. No
    *      sequential fold, no UDF; matches can only overlap when x == y,
    *      and parity selection handles exactly that case.
    * The vocab is localCheckpoint'd per round (vocabulary-sized) so the
    * window/rebuild lineage does not nest across rounds.
    *
    * Driver-loop bound (r9 verdict #4): this EXACT greedy form runs one
    * pair-count job + one argmax collect + one checkpoint per merge —
    * 2·numMerges Spark jobs. The wall at real vocabulary sizes (30k
    * merges = 60k driver round-trips) is the ROUND COUNT, not data
    * volume; [[bpeTrainBatched]] is the scale path, applying a batch of
    * token-disjoint merges per count job. The exact form stays as the
    * oracle-replayable ground truth (q_pl_bpe) and as the batch=1 anchor
    * the batched trainer is spec-pinned against.
    */
  def bpeTrain(docs: DataFrame, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "bpeTrain needs at least one merge")
    val spark = docs.sparkSession
    import org.apache.spark.sql.expressions.Window
    var vocab = spread(docs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val pc = vocab.select(col("cnt"),
          explode(arrays_zip(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
        .select(col("p.0").as("x"), col("p.1").as("y"), col("cnt"))
        .groupBy("x", "y").agg(sum("cnt").as("c"))
      val top = pc.orderBy(col("c").desc, col("x"), col("y")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (x, y, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, x, y, c))
        vocab = applyMerge(vocab, x, y).localCheckpoint()
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "x", "y", "c")
      .select(col("rank").cast("long"), col("x"), col("y"), col("c"))
  }

  /** Batched BPE training — the standard parallel-BPE trick that turns
    * the merges=rounds driver loop of [[bpeTrain]] into
    * ceil(numMerges/batch) rounds: each round counts pairs ONCE, then
    * greedily selects up to `batch` candidates in (count desc, x, y)
    * order subject to CONSERVATIVE disjointness — a candidate is skipped
    * if its x or y intersects any already-selected pair's {x, y, x·y}.
    * Token-disjoint merges commute and cannot change each other's
    * occurrence counts (merging (a,b) only affects adjacencies involving
    * a, b, or the new symbol ab), so every selected pair's recorded count
    * is exactly the count the sequential trainer would have seen for it
    * given the prior BATCHES — the round's merges all apply to the
    * round-start vocab in one lineage, one checkpoint.
    *
    * Deviation contract (the parallel-BPE approximation): within a round,
    * sequential greedy could interleave a pair CREATED by an earlier
    * batch member (count(new ab·d) ≤ count(a,b)) ahead of a later batch
    * member; the batched table can therefore differ from the exact
    * greedy table in those positions. batch=1 is EXACTLY [[bpeTrain]]
    * (spec-pinned); the gated oracle form stays the exact trainer.
    *
    * Driver jobs: 2 per ROUND (count+collect, checkpoint) — 30k merges
    * at batch=16 is ~3.8k jobs instead of 60k; per-round shapes are
    * unchanged (vocabulary-sized frames, island-parity apply, no UDF).
    */
  def bpeTrainBatched(docs: DataFrame, numMerges: Int, batch: Int = 8): DataFrame = {
    require(numMerges >= 1, "bpeTrainBatched needs at least one merge")
    require(batch >= 1, "batch must be >= 1")
    val spark = docs.sparkSession
    var vocab = spread(docs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batch, numMerges - merges.size)
      val pc = vocab.select(col("cnt"),
          explode(arrays_zip(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1))).as("p"))
        .select(col("p.0").as("x"), col("p.1").as("y"), col("cnt"))
        .groupBy("x", "y").agg(sum("cnt").as("c"))
      // over-fetch so conflicts can be skipped without a second job; the
      // head candidate is always selectable, so a non-empty fetch always
      // advances (no livelock), it just may fill less than `want`.
      val top = pc.orderBy(col("c").desc, col("x"), col("y"))
        .limit(want * 8 + 8).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = top.iterator
        while (sel.size < want && it.hasNext) {
          val row = it.next()
          val (x, y) = (row.getString(0), row.getString(1))
          // x+y is screened too: a pair whose tokens or CREATED symbol
          // touch an earlier selection waits for the next round
          if (!used(x) && !used(y) && !used(x + y)) {
            sel += ((x, y, row.getLong(2)))
            used ++= Seq(x, y, x + y)
          }
        }
        sel.foreach { case (x, y, c) => merges += ((merges.size + 1, x, y, c)) }
        sel.foreach { case (x, y, _) => vocab = applyMerge(vocab, x, y) }
        vocab = vocab.localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "x", "y", "c")
      .select(col("rank").cast("long"), col("x"), col("y"), col("c"))
  }

  /** One merge (x, y) → xy applied to a `(word, cnt, toks)` vocab frame —
    * the island-parity replacement described in [[bpeTrain]].
    */
  private def applyMerge(vocab: DataFrame, x: String, y: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPos = Window.partitionBy("word").orderBy("pos")
    val ex = vocab
      .select(col("word"), col("cnt"), posexplode(col("toks")))
      .withColumnsRenamed(Map("col" -> "t"))
      .withColumn("nxt", lead(col("t"), 1).over(wPos))
      .withColumn("mt", col("t") === lit(x) && col("nxt") === lit(y))
    val withGrp = ex.withColumn("grp",
      when(col("mt"), col("pos") - row_number().over(
        Window.partitionBy(col("word"), col("mt")).orderBy(col("pos")))))
    val withSel = withGrp.withColumn("sel",
        col("mt") && (row_number().over(
          Window.partitionBy(col("word"), col("grp")).orderBy(col("pos")))
          - 1) % 2 === 0)
      .withColumn("selp", coalesce(lag(col("sel"), 1).over(wPos), lit(false)))
    withSel
      .withColumn("newt",
        when(col("sel"), lit(x + y))
          .when(col("selp"), lit(null).cast("string"))
          .otherwise(col("t")))
      .filter(col("newt").isNotNull)
      .groupBy(col("word"), col("cnt"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("newt").as("tk")))),
        s => s.getField("tk")).as("toks"))
  }

  /** Tokenize with a learned merge table: the merges fold over the
    * DISTINCT-WORD table in rank order (k merge rounds on a
    * vocabulary-sized frame), then one equi-join maps tokenizations back
    * to documents — the corpus is touched twice (word extraction, final
    * join), never per-merge. Output: per doc, word/token counts and the
    * compression ratio the learned vocabulary achieves.
    */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var vocab = spread(docs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint()
    merges.foreach { case (x, y) =>
      vocab = applyMerge(vocab, x, y).localCheckpoint()
    }
    val dw = spread(docs)
      .select(col("doc_id"), explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    dw.join(vocab.select(col("word"), size(col("toks")).as("ntk")), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("ntk")).as("n_tokens"),
        (floor(sum(col("ntk")) / count(lit(1)) * 1e4 + 0.5) / 1e4).as("avg_tpw"))
  }

  /** Count–min sketch coefficient schedule — PUBLIC so the oracle SQL is
    * generated from the same constants (the MinHash-estimator lesson:
    * replaying a sketch means replaying the FULL schedule).
    */
  val CmsP = 2147483647L
  val CmsA = Seq(1000003L, 999983L, 999979L, 999961L)
  val CmsB = Seq(17L, 31L, 47L, 61L)

  /** Deterministic count–min sketch (Cormode & Muthukrishnan) frequency
    * estimation: a depth×width counter table over the word stream, point
    * estimates = min over rows of the hashed-bucket counters. One-sided
    * error: est ≥ exact always, est ≤ exact + 2n/width w.h.p. — the
    * mergeable, fixed-size summary for approximate frequencies when the
    * vocabulary no longer fits anywhere (Misra–Gries answers "which are
    * heavy", CMS answers "how often is THIS word", including non-heavy
    * probes).
    *
    * Determinism across engines: row hashes are md5-derived `hash31`
    * affine transforms under [[CmsP]] with the [[CmsA]]/[[CmsB]]
    * schedule — no engine RNG, so a SQL oracle rebuilds the identical
    * table cell for cell.
    *
    * Shape: ONE partial+final aggregate over depth stacked bucket
    * projections (posexplode of a 4-element array — depth×n rows into a
    * depth×width-cell result); the probe pass joins the ≤ depth×width
    * cell frame back by broadcast. The exact-count frame here exists
    * only to pick the probe set and pin the error empirically — at
    * production scale the sketch REPLACES it.
    *
    * Output: (word, exact, cms_est) for the top `probeTopN` words by
    * exact count (ties word-asc), est-over-exact visible per row.
    */
  def cmsEstimate(docs: DataFrame, width: Int = 256, probeTopN: Int = 20): DataFrame = {
    require(width >= 2, "cms width must be >= 2")
    require(probeTopN >= 1, "need at least one probe word")
    val w = spread(docs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    def bucket(i: Int, wordHash: Column): Column =
      pmod(pmod(wordHash * lit(CmsA(i)) + lit(CmsB(i)), lit(CmsP)), lit(width.toLong))
    val cells = w
      .select(posexplode(array(CmsA.indices.map(i => bucket(i, hash31(col("word")))): _*))
        .as(Seq("row_i", "bucket")))
      .groupBy("row_i", "bucket").agg(count(lit(1)).as("c"))
    val exact = w.groupBy("word").agg(count(lit(1)).as("exact"))
    val probes = exact.orderBy(col("exact").desc, col("word")).limit(probeTopN)
    probes
      .select(col("word"), col("exact"),
        posexplode(array(CmsA.indices.map(i => bucket(i, hash31(col("word")))): _*))
          .as(Seq("row_i", "bucket")))
      .join(broadcast(cells), Seq("row_i", "bucket"))
      .groupBy("word", "exact").agg(min(col("c")).as("cms_est"))
      .orderBy(col("exact").desc, col("word"))
  }

  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "heavy hitters needs k >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = spread(docs)
      .select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    // word = null marks the partition-total row
    val p1 = w.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { x =>
        n += 1
        m.get(x) match {
          case Some(c) => m.update(x, c + 1)
          case None if m.size < k - 1 => m.update(x, 1L)
          case None =>
            m.keysIterator.toArray.foreach { kk =>
              val c = m(kk) - 1
              if (c == 0) m.remove(kk) else m.update(kk, c)
            }
        }
      }
      Iterator.single((null: String, n)) ++ m.keysIterator.map(kk => (kk, 0L))
    }.toDF("word", "n")
    val total = p1.filter(col("word").isNull)
      .agg(sum(col("n")).as("total"))
    val cands = p1.filter(col("word").isNotNull).select("word").distinct()
    w.join(broadcast(cands), "word")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("total"))
      .select(col("word"), col("cnt"), col("total"))
  }

  /** Flesch reading-ease per doc from cheap whole-text counts: words
    * (whitespace), sentences (terminal-punctuation runs, min 1),
    * syllables approximated as vowel-group runs — the standard regex
    * approximation (under-counts "rhythm"-class words, over-counts
    * diphthong-splits; fine for corpus-level quality binning, not for
    * per-document grading). Pure per-row projection — no shuffle, scales
    * with the scan.
    */
  def readability(docs: DataFrame): DataFrame = {
    val nWords = size(words(col("text"))).cast("long")
    val nSent = greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long"))
    val nSyll = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
    docs.select(col("doc_id"), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyll.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(floor((lit(206.835)
            - lit(1.015) * (col("n_words") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables") / col("n_words"))) * 1e4 + 0.5) / 1e4))
  }

  /** Zipf rank-frequency fit per language: least-squares regression of
    * ln(freq) on ln(rank) over the top-`topN` terms — slope ≈ −1 is the
    * Zipfian signature; a flat slope or low r² flags synthetic/boilerplate
    * text (a corpus-quality screen). One vocab aggregate (partial+final),
    * one rank window over the VOCAB frame (not the corpus), one
    * regression aggregate over ≤ topN rows per language.
    */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    val tf = spread(docs)
      .select(col("lang"), explode(words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("lang", "word").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("word"))
    tf.withColumn("rank", row_number().over(w)).filter(col("rank") <= topN)
      .groupBy("lang")
      .agg(
        (floor(regr_slope(log(col("n")), log(col("rank"))) * 1e4 + 0.5) / 1e4).as("slope"),
        (floor(regr_intercept(log(col("n")), log(col("rank"))) * 1e4 + 0.5) / 1e4).as("intercept"),
        (floor(regr_r2(log(col("n")), log(col("rank"))) * 1e4 + 0.5) / 1e4).as("r2"),
        count(lit(1)).as("n_terms"))
  }
}

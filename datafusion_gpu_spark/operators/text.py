"""Text-analysis operators: language-ID, quality scoring, token counting,
fingerprinting. All pure built-in column expressions (codegen-friendly,
no Python workers), each with exactly-mirrorable SQL semantics so the
DuckDB oracle can replay the formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_gpu_spark.operators.dedup import normalize_text

#: Tiny deterministic stopword profiles for the n-gram/stopword heuristic.
#: (The corpus is synthetic; the operator contract is the deterministic
#: argmax formula, mirrored 1:1 in the SQL oracle.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}
#: Deterministic tiebreak order (first wins on equal score).
LANG_ORDER = ("en", "es", "de", "fr")


def _marker_count(words: Column, markers: tuple[str, ...]) -> Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(words, lambda w: F.array_contains(marker_arr, w)))


def lang_id(col: Column | str) -> Column:
    """Argmax over stopword-profile hit counts; 'und' (undetermined) when
    every profile scores zero. Ties resolve in LANG_ORDER."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(normalize_text(c), " ")
    scores = {lang: _marker_count(words, LANG_MARKERS[lang]) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(LANG_ORDER):  # build CASE so earlier langs win ties
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + a composite score in [0, ~1].

    Features: char/word counts, mean word length, punctuation ratio,
    stopword ratio. The score formula is arbitrary but fixed — the point
    is the deterministic, scale-free columnar pipeline.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = F.col(text_col)
    words = F.split(normalize_text(c), " ")
    n_chars = F.length(c)
    n_words = F.size(words)
    mean_wlen = (F.length(F.regexp_replace(normalize_text(c), " ", "")) / n_words)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    stop = _marker_count(words, LANG_MARKERS["en"])
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (stop / n_words) * 0.4
        + (F.lit(1.0) - punct / n_chars) * 0.2
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        punct.alias("n_punct"),
        stop.alias("n_stopwords"),
        F.round(score, 6).alias("quality_score"),
    )


#: BPE-ish tokenizer regex: letter runs | digit runs | single non-space symbol.
TOKEN_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + regex (BPE-ish) tokens per document."""
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = normalize_text(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(F.split(c, " ")).alias("ws_tokens"),
        F.regexp_count(c, F.lit(TOKEN_PATTERN)).cast("int").alias("re_tokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact identity) and
    the min word-hash (a 1-permutation MinHash — cheap near-identity)."""
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = F.col(text_col)
    words = F.split(normalize_text(c), " ")
    return docs.select(
        "doc_id",
        F.md5(normalize_text(c)).alias("content_md5"),
        F.array_min(F.transform(words, lambda w: F.md5(w))).alias("min_word_md5"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk_md5): split each document
    into overlapping ``chunk_tokens``-word windows every ``stride`` words —
    the context-window packing / RAG-chunking primitive (stride < chunk
    gives the overlap that keeps sentences from being cut at every
    boundary; the final partial window is kept).

    Chunks are emitted as md5 digests plus offsets, not repeated text: at
    100 TB an overlapping chunker that materializes text amplifies the
    corpus by chunk/stride — downstream consumers slice the original
    column by (start, n_tokens) instead. posexplode over a
    sequence-of-starts; slice/array_join/size are codegen'd array ops (no
    per-token lambda — the 16x interpreted-HOF penalty does not apply).
    Embarrassingly parallel, zero shuffle.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    # chunk c covers words [c*stride, c*stride + chunk_tokens); last start
    # is the greatest multiple of stride < n
    starts = F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("long") * stride,
                        F.lit(stride))
    chunk = F.slice(F.col("w"), F.col("start") + 1, chunk_tokens)
    return (
        docs.where(n >= 1)
        .select(
            "doc_id", words.alias("w"), F.posexplode(starts).alias("chunk_id", "start")
        )
        .select(
            "doc_id",
            "chunk_id",
            "start",
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


#: PII patterns, applied in order (IP before phone so "1.2.3.4" is not
#: half-eaten as a dotted phone; SSN before phone — 3-2-4 vs 3-3-4
#: groupings are disjoint but order makes intent explicit). Regexes stay
#: in the portable Java∩RE2 subset so the SQL oracle replays them.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_email, n_ip, n_ssn, n_phone): scrub personally
    identifying strings from a corpus before training — emails, IPv4s,
    SSN-shaped ids, phone numbers — each replaced by a typed placeholder
    token, plus per-kind match counts for corpus auditing.

    A chain of regexp_replace/regexp_count column expressions: whole-stage
    codegen end to end, embarrassingly parallel, no shuffle at any scale.
    Counts are taken BEFORE any replacement so overlapping kinds audit
    against the original text, while replacements apply in PII_PATTERNS
    order.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)).cast("int").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]
    red = c
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return docs.select("doc_id", red.alias("redacted"), *counts)


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021,
    §A1.1): the fraction of duplicated words, the share of the document
    claimed by its single most frequent word / 2-gram, and the share of
    characters inside duplicated 3-grams. Heavily repeated boilerplate
    (nav bars, SEO spam, template farms) scores high on all four and is
    the first thing a pretraining-corpus filter drops.

    One pass: ``inline`` explodes each word position into its 1/2/3-gram
    rows (pure codegen, no HOF lambda), then a (doc, n, gram) count and a
    per-doc conditional aggregate — two key shuffles total, both bounded
    by document size, no joins. ``repetitive`` applies fixed thresholds
    on the two strongest signals. The top-2-gram metric considers only
    REPEATED grams (count > 1): a short document's single long 2-gram is
    coverage, not repetition.

    Fractions are round(6) so the DuckDB oracle replays them exactly.
    """
    from pyspark.sql import Window

    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = words.select(
        "doc_id",
        "word",
        F.lead("word", 1).over(w).alias("w1"),
        F.lead("word", 2).over(w).alias("w2"),
    )
    grams = (
        leads.select(
            "doc_id",
            F.inline(
                F.array(
                    F.struct(
                        F.lit(1).alias("n"), F.col("word").alias("gram")
                    ),
                    F.struct(
                        F.lit(2).alias("n"),
                        F.when(
                            F.col("w1").isNotNull(),
                            F.concat_ws(" ", "word", "w1"),
                        ).alias("gram"),
                    ),
                    F.struct(
                        F.lit(3).alias("n"),
                        F.when(
                            F.col("w2").isNotNull(),
                            F.concat_ws(" ", "word", "w1", "w2"),
                        ).alias("gram"),
                    ),
                )
            ),
        )
        .where(F.col("gram").isNotNull())
    )
    counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is1 = F.col("n") == 1
    per_doc = counts.groupBy("doc_id").agg(
        F.sum(F.when(is1, F.col("cnt"))).alias("n_words"),
        F.count(F.when(is1, F.lit(1))).alias("n_distinct_words"),
        F.max(F.when(is1, F.col("cnt"))).alias("top_word_cnt"),
        F.max(
            F.when(
                (F.col("n") == 2) & (F.col("cnt") > 1),
                F.col("cnt") * F.length("gram"),
            )
        ).alias("top2_chars"),
        F.sum(
            F.when(
                (F.col("n") == 3) & (F.col("cnt") > 1),
                F.col("cnt") * F.length("gram"),
            )
        ).alias("dup3_chars"),
        F.sum(F.when(is1, F.col("cnt") * F.length("gram"))).alias("word_chars"),
    )
    norm_len = F.col("word_chars") + F.col("n_words") - 1  # separators
    dup_word = F.round(
        1.0 - F.col("n_distinct_words") / F.col("n_words"), 6
    )
    top_word = F.round(F.col("top_word_cnt") / F.col("n_words"), 6)
    top2 = F.round(F.coalesce(F.col("top2_chars"), F.lit(0)) / norm_len, 6)
    dup3 = F.round(F.coalesce(F.col("dup3_chars"), F.lit(0)) / norm_len, 6)
    return per_doc.select(
        "doc_id",
        F.col("n_words"),
        dup_word.alias("dup_word_frac"),
        top_word.alias("top_word_frac"),
        top2.alias("top_2gram_char_frac"),
        dup3.alias("dup_3gram_char_frac"),
        # Gopher drops docs with top-2gram share > 0.20 or heavy
        # duplicated-n-gram coverage; threshold on the ROUNDED values so
        # the oracle's boundary decisions match bit-for-bit.
        (
            (top2 > 0.20) | (dup3 > 0.60)
        ).alias("repetitive"),
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 3,
    threshold: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, count how
    many of its distinct word n-grams also appear anywhere in a benchmark
    set (the standard eval-leakage check before training — e.g. GPT-3
    appendix C / PaLM §7 use 8-13-gram overlap; the contract here is the
    same, n is a knob).

    The benchmark's distinct gram-hash set is tiny relative to the corpus
    (evals are MBs, corpora are TBs) — it broadcasts, so the corpus scan
    is map-side: explode grams, hash (portable 60-bit so the oracle
    replays), per-doc distinct, broadcast-semi-join, count. One shuffle
    (the per-doc count), no corpus-sized join. Docs sharing >= threshold
    grams with the benchmark are flagged.
    """
    from pyspark.sql import Window

    from datafusion_gpu_spark.context import ensure_parallelism
    from datafusion_gpu_spark.operators.dedup import word_hash60

    def _gram_hashes(rel: DataFrame) -> DataFrame:
        words = rel.select(
            "doc_id",
            F.posexplode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("pos", "word"),
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        gram = F.concat_ws(
            " ", "word", *[F.lead("word", i).over(w) for i in range(1, n)]
        )
        last = F.lead("word", n - 1).over(w)
        return words.select(
            "doc_id", word_hash60(gram).alias("h"), last.alias("_full")
        ).where(F.col("_full").isNotNull()).drop("_full")

    docs = ensure_parallelism(docs)
    bench_grams = _gram_hashes(bench).select("h").distinct()
    doc_grams = _gram_hashes(docs).distinct()
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    alpha: float = 0.5,
    threshold: float = 3.5,
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style language-model quality filter: score every document by
    its average negative log-likelihood under a unigram LM with add-alpha
    smoothing trained on the corpus itself, and flag outliers. Documents
    whose word distribution diverges from the corpus (gibberish, boiler-
    plate, wrong-language fragments) score high and are the classic
    perplexity-filter drops (Wenzek et al. 2020 use a KenLM 5-gram; the
    contract here is the same shape with the simplest estimator).

    p(w) = (count(w) + alpha) / (total + alpha * vocab). The vocabulary
    relation is an aggregate of the corpus (dimension-sized: vocabularies
    are millions of rows when corpora are billions of documents) — it
    broadcasts into a map-side join against the exploded words, and the
    per-doc average is the one corpus-keyed shuffle. avg_nll rounds to
    6dp so the oracle's fold order can't flip the threshold comparison.

    Training the LM and scoring against it are two fundamentally
    separate passes over the words, so one re-tokenization is inherent;
    the lazy spelling paid a THIRD copy under the (total, vocab) scalar
    and re-derived the counts independently for the broadcast build.
    r15 (guide §5): the vocabulary-sized ``counts`` relation is
    materialized once and feeds both the (total, vocab) scalar and the
    broadcast-join build side — tokenize runs exactly twice (LM build +
    scoring probe), no new shuffle, and the cached relation is
    vocabulary-sized, never corpus-sized. (Measured-first alternatives
    LOST on the bench and were backed out: materializing the word
    instances caches a corpus-sized relation; pre-aggregating per-doc
    tf adds a corpus-keyed groupBy(doc_id, word) shuffle just to save
    one map-side tokenize — a bad trade at any scale.)
    """
    from datafusion_gpu_spark.context import ensure_parallelism
    from datafusion_gpu_spark.operators.util import lineage_truncator

    docs = ensure_parallelism(docs)
    ckpt = lineage_truncator(docs.sparkSession.sparkContext)
    words = docs.select(
        "doc_id",
        F.explode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("word"),
    )
    counts = ckpt(
        words.groupBy("word").agg(F.count(F.lit(1)).alias("n_w"))
    )
    stats = counts.agg(
        F.sum("n_w").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    logp = F.log(
        (F.col("n_w") + F.lit(alpha))
        / (F.col("total") + F.lit(alpha) * F.col("vocab"))
    )
    avg_nll = F.round(F.avg(-logp), 6)
    return (
        words.join(F.broadcast(counts), "word")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            avg_nll.alias("avg_nll"),
        )
        .select(
            "doc_id",
            "n_words",
            "avg_nll",
            (F.col("avg_nll") > threshold).alias("low_quality"),
        )
    )


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Corpus-level collocations: adjacent word pairs ranked by pointwise
    mutual information — the standard signal for multi-word expressions
    ("new york") when building tokenizer merge rules or phrase tables.

    PMI = ln(n_pair * N_pairs / (n_left * n_right)), computed from three
    aggregations over ONE exploded word relation: pair counts, unigram
    counts (reused for both sides via two broadcast-sized joins after
    the min_count cut), and the scalar totals. All JVM expressions; the
    min_count filter bounds the join inputs long before the ranking, so
    at corpus scale the top-N window sees only frequent pairs, never the
    raw pair space.
    """
    from pyspark.sql import Window

    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = words.select(
        F.col("word").alias("left"),
        F.lead("word").over(w).alias("right"),
    ).where(F.col("right").isNotNull())

    pair_counts = pairs.groupBy("left", "right").agg(
        F.count(F.lit(1)).alias("n_pair")
    )
    uni = words.groupBy("word").agg(F.count(F.lit(1)).alias("n_word"))
    n_pairs_total = pairs.count()  # scalar; one job, reused as a literal

    frequent = pair_counts.where(F.col("n_pair") >= min_count)
    scored = (
        frequent.join(
            uni.select(F.col("word").alias("left"), F.col("n_word").alias("n_left")),
            "left",
        )
        .join(
            uni.select(
                F.col("word").alias("right"), F.col("n_word").alias("n_right")
            ),
            "right",
        )
        .select(
            "left",
            "right",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair")
                    * F.lit(float(n_pairs_total))
                    / (F.col("n_left") * F.col("n_right"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # top-N via ORDER BY + LIMIT: Spark plans TakeOrderedAndProject (a
    # bounded per-partition heap + tiny merge), never a single-partition
    # global window
    return scored.orderBy(
        F.col("pmi").desc(), F.col("left"), F.col("right")
    ).limit(top_n)


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", n: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): hash every
    word n-gram, slide a window of ``window`` consecutive hashes, keep
    each window's minimum, emit the distinct survivors per document.

    Guarantees (Schleimer et al., SIGMOD'03): any shared run of at least
    ``window + n - 1`` words between two documents shares at least one
    selected fingerprint — so matching documents on fingerprints finds
    every sufficiently long overlap, at ~2/(window+1) the density of
    full shingling. One explode + one bounded ROWS-frame window + one
    distinct: a single shuffle keyed by doc, partition state bounded by
    the window width. The hash is the portable 60-bit md5 prefix so SQL
    oracles replay selections bit-for-bit.
    """
    from pyspark.sql import Window

    from datafusion_gpu_spark.context import ensure_parallelism
    from datafusion_gpu_spark.operators.dedup import word_hash60

    docs = ensure_parallelism(docs)
    words = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    )
    w_order = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat_ws(
        " ", "word", *[F.lead("word", i).over(w_order) for i in range(1, n)]
    )
    grams = words.select(
        "doc_id",
        "pos",
        word_hash60(gram).alias("h"),
        F.lead("word", n - 1).over(w_order).alias("_full"),
    ).where(F.col("_full").isNotNull())
    w_frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(window - 1), 0)
    )
    selected = (
        grams.withColumn("fp", F.min("h").over(w_frame))
        .where(F.col("pos") >= window - 1 + 0)  # first full window
        .select("doc_id", "fp")
        .distinct()
    )
    return selected


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_punct_per_word: float = 0.1,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher document-level quality rules (Rae et al. 2021, §A1.1)
    as explicit per-rule verdicts: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio, and the required-stopwords rule
    (the repetition rules of the same appendix live in
    :func:`repetition_features`). A doc is kept only when every rule
    passes; emitting the individual booleans makes the filter auditable
    — a corpus report can aggregate per-rule drop rates.

    Pure codegen column expressions, zero shuffle; thresholds compare
    the ROUNDED ratios so the SQL oracle replays every boundary
    decision bit-for-bit.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    c = F.col(text_col)
    norm = normalize_text(c)
    words = F.split(norm, " ")
    n_words = F.size(words)
    mean_wlen = F.round(
        F.length(F.regexp_replace(norm, " ", "")) / n_words, 6
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))
    punct_per_word = F.round(punct / n_words, 6)
    stop = _marker_count(words, LANG_MARKERS["en"])
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = (mean_wlen >= min_mean_wlen) & (mean_wlen <= max_mean_wlen)
    ok_punct = punct_per_word <= max_punct_per_word
    ok_stop = stop >= min_stopwords
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        punct_per_word.alias("punct_per_word"),
        stop.alias("n_stopwords"),
        ok_wc.alias("ok_word_count"),
        ok_wl.alias("ok_mean_word_len"),
        ok_punct.alias("ok_punct_ratio"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_wl & ok_punct & ok_stop).alias("keep"),
    )


def c4_rules(
    docs: DataFrame,
    lines: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    require_terminal_punct: bool = True,
    banned_line_words: tuple[str, ...] = ("javascript",),
    banned_doc_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, §2.2) as auditable
    per-document verdicts: line-level — keep lines that end in terminal
    punctuation, have at least ``min_line_words`` words, and mention no
    banned word; document-level — drop pages containing any banned
    substring ("lorem ipsum", "{") or fewer than ``min_sentences``
    sentences. A doc survives when its doc-level rules pass and at least
    one line survives.

    ``lines`` is a (doc_id, pos, line) relation from dedup.split_lines
    (natural layout) or dedup.segment_lines (pseudo-lines for
    layout-free corpora; pass ``require_terminal_punct=False`` and
    ``min_sentences=0`` there, since such corpora carry no punctuation).
    Line verdicts are relational — one row per line, plain codegen
    predicates, no higher-order lambdas — then one per-doc aggregation
    and one doc-keyed join against the doc-level rule columns; both key
    on doc_id, so AQE plans them into a single exchange. Ratios are
    ROUNDED before comparison so the SQL oracle replays every boundary
    decision.
    """
    from datafusion_gpu_spark.context import ensure_parallelism

    docs = ensure_parallelism(docs)
    l = F.col("line")
    line_ok = F.size(F.split(l, " ")) >= min_line_words
    if require_terminal_punct:
        line_ok = line_ok & l.rlike('[.!?"]$')
    for w in banned_line_words:
        line_ok = line_ok & ~F.lower(l).contains(w)
    per_doc = (
        lines.select("doc_id", line_ok.alias("line_ok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("line_ok").cast("int")).alias("n_kept_lines"),
        )
    )
    c = F.col(text_col)
    ok_banned = F.lit(True)
    for s in banned_doc_substrings:
        ok_banned = ok_banned & ~F.lower(c).contains(s)
    n_sent = F.regexp_count(c, F.lit("[.!?]"))
    doc_side = docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        ok_banned.alias("ok_no_banned_substring"),
        (n_sent >= min_sentences).alias("ok_min_sentences"),
    )
    return per_doc.join(doc_side, "doc_id").select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.round(F.col("n_kept_lines") / F.col("n_lines"), 6).alias("kept_fraction"),
        "n_sentences",
        "ok_min_sentences",
        "ok_no_banned_substring",
        (
            F.col("ok_no_banned_substring")
            & F.col("ok_min_sentences")
            & (F.col("n_kept_lines") >= 1)
        ).alias("keep"),
    )


# -- BPE tokenizer training --------------------------------------------------


def bpe_train(
    docs: DataFrame,
    num_merges: int = 6,
    text_col: str = "text",
    return_state: bool = False,
    merge_batch: int = 1,
):
    """Train byte-pair-encoding merges on the corpus: the classic
    Sennrich et al. loop, distributed the way it scales — the state is
    the WORD-FREQUENCY table (|vocab| rows, not |corpus| rows; one
    corpus scan builds it), each round counts adjacent symbol pairs
    weighted by word frequency (one hash aggregation), picks the most
    frequent pair(s) with a deterministic (count desc, left, right)
    tiebreak, and applies them left-to-right per word in an
    Arrow-batched pass over the word table. Pair counting uses
    overlapping adjacent positions (the standard formulation); merge
    application is left-to-right non-overlapping.

    ``merge_batch=1`` (the default, and what every oracle/contract
    uses) is EXACT classic BPE: one merge per distributed round.
    ``merge_batch=B`` is the scale path for realistic vocab sizes
    (~30k merges would otherwise mean ~60k Spark jobs): each round
    collects the top candidate pairs and greedily admits up to B that
    are mutually SYMBOL-DISJOINT (no symbol of one admitted pair — nor
    its concatenation — appears in another), then applies the whole
    batch in rank order in ONE pass over the word table. Disjointness
    means each admitted pair's count is unaffected by the others, so
    in-pass rank-order application equals sequentially applying those
    picks; the one documented divergence from pure sequential training
    (shared with other parallel BPE trainers) is that a merge can mint
    a brand-new pair mid-batch that one-at-a-time training would have
    ranked before a later batch member. Lineage is
    localCheckpoint-truncated every 8 rounds so the logical plan stays
    O(1) in the round count instead of accreting one mapInPandas layer
    per round.

    Returns the learned merges as [(left, right, weighted_count)],
    rank-ordered — or (merges, final_state) when ``return_state`` is
    set (the caller owns unpersisting the state). At 100 TB the
    per-round cost is one aggregation over the vocabulary relation —
    the corpus is touched exactly once.
    """
    if merge_batch < 1:
        raise ValueError("merge_batch must be >= 1")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.split(F.col("w"), "").alias("syms"),
            "freq",
        )
    )
    state = words.persist()
    state.count()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    try:
        while len(merges) < num_merges:
            want = min(merge_batch, num_merges - len(merges))
            # over-fetch: symbol-disjointness filtering discards some
            pairs = (
                state.select(
                    F.posexplode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1),"
                            " (s, i) -> struct(s as l, syms[i + 1] as r))"
                        )
                    ).alias("pos", "p"),
                    "freq",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), "l", "r")
                .limit(4 * want)
                .collect()
            )
            if not pairs:
                break
            batch: list[tuple[str, str, int]] = []
            touched: set[str] = set()
            for row in pairs:
                left, right = row["l"], row["r"]
                if batch and (
                    left in touched
                    or right in touched
                    or (left + right) in touched
                ):
                    continue
                batch.append((left, right, int(row["n"])))
                touched.update((left, right, left + right))
                if len(batch) >= want:
                    break
            merges.extend(batch)
            batch_pairs = [(l, r) for l, r, _ in batch]

            def apply_batch(batches, batch_pairs=batch_pairs):
                for pdf in batches:
                    out = []
                    for syms in pdf["syms"]:
                        syms = list(syms)
                        for left, right in batch_pairs:  # rank order
                            merged, i = [], 0
                            while i < len(syms):
                                if (
                                    i + 1 < len(syms)
                                    and syms[i] == left
                                    and syms[i + 1] == right
                                ):
                                    merged.append(left + right)
                                    i += 2
                                else:
                                    merged.append(syms[i])
                                    i += 1
                            syms = merged
                        out.append(syms)
                    pdf = pdf.copy()
                    pdf["syms"] = out
                    yield pdf

            nxt = state.mapInPandas(
                apply_batch, "syms array<string>, freq long"
            )
            rounds += 1
            if rounds % 8 == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            state.unpersist()
            state = nxt
        if return_state:
            return merges, state
        return merges
    finally:
        if not return_state:
            state.unpersist()


def _bpe_merge_word(
    syms: list[str], ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Greedy lowest-rank-pair BPE merge of one word (the standard
    encode loop, e.g. GPT-2's encoder): repeatedly find the adjacent
    pair with the smallest merge rank and collapse all its occurrences
    left-to-right. Cost is O(len^2) per word, INDEPENDENT of the merge
    count — vs O(num_merges * len) for replaying every merge — which
    is the difference between usable and quadratic at ~30k merges.

    For any merge list produced by :func:`bpe_train` (where a merged
    symbol's constituents always carry strictly lower ranks than any
    merge consuming it) this is exactly equivalent to applying the
    merges sequentially in rank order.
    """
    while len(syms) > 1:
        best_rank = None
        best = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        left, right = best
        merged, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                merged.append(left + right)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize with trained BPE merges via a merge-RANK dict and the
    greedy lowest-rank-pair loop (:func:`_bpe_merge_word`) — per-word
    cost no longer scales with the merge count, and a per-partition
    memo caches each unique word's tokenization (Zipf makes the hit
    rate ~= 1 on natural text). One Arrow-batched pass over the corpus
    (the rank dict broadcasts in the task closure); no shuffle —
    tokens land partition-aligned with the documents.

    Returns the input plus ``out_col`` (array<string>) and
    ``n_tokens``.
    """
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{out_schema}, {out_col} array<string>, n_tokens int"

    def encode(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, counts = [], []
            for t in pdf[text_col]:
                toks: list[str] = []
                for w in str(t).lower().split():
                    got = memo.get(w)
                    if got is None:
                        got = _bpe_merge_word(list(w), ranks)
                        if len(memo) < 1_000_000:  # bound executor memory
                            memo[w] = got
                    toks.extend(got)
                toks_col.append(toks)
                counts.append(len(toks))
            pdf = pdf.copy()
            pdf[out_col] = toks_col
            pdf["n_tokens"] = counts
            yield pdf

    return docs.mapInPandas(encode, schema)


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-style readability features per doc, with the portable
    syllable proxy every fast quality pipeline uses (true syllable
    counting needs a dictionary): syllables ~= vowel GROUPS
    ('[aeiouy]+' runs, so 'table' counts 2, 'scan' counts 1).

    score = 206.835 - 1.015 * words/sentences - 84.6 * syllables/words

    Sentences = '[.!?]+' runs, floored at 1 (a fragment is one
    sentence). Pure column expressions — whole-stage codegen, no
    shuffle, embarrassingly parallel at any scale; every division is
    rounded to 4 so a SQL oracle replays the exact score."""
    c = F.lower(F.col(text_col))
    words = F.size(F.split(F.trim(c), r"\s+"))
    syllables = F.regexp_count(c, F.lit("[aeiouy]+"))
    sentences = F.greatest(F.regexp_count(c, F.lit("[.!?]+")), F.lit(1))
    wps = F.round(words.cast("double") / sentences, 4)
    spw = F.round(syllables.cast("double") / words, 4)
    return docs.select(
        "doc_id",
        words.alias("n_words"),
        syllables.alias("n_syllables"),
        sentences.alias("n_sentences"),
        wps.alias("words_per_sentence"),
        spw.alias("syllables_per_word"),
        F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4
        ).alias("flesch_score"),
    )


def bigram_lm_score(
    docs: DataFrame,
    alpha: float = 0.5,
    threshold: float = 3.5,
    text_col: str = "text",
) -> DataFrame:
    """Context-sensitive LM quality scoring: average negative
    log-likelihood under a BIGRAM model with add-alpha smoothing
    trained on the corpus itself — the next step up from the unigram
    :func:`perplexity_filter` (word-salad documents whose unigram
    distribution looks corpus-typical still score high here, because
    their transitions don't).

    p(w | prev) = (c(prev, w) + alpha) / (c(prev) + alpha * V)

    Bigram extraction is a shuffle-free array transform per document;
    the bigram/context count relations are corpus aggregates that
    broadcast into a map-side join (same dimension-sized contract as
    the unigram filter's vocabulary), and the per-doc average is the
    one corpus-keyed shuffle. Documents with fewer than two words have
    no transitions and drop out (deliberate: no score is honest there).
    avg_nll rounds to 6dp so the oracle's fold order can't flip the
    threshold comparison.
    """
    from datafusion_gpu_spark.context import ensure_parallelism
    from datafusion_gpu_spark.operators.dedup import normalize_text

    docs = ensure_parallelism(docs)
    d = docs.select(
        "doc_id", F.split(normalize_text(F.col(text_col)), " ").alias("s")
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(s, 1, size(s) - 1),"
                " (w, i) -> struct(w AS prev, s[i + 1] AS word))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.prev", "bg.word")
    counts = bg.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("n_bg"))
    ctx = counts.groupBy("prev").agg(F.sum("n_bg").alias("n_ctx"))
    vocab = d.select(F.explode("s").alias("word")).agg(
        F.count_distinct("word").alias("vocab")
    )
    logp = F.log(
        (F.col("n_bg") + F.lit(alpha))
        / (F.col("n_ctx") + F.lit(alpha) * F.col("vocab"))
    )
    avg_nll = F.round(F.avg(-logp), 6)
    return (
        bg.join(F.broadcast(counts), ["prev", "word"])
        .join(F.broadcast(ctx), "prev")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            avg_nll.alias("avg_nll"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "avg_nll",
            (F.col("avg_nll") > threshold).alias("low_quality"),
        )
    )


#: zero-width/format chars (U+200B..U+200D, U+FEFF) + C0 controls
#: (including NUL) except \t \n \r — the strip set unicode_clean removes AFTER NFC
#: normalization; mirrored char-for-char by the gate oracle's
#: chr()-built class.
_STRIP_CLASS = "[\u200b-\u200d\ufeff\x00-\x08\x0b\x0c\x0e-\x1f]"


def unicode_clean(
    docs: DataFrame, text_col: str = "text", out_col: str = "clean"
) -> DataFrame:
    """NFC-normalize a text column and strip zero-width/control
    characters — the first cleaning pass of every crawl pipeline
    (decomposed accents from different sources must dedup and tokenize
    identically; zero-width joiners and stray C0 controls poison
    shingles and token counts).

    NFC needs the Unicode character database, which no Spark SQL
    built-in exposes — this is one of the repo's legitimate Python
    boundaries: ONE Arrow-batched mapInPandas pass (pandas
    ``.str.normalize`` wraps unicodedata), zero shuffle, output
    partition-aligned with the input. The zero-width/control strip
    runs JVM-side (regexp_replace) after it. NULL text passes through
    as NULL.
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    )
    schema = f"{out_fields}, {out_col} string"

    def norm(batches):
        for pdf in batches:
            mask = pdf[text_col].notna()
            out = pd.Series([None] * len(pdf), dtype=object)
            out[mask] = pdf.loc[mask, text_col].astype(str).str.normalize("NFC")
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return docs.mapInPandas(norm, schema).withColumn(
        out_col, F.regexp_replace(F.col(out_col), _STRIP_CLASS, "")
    )


def kneser_ney_score(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    Chen-Goodman formulation) — the standard LM smoothing, one step up
    from :func:`bigram_lm_score`'s add-alpha:

        p(w | prev) = max(c(prev, w) - D, 0) / c(prev)
                      + (D * n1plus(prev, ·) / c(prev)) * p_cont(w)
        p_cont(w)   = n1plus(·, w) / |distinct bigram types|

    where n1plus(prev, ·) is the number of distinct continuations of
    ``prev`` and n1plus(·, w) the number of distinct left-contexts of
    ``w`` — the "how promiscuous is this word" continuation probability
    that makes KN robust where raw frequency misleads (the classic
    'San Francisco' example: 'francisco' is frequent but occurs after
    almost nothing, so its continuation weight is tiny).

    Same scale shape as the add-alpha sibling: shuffle-free bigram
    extraction, corpus-aggregate count relations that BROADCAST into
    map-side joins (bigram counts, context totals + continuation
    fan-outs in ONE relation, word left-context counts), one
    corpus-keyed shuffle for the per-document average. Seen bigrams
    only (every trained bigram has c >= 1, and document scoring walks
    the same corpus the model was trained on); sub-two-word documents
    drop out. avg_nll rounds to 6dp for oracle fold-order safety.
    """
    from datafusion_gpu_spark.context import ensure_parallelism
    from datafusion_gpu_spark.operators.dedup import normalize_text

    docs = ensure_parallelism(docs)
    d = docs.select(
        "doc_id", F.split(normalize_text(F.col(text_col)), " ").alias("s")
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(s, 1, size(s) - 1),"
                " (w, i) -> struct(w AS prev, s[i + 1] AS word))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.prev", "bg.word")
    counts = bg.groupBy("prev", "word").agg(F.count(F.lit(1)).alias("n_bg"))
    # context totals + distinct-continuation fan-out in one aggregation
    ctx = counts.groupBy("prev").agg(
        F.sum("n_bg").alias("n_ctx"),
        F.count(F.lit(1)).alias("n1p_fwd"),
    )
    # continuation counts: distinct left-contexts per word
    cont = counts.groupBy("word").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    n_types = counts.agg(F.count(F.lit(1)).alias("n_types"))
    d_lit = F.lit(discount)
    p = (
        F.greatest(F.col("n_bg") - d_lit, F.lit(0.0)) / F.col("n_ctx")
        + (d_lit * F.col("n1p_fwd") / F.col("n_ctx"))
        * (F.col("n1p_bwd") / F.col("n_types"))
    )
    return (
        bg.join(F.broadcast(counts), ["prev", "word"])
        .join(F.broadcast(ctx), "prev")
        .join(F.broadcast(cont), "word")
        .crossJoin(F.broadcast(n_types))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("avg_nll"),
        )
    )


#: syllable inventory for the synthetic wide-vocab corpus: 70 CV pairs,
#: the base of the rank -> word positional encoding below.
_SYLLABLES = [c + v for c in "bdfgklmnprstvz" for v in "aeiou"]


def synthetic_zipf_corpus(
    spark,
    vocab_size: int = 50_000,
    n_tokens: int = 2_000_000,
) -> DataFrame:
    """(doc_id, text) seeded synthetic corpus with a WIDE vocabulary and
    a Zipf(s=1) frequency profile — the fidelity harness the driver's
    sf documents corpus provably cannot be (31 distinct words, BPE
    saturates at 90 merges; tools/bpe_divergence_probe.py): with tens
    of thousands of distinct words sharing syllable structure, BPE
    training stays meaningful for thousands of merges.

    Construction is pure JVM arithmetic, deterministic, no data files:
    token ``id``'s word RANK is sampled log-uniformly (P(rank) ~ 1/rank,
    i.e. Zipf s=1) via rank = floor(V^u) with u a 40-bit xxhash64
    fraction of the id; the word STRING is the rank's base-70 positional
    encoding over the syllable inventory (no leading zeros), so distinct
    ranks give distinct words, frequent words come out shorter (as in
    natural language), and all words share subword structure for merges
    to exploit.
    """
    b = len(_SYLLABLES)
    if vocab_size > b * b * b:
        raise ValueError(f"vocab_size must be <= {b ** 3}")
    syl = F.array(*[F.lit(s) for s in _SYLLABLES])
    u = F.xxhash64("id").bitwiseAND(F.lit((1 << 40) - 1)) / F.lit(
        float(1 << 40)
    )
    # rank = floor(V^u) lands in [1, V-1] for u in [0,1) — matching the
    # docstring (rank 1 IS reachable); the least() guards the float-pow
    # edge where u ~ 1 could round V^u up to V, which would also push
    # d2 one past the syllable inventory at vocab_size == 70^3
    rank = F.least(
        F.lit(vocab_size - 1),
        F.pow(F.lit(float(vocab_size)), u).cast("long"),
    )
    d0 = rank % b
    d1 = F.floor(rank / b) % b
    d2 = F.floor(rank / (b * b))
    word = F.concat(
        F.when(d2 > 0, F.element_at(syl, (d2 + 1).cast("int"))).otherwise(F.lit("")),
        F.when((d2 > 0) | (d1 > 0), F.element_at(syl, (d1 + 1).cast("int"))).otherwise(F.lit("")),
        F.element_at(syl, (d0 + 1).cast("int")),
    )
    return spark.range(n_tokens).select(
        F.col("id").alias("doc_id"), word.alias("text")
    )


def hashing_vectorizer(
    docs: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc, bucket, tf) sparse bag-of-words features via the hashing
    trick (Weinberger et al. 2009) — the fixed-dimension, vocabulary-
    free featurizer classifiers/dedup-prefilters use at corpus scale
    (no vocabulary table to build, broadcast, or keep consistent across
    corpus versions; collisions are the accepted trade).

    Pure JVM: normalize -> split -> md5-derived 60-bit word hash
    (dedup.word_hash60, the portable hash every oracle can replay
    bit-for-bit) mod ``dim`` -> one (doc, bucket) hash aggregation.
    ONE shuffle, map-side combined; output rows are bounded by
    min(words-per-doc, dim) per document, so the featurized relation
    is never wider than the corpus itself.
    """
    from datafusion_gpu_spark.operators.dedup import word_hash60

    words = docs.select(
        id_col,
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w"),
    ).where(F.col("w") != "")
    return words.groupBy(
        F.col(id_col), (word_hash60(F.col("w")) % dim).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("tf"))


#: RAKE delimiter set — deterministic tiny stopword list (the corpus is
#: synthetic; the contract is the fixed formula, mirrored in the oracle).
RAKE_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "on",
    "for", "with", "as", "by", "at", "it",
)


def rake_keywords(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free word runs; word score = deg/freq where freq
    counts occurrences and deg sums the lengths of the phrases each
    occurrence sits in; a phrase scores the sum of its members' scores.
    The document-frequency-free cousin of tf-idf keywording — no corpus
    statistics beyond the phrases themselves, which is why RAKE runs as
    a pure per-batch pass in extraction pipelines.

    Relational spelling: posexplode -> stopword flag -> gaps-and-islands
    (running stopword count = island id) -> per-island phrase rebuild
    ordered by position (array_sort of (pos, word) structs — never a
    bare collect_list, whose order is undefined). Word scores are ONE
    double division of exact bigint (deg, freq), quantized to 1e-9
    bigints before the per-phrase sum, so the fold is exact integer
    arithmetic and the ranking is engine-independent.

    Returns the top ``top_k`` distinct phrases by (score DESC, phrase):
    (phrase, n_words, n_occurrences, score).
    """
    from pyspark.sql.window import Window as W

    words = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    )
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    flagged = words.withColumn(
        "is_stop", F.array_contains(stop_arr, F.col("word")).cast("int")
    )
    w_doc = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    content = flagged.withColumn(
        "island", F.sum("is_stop").over(w_doc)
    ).where(F.col("is_stop") == 0)
    phrases = content.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("n_words"),
    )
    stats = (
        content.join(phrases.select("doc_id", "island", "n_words"),
                     ["doc_id", "island"])
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("n_words").alias("deg"),
        )
        .select(
            "word",
            F.round(F.col("deg").cast("double") / F.col("freq") * 1e9, 0)
            .cast("long")
            .alias("sq"),
        )
    )
    phrase_scores = (
        content.join(F.broadcast(stats), "word")
        .groupBy("doc_id", "island")
        .agg(F.sum("sq").alias("score_q"))
        .join(phrases, ["doc_id", "island"])
        .groupBy("phrase")
        .agg(
            F.min("n_words").alias("n_words"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("score_q").alias("score_q"),
        )
    )
    return (
        phrase_scores.select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(F.col("score_q") / 1e9, 4).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(top_k)
    )


def mattr(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    window: int = 50,
) -> DataFrame:
    """Moving-average type-token ratio (Covington & McFall 2010) — the
    window-size-invariant lexical-diversity signal plain TTR can't give
    (TTR falls mechanically with document length, so it can't rank
    documents of different sizes; MATTR averages the TTR of every
    w-token sliding window, which is length-free).

    Distributed EXACT spelling without materializing windows: token
    occurrence p is the distinct representative ("last of its token")
    of exactly the windows ending at i in [p, min(next_occ - 1,
    p + w - 1)], so the per-window distinct count is an interval-
    stabbing sum — +1 at i = p, -1 at i = min(next_occ, p + w) — one
    prefix sum over the sparse delta positions, then run-length weights
    close the gaps: the window average is an exact integer fold
    sum(v_j * weight_j) / ((n - w + 1) * w) with one terminal division.
    Four keyed shuffles on the token relation (positions, same-token
    lead, delta groupBy, prefix), nothing data-sized in one partition.

    Emits one row per document with >= window tokens:
    (doc_id, n_tokens, vocab, ttr, mattr). Empty-string tokens from the
    normalizer are dropped BEFORE positions are assigned, so positions
    are contiguous.
    """
    from pyspark.sql import Window

    big = F.lit(1 << 62)
    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "rawpos", "token"
        ),
    ).where(F.col("token") != "")
    wp = Window.partitionBy("doc_id").orderBy("rawpos")
    wn = Window.partitionBy("doc_id")
    wt = Window.partitionBy("doc_id", "token").orderBy("rawpos")
    pos = (
        toks.withColumn("p", F.row_number().over(wp) - 1)
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("prev", F.lag("p").over(wt))
        .withColumn("nxt", F.lead("p").over(wt))
    ).where(F.col("n") >= window)
    ups = pos.select(
        "doc_id",
        "n",
        F.col("p").alias("i"),
        F.lit(1).alias("delta"),
        F.when(F.col("prev").isNull(), 1).otherwise(0).alias("is_first"),
    )
    downs = pos.select(
        "doc_id",
        "n",
        F.least(F.coalesce(F.col("nxt"), big), F.col("p") + window).alias("i"),
        F.lit(-1).alias("delta"),
        F.lit(0).alias("is_first"),
    ).where(F.col("i") <= F.col("n") - 1)
    wi = Window.partitionBy("doc_id").orderBy("i")
    run = (
        ups.unionByName(downs)
        .groupBy("doc_id", "n", "i")
        .agg(F.sum("delta").alias("d"), F.sum("is_first").alias("nf"))
        .withColumn(
            "v",
            F.sum("d").over(wi.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("next_i", F.lead("i").over(wi))
    )
    wlo = F.greatest(F.col("i"), F.lit(window - 1))
    whi = F.least(F.coalesce(F.col("next_i"), F.col("n")) - 1, F.col("n") - 1)
    weight = F.greatest(F.lit(0).cast("long"), whi - wlo + F.lit(1))
    per_doc = run.groupBy("doc_id", "n").agg(
        F.sum(F.col("v") * weight).alias("num"),
        F.sum("nf").alias("vocab"),
    )
    n_win = (F.col("n") - window + 1).cast("double")
    return per_doc.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "vocab",
        F.round(F.col("vocab") / F.col("n").cast("double"), 6).alias("ttr"),
        F.round(
            F.col("num") / (n_win * window), 6
        ).alias("mattr"),
    )

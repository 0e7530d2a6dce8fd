"""Text-operator behavior on planted inputs (the synthetic corpus holds
no real PII, so redaction is exercised here with seeded examples)."""

from __future__ import annotations

import pytest

from datafusion_gpu_spark.operators.text import redact_pii


@pytest.fixture(scope="module")
def pii_docs(spark):
    docs = [
        (0, "contact jane.doe+test@example.co.uk or call 555-867-5309 now"),
        (1, "server at 192.168.1.254 logged ssn 123-45-6789 twice"),
        (2, "no sensitive content in this perfectly ordinary sentence"),
        (3, "two mails: a@b.io and c.d@e-f.org; phone 800.555.1212"),
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_redact_pii_replaces_and_counts(pii_docs):
    rows = {r.doc_id: r for r in redact_pii(pii_docs).collect()}

    r0 = rows[0]
    assert r0.redacted == "contact <EMAIL> or call <PHONE> now"
    assert (r0.n_email, r0.n_phone, r0.n_ip, r0.n_ssn) == (1, 1, 0, 0)

    r1 = rows[1]
    assert r1.redacted == "server at <IP> logged ssn <ID> twice"
    assert (r1.n_ip, r1.n_ssn) == (1, 1)

    r2 = rows[2]
    assert r2.redacted == pii_docs.collect()[2].text  # untouched
    assert (r2.n_email, r2.n_ip, r2.n_ssn, r2.n_phone) == (0, 0, 0, 0)

    r3 = rows[3]
    assert r3.redacted == "two mails: <EMAIL> and <EMAIL>; phone <PHONE>"
    assert (r3.n_email, r3.n_phone) == (2, 1)


def test_redact_pii_counts_audit_original_not_redacted(spark):
    # an SSN-shaped string inside a phone-shaped context: counts come
    # from the original text even after earlier patterns rewrote it
    docs = spark.createDataFrame(
        [(0, "id 111-22-3333 then 444-555-6666")], "doc_id long, text string"
    )
    r = redact_pii(docs).collect()[0]
    assert r.redacted == "id <ID> then <PHONE>"
    assert (r.n_ssn, r.n_phone) == (1, 1)


def test_collocations_rank_planted_phrase_first(spark):
    from datafusion_gpu_spark.operators.text import collocations

    # "spark catalyst" always co-occurs (PMI max); filler words pair
    # with many different neighbors (PMI low)
    docs = [
        (i, f"w{i%7} the spark catalyst the w{(i*3)%7} engine runs the w{(i*5)%7}")
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = collocations(df, min_count=5, top_n=10).collect()
    assert rows, "no collocations found"
    # "spark catalyst" and "engine runs" are equally exclusive pairs
    # (same PMI, tie broken alphabetically) — both must lead the ranking
    top_two = {(r.left, r.right) for r in rows[:2]}
    assert top_two == {("engine", "runs"), ("spark", "catalyst")}
    by_pair = {(r.left, r.right): r for r in rows}
    assert by_pair[("spark", "catalyst")].n_pair == 40  # once per doc
    # ranking is by PMI descending
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_winnowing_guarantees_shared_fingerprint_on_long_overlap(spark):
    from datafusion_gpu_spark.operators.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = window+n-1
    docs = [
        (0, f"one two three {shared} four five six"),
        (1, f"seven eight nine ten {shared} eleven"),
        (2, "totally unrelated words with nothing in common here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnowing_fingerprints(df, n=3, window=4).collect()
    by_doc = {d: {r.fp for r in fps if r.doc_id == d} for d in (0, 1, 2)}
    # Schleimer guarantee: overlap of >= w+n-1 words shares >= 1 fingerprint
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_repetition_features_on_planted_docs(spark):
    from datafusion_gpu_spark.operators.text import repetition_features

    docs = spark.createDataFrame(
        [
            # pure repetition: one word 6 times
            (0, "spam spam spam spam spam spam"),
            # alternating 2-gram loop: "x y" dominates
            (1, "x y x y x y x y"),
            # all-distinct words: no repetition at all
            (2, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(docs).collect()}

    r0 = rows[0]
    assert r0.n_words == 6
    assert r0.dup_word_frac == pytest.approx(5 / 6, abs=1e-6)
    assert r0.top_word_frac == 1.0
    assert r0.repetitive  # "spam spam" covers >20% of chars

    r1 = rows[1]
    # "x y" occurs 4 times as a 2-gram: 4*3 chars / 15 norm chars
    assert r1.top_2gram_char_frac == pytest.approx(12 / 15, abs=1e-6)
    assert r1.repetitive

    r2 = rows[2]
    assert r2.dup_word_frac == 0.0
    assert r2.top_word_frac == pytest.approx(1 / 5, abs=1e-6)
    assert r2.dup_3gram_char_frac == 0.0
    assert not r2.repetitive


def test_contamination_flags_planted_benchmark_copy(spark):
    from datafusion_gpu_spark.operators.text import contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim copy of the benchmark doc -> every 3-gram overlaps
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            # partial overlap: shares one 5-word run = three 3-grams
            (1, "yesterday the quick brown fox slept"),
            # clean doc: zero shared 3-grams
            (2, "completely unrelated words about database engines here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in contamination(corpus, bench, n=3, threshold=4).collect()
    }
    assert rows[0].n_overlap == 8  # 10 words -> 8 distinct 3-grams
    assert rows[0].contaminated
    assert rows[1].n_overlap == 2  # "the quick brown", "quick brown fox"
    assert not rows[1].contaminated
    assert rows[2].n_overlap == 0
    assert not rows[2].contaminated


def test_perplexity_filter_flags_rare_word_docs(spark):
    from datafusion_gpu_spark.operators.text import perplexity_filter

    # 20 docs of common words + one gibberish doc of corpus-rare words
    rows = [(i, "the cat sat on the mat again today") for i in range(20)]
    rows.append((99, "zxqv wbnk prtl ghst zxqv"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r.doc_id: r for r in perplexity_filter(docs, threshold=4.0).collect()}
    common_nll = out[0].avg_nll
    rare_nll = out[99].avg_nll
    assert rare_nll > common_nll  # rare words cost more under the LM
    assert out[99].low_quality
    assert not out[0].low_quality
    # all common docs share the exact same score (same words)
    assert len({out[i].avg_nll for i in range(20)}) == 1


def test_bm25_ranks_term_frequency_and_rarity(spark):
    import math

    from datafusion_gpu_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "table table table join"),      # high tf for 'table'
            (1, "table scan filter merge"),     # one hit each of two terms
            (2, "sort window group order"),     # no query terms
            (3, "scan scan scan scan"),         # high tf for rarer 'scan'
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["table", "scan"], k=10).collect()
    ranked = [r.doc_id for r in out]
    assert 2 not in ranked  # zero-hit docs never appear
    assert set(ranked) == {0, 1, 3}

    # manual BM25 for doc 3 ('scan' tf=4, df=2, N=4, dl=4, avgdl=4):
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    tf_norm = 4 * 2.2 / (4 + 1.2 * (0.25 + 0.75 * 4 / 4))
    expected = round(idf * tf_norm, 6)
    got = {r.doc_id: r.bm25 for r in out}[3]
    assert got == pytest.approx(expected, abs=2e-6)


def test_bm25_duplicate_query_terms_not_double_counted(spark):
    # the r15 respelling expands the query bag into a literal struct
    # array; a repeated term must not produce a second struct (which
    # would double df and the per-doc score contribution)
    from datafusion_gpu_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(0, "table join table"), (1, "scan filter")],
        "doc_id long, text string",
    )
    once = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["table", "scan"], k=10).collect()}
    twice = {
        r.doc_id: r.bm25
        for r in bm25_topk(docs, ["table", "scan", "table"], k=10).collect()
    }
    assert once == twice


def test_chunk_documents_windows_and_tail(spark):
    from datafusion_gpu_spark.operators.text import chunk_documents

    # 10 words, chunk=4, stride=3 -> starts 0,3,6,9; last chunk is the
    # 1-word tail (slice clamps)
    words = [f"w{i}" for i in range(10)]
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.start, r.n_tokens) for r in out] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)
    ]
    # overlap: chunk 0 covers w0..w3, chunk 1 covers w3..w6
    import hashlib

    def h(ws):
        return hashlib.md5(" ".join(ws).encode()).hexdigest()

    assert out[0].chunk_md5 == h(words[0:4])
    assert out[1].chunk_md5 == h(words[3:7])
    assert out[3].chunk_md5 == h(words[9:10])


def test_chunk_documents_short_doc_single_chunk(spark):
    from datafusion_gpu_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "only three words")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=64, stride=48).collect()
    assert len(out) == 1
    assert (out[0].chunk_id, out[0].start, out[0].n_tokens) == (0, 0, 3)


def test_tfidf_ranks_distinctive_term_first(spark):
    from datafusion_gpu_spark.operators.retrieval import tfidf_top_terms

    # "zebra" appears twice but only in docs 0/1 (df=2, passes min_df);
    # filler words are in every doc (idf floor) -> zebra ranks first
    docs = spark.createDataFrame(
        [
            (0, "the quick fox zebra zebra jumps"),
            (1, "the quick fox zebra sits still"),
            (2, "the quick fox runs away fast"),
            (3, "the quick fox naps in shade"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=3, min_df=2)
    top = {r.doc_id: r.word for r in out.where("rank = 1").collect()}
    assert top[0] == "zebra"
    assert top[1] == "zebra"
    # hapax words (df=1) are cut by min_df: "runs" never appears
    assert out.where("word = 'runs'").count() == 0


def test_gopher_rules_flag_exactly_the_planted_violation(spark):
    from datafusion_gpu_spark.operators.text import gopher_rules

    good = "the a of and is " + " ".join(f"word{i}" for i in range(60))
    rows = [
        (0, good),                                        # passes all
        (1, "the a of and is short doc"),                 # too few words
        (2, ("the a of and is " + "!!! ??? *** " * 30 +
             " ".join(f"w{i}" for i in range(50)))),      # punct-heavy
        (3, " ".join(f"x{i}" for i in range(60))),        # no stopwords
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[0].keep
    assert not out[1].keep and not out[1].ok_word_count
    assert not out[2].keep and not out[2].ok_punct_ratio
    assert not out[3].keep and not out[3].ok_stopwords
    # each violator fails ONLY its planted rule (word-count rule also
    # sees doc 2's filler, so check the others explicitly)
    assert out[1].ok_stopwords and out[1].ok_punct_ratio
    assert out[3].ok_word_count and out[3].ok_punct_ratio


# -- C4 rule pack -------------------------------------------------------------


def test_c4_rules_line_and_doc_verdicts(spark):
    from datafusion_gpu_spark.operators.dedup import split_lines
    from datafusion_gpu_spark.operators.text import c4_rules

    docs = spark.createDataFrame(
        [
            # 2 good lines + 1 no-terminal-punct line; 2 sentences + 1 = 3
            (0, "This page has a proper first sentence.\n"
                "and this line has no terminal punctuation\n"
                "Another proper closing sentence arrives here! Yes."),
            # javascript line killed; only 1 sentence -> doc dropped
            (1, "Please enable javascript to view this page.\nshort."),
            # lorem ipsum page dropped outright despite fine lines
            (2, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
                "A second proper sentence lives right here today.\n"
                "And a third proper sentence closes the page."),
            # brace page dropped (code/markup)
            (3, "function f() { return 1; } is code not prose.\n"
                "Even with a second sentence written here.\n"
                "And one more full sentence for the count."),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in c4_rules(docs, split_lines(docs), min_line_words=5).collect()
    }
    assert out[0].keep and out[0].n_kept_lines == 2 and out[0].n_lines == 3
    assert out[0].n_sentences == 3 and out[0].kept_fraction == round(2 / 3, 6)
    assert not out[1].keep  # javascript line gone + only 2 sentences
    assert out[1].n_kept_lines == 0
    assert not out[2].keep and not out[2].ok_no_banned_substring
    assert not out[3].keep and not out[3].ok_no_banned_substring
    # line verdicts for 2 and 3 still counted (auditable drop reasons)
    assert out[2].n_kept_lines == 3 and out[2].ok_min_sentences


def test_c4_rules_min_line_words_threshold(spark):
    from datafusion_gpu_spark.operators.dedup import split_lines
    from datafusion_gpu_spark.operators.text import c4_rules

    docs = spark.createDataFrame(
        [(0, "One two three four.\nOne two three four five.")],
        "doc_id long, text string",
    )
    out = c4_rules(
        docs, split_lines(docs), min_line_words=5, min_sentences=2
    ).collect()[0]
    assert out.n_kept_lines == 1  # 4-word line fails the 5-word floor
    assert out.keep


def test_readability_closed_form(spark):
    from datafusion_gpu_spark.operators.text import readability

    docs = spark.createDataFrame(
        [(1, "the table scans fast. the sort spills!"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability(docs).collect()}
    # doc 1: 7 words, 2 sentences; syllables: the(1) ta-ble(2 -> 'a','e')
    # scans(1) fast(1) the(1) sort(1) spills(1) = 8 vowel groups
    r1 = out[1]
    assert r1["n_words"] == 7
    assert r1["n_sentences"] == 2
    assert r1["n_syllables"] == 8
    assert r1["words_per_sentence"] == 3.5
    # doc 2: no sentence punctuation floors at 1 sentence; 'b','c' have
    # no vowels, 'a' has one
    r2 = out[2]
    assert r2["n_sentences"] == 1
    assert r2["n_syllables"] == 1
    assert r2["n_words"] == 3


def test_unicode_clean_nfc_strip_and_null(spark):
    from datafusion_gpu_spark.operators.text import unicode_clean

    docs = spark.createDataFrame(
        [
            (1, "cafe\u0301"),  # 5 codepoints, decomposed            # decomposed -> NFC fuses to é
            (2, "a\u200bb\u200cc"),       # zero-widths stripped
            (3, "x\x01y\tz\nw"),          # C0 stripped, \t \n kept
            (6, "n\x00ul"),               # NUL is a C0 control too
            (4, None),                     # NULL passes through
            (5, "plain"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean for r in unicode_clean(docs).collect()}
    assert got[1] == "café" and len(got[1]) == 4
    assert got[2] == "abc"
    assert got[3] == "xy\tz\nw"
    assert got[4] is None
    assert got[5] == "plain"
    assert got[6] == "nul"


def test_kneser_ney_probabilities_sum_and_closed_form(spark):
    import math

    from datafusion_gpu_spark.operators.text import kneser_ney_score

    # corpus: "a b", "a b", "a c" — closed form with D=0.75:
    # bigram types: (a,b) n=2, (a,c) n=1; n_ctx(a)=3, n1p_fwd(a)=2
    # n1p_bwd(b)=1, n1p_bwd(c)=1, n_types=2
    # p(b|a) = (2-.75)/3 + (.75*2/3)*(1/2) = 0.41667 + 0.25 = 0.6667
    # p(c|a) = (1-.75)/3 + (.75*2/3)*(1/2) = 0.08333 + 0.25 = 0.3333
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.avg_nll)
           for r in kneser_ney_score(docs).collect()}
    p_b = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 2)
    p_c = (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 2)
    assert abs(p_b + p_c - 1.0) < 1e-12  # KN normalizes over seen mass
    assert got[1] == (1, round(-math.log(p_b), 6))
    assert got[2] == (1, round(-math.log(p_b), 6))
    assert got[3] == (1, round(-math.log(p_c), 6))
    # the rare-but-promiscuous word scores better than raw freq implies:
    # c's probability includes the full continuation weight
    assert got[3][1] > got[1][1]


def test_hashing_vectorizer_buckets_counts_and_bounds(spark):
    import hashlib

    from datafusion_gpu_spark.operators.text import hashing_vectorizer

    docs = spark.createDataFrame(
        [(1, "The  cat and the cat"), (2, "dog"), (3, None)],
        "doc_id long, text string",
    )
    out = hashing_vectorizer(docs, dim=16)
    rows = {(r.doc_id, r.bucket): r.tf for r in out.collect()}

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 16

    # "the cat and the cat": the=2, cat=2, and=1 (normalized lowercase)
    assert rows[(1, bucket("the"))] == 2
    assert rows[(1, bucket("cat"))] == 2
    assert rows[(1, bucket("and"))] == 1
    assert rows[(2, bucket("dog"))] == 1
    assert all(0 <= b < 16 for (_, b) in rows)
    assert not any(d == 3 for (d, _) in rows)  # NULL text -> no features


def test_rake_keywords_planted_phrases(spark):
    """Closed-form RAKE on a known doc: 'quick brown fox' appears twice
    as a 3-word stopword-free run, so each member word has freq=2,
    deg=6, score 3.0, and the phrase scores 9.0; the singleton 'speed'
    scores 1.0. A second doc shares 'brown fox' only, pushing brown/fox
    to freq=3 with one 2-word occurrence (deg 6+2=8)."""
    from datafusion_gpu_spark.operators.text import rake_keywords

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox and the quick brown fox of speed"),
            (1, "a brown fox"),
        ],
        "doc_id long, text string",
    )
    got = {r.phrase: r for r in rake_keywords(docs, top_k=10).collect()}
    # doc1 changes brown/fox stats: freq=3, deg=3+3+2=8 -> 8/3 each;
    # quick stays 6/2=3; so "quick brown fox" = 3 + 8/3 + 8/3 = 25/3
    assert got["quick brown fox"].n_words == 3
    assert got["quick brown fox"].n_occurrences == 2
    assert abs(got["quick brown fox"].score - 25 / 3) < 1e-4
    assert got["brown fox"].n_occurrences == 1
    assert abs(got["brown fox"].score - 16 / 3) < 1e-4
    assert got["speed"].score == 1.0 and got["speed"].n_words == 1
    # ranking: phrase scores descend, tie broken by phrase text
    ordered = sorted(got.values(), key=lambda r: (-r.score, r.phrase))
    assert [r.phrase for r in ordered][:2] == ["quick brown fox", "brown fox"]


def test_heaps_fit_matches_numpy(spark):
    """The (T, V) growth curve, log-spaced downsample, and regression
    equal a direct pandas/numpy replay on the sf0.001 corpus."""
    import numpy as np

    from datafusion_gpu_spark.queries.pipeline import (
        _HEAPS_QUANTUM,
        _text_heaps_fit,
    )
    from tests.conftest import SF_DIR

    [row] = _text_heaps_fit(spark, SF_DIR).collect()
    import duckdb

    con = duckdb.connect()
    df = con.execute(
        r"""SELECT doc_id,
                 unnest(string_split(regexp_replace(trim(lower(text)),
                        '\s+', ' ', 'g'), ' ')) AS word
          FROM '%s/documents.parquet'""" % SF_DIR
    ).df()
    per_doc = df.groupby("doc_id").size().sort_index()
    first_doc = df.groupby("word").doc_id.min()
    new_per_doc = first_doc.value_counts().reindex(per_doc.index, fill_value=0)
    t = per_doc.cumsum().to_numpy(dtype=float)
    v = new_per_doc.sort_index().cumsum().to_numpy(dtype=float)
    xq_all = np.round(np.log(t) * 1e6)
    yq_all = np.round(np.log(v) * 1e6)
    # log-spaced downsample: last (= max, both cumulatives are
    # monotone) point per FLOOR(xq / quantum) bucket
    buckets = np.floor(xq_all / _HEAPS_QUANTUM)
    xq = np.array([xq_all[buckets == b].max() for b in np.unique(buckets)])
    yq = np.array([yq_all[buckets == b].max() for b in np.unique(buckets)])
    k = len(xq)
    beta = (k * (xq * yq).sum() - xq.sum() * yq.sum()) / (
        k * (xq * xq).sum() - xq.sum() ** 2)
    assert row.n_points == k
    assert abs(row.heaps_beta - beta) < 1e-5
    # The synthetic corpus draws from a tiny fixed vocabulary, so V(n)
    # saturates almost immediately: beta ~ 0 and the log-log curve is
    # FLAT (r2 near 0) — exactly the Heaps-health failure this
    # diagnostic exists to flag on template/spam text. Natural text
    # sits near beta ~ 0.5 with r2 > 0.9.
    assert 0.0 <= row.heaps_beta < 0.2
    assert 0.0 <= row.r2 <= 1.0


def test_heaps_fit_planted_growth(spark):
    """A corpus whose vocabulary genuinely grows (each doc introduces
    fresh words plus reuses old ones) yields beta in (0,1) with a
    near-linear log-log curve — the healthy-corpus signature."""
    from datafusion_gpu_spark.queries.pipeline import _HEAPS_SINGLE_WINDOW

    docs = []
    for d in range(40):
        # ~half old words, half brand-new per doc
        old = " ".join(f"w{(d * 7 + i) % max(1, d * 5)}" for i in range(10))
        new = " ".join(f"n{d}_{i}" for i in range(10))
        docs.append((d, old + " " + new))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    try:
        [row] = spark.sql(_HEAPS_SINGLE_WINDOW).collect()
    finally:
        spark.catalog.dropTempView("documents")
    # 40 curve points, log-spaced downsample keeps one per ln-bucket
    assert 10 < row.n_points <= 40
    assert 0.3 < row.heaps_beta <= 1.2
    assert row.r2 > 0.9


def test_heaps_bucketed_parity_with_single_window(spark):
    """The shipped two-level bucketed-cumsum spelling returns the
    bit-identical row — exact point count AND terminal floats — as the
    single-window SQL contract on the same corpus (the MW/KS parity
    pattern applied to text_heaps_fit)."""
    from datafusion_gpu_spark.queries import load
    from datafusion_gpu_spark.queries.pipeline import (
        _HEAPS_SINGLE_WINDOW,
        _text_heaps_fit,
    )
    from tests.conftest import SF_DIR

    load(spark, SF_DIR)
    [want] = spark.sql(_HEAPS_SINGLE_WINDOW).collect()
    [got] = _text_heaps_fit(spark, SF_DIR).collect()
    assert got == want

"""Curation-operator invariants: the properties that make hash-based
splitting/sampling the right tool (determinism across runs, nested
samples, monotone split growth) — none of which random sampling has."""

from __future__ import annotations

import pytest

from datafusion_gpu_spark.operators.curation import hash_split, stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_split_is_deterministic_and_complete(corpus):
    a = {r.doc_id: r.split for r in hash_split(corpus).collect()}
    b = {r.doc_id: r.split for r in hash_split(corpus).collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.85 * n <= n_train <= 0.95 * n  # ~0.9 +- hash noise


def test_split_growth_is_monotone(corpus):
    # raising train's share must only ADD docs to train, never evict
    small = {r.doc_id for r in hash_split(
        corpus, weights={"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect() if r.split == "train"}
    big = {r.doc_id for r in hash_split(
        corpus, weights={"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect() if r.split == "train"}
    assert small <= big


def test_samples_are_nested_across_rates(corpus):
    ten = {r.doc_id for r in stratified_sample(corpus, {"en": 0.1, "de": 0.1}).collect()}
    thirty = {
        r.doc_id for r in stratified_sample(corpus, {"en": 0.3, "de": 0.3}).collect()
    }
    assert ten <= thirty
    assert len(ten) < len(thirty)


def test_stratified_rates_apply_per_stratum(corpus):
    kept = stratified_sample(corpus, {"en": 0.4, "de": 0.0}).collect()
    langs = {r.lang for r in kept}
    assert langs == {"en"}  # de sampled out entirely
    n_en = corpus.where("lang = 'en'").count()
    assert 0.3 * n_en <= len(kept) <= 0.5 * n_en


def test_bad_weights_rejected(corpus):
    with pytest.raises(ValueError):
        hash_split(corpus, weights={"train": 0.5, "val": 0.1})


def test_pack_sequences_matches_greedy_reference(spark):
    from collections import defaultdict

    from datafusion_gpu_spark.operators.curation import pack_sequences

    rows = [(i, (i * 37) % 300 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_sequences(df, budget=1000, shards=4).collect()
    assert len(out) == 500

    by_shard = defaultdict(list)
    for r in sorted(out, key=lambda r: r.doc_id):
        by_shard[r.shard].append(r)
    tokens = dict(rows)
    for shard_rows in by_shard.values():
        cum = 0
        for r in shard_rows:
            assert r.bin == cum // 1000  # greedy contiguous packing
            cum += tokens[r.doc_id]
        # bins are dense 0..max within a shard
        bins = [r.bin for r in shard_rows]
        assert bins == sorted(bins)


def test_mix_domains_equalizes_sources_under_budget(spark):
    from datafusion_gpu_spark.operators.curation import mix_domains

    # head source 10x the tail source
    rows = [(i, "head" if i < 2000 else "tail") for i in range(2200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    kept = mix_domains(docs, budget_frac=0.5).collect()
    by_source = {}
    for r in kept:
        by_source.setdefault(r.source, []).append(r)

    # budget = 1100 docs, 550 per source: head downsampled to ~550,
    # tail (only 200 docs) keeps everything at rate 1.0
    assert len(by_source["tail"]) == 200
    assert all(r.keep_rate == 1.0 for r in by_source["tail"])
    n_head = len(by_source["head"])
    assert 0.8 * 550 <= n_head <= 1.2 * 550  # hash noise around the rate

    # deterministic: same salt, same kept set
    again = {r.doc_id for r in mix_domains(docs, budget_frac=0.5).collect()}
    assert {r.doc_id for r in kept} == again


def test_deterministic_shuffle_is_a_dense_global_rank(spark):
    from datafusion_gpu_spark.operators.curation import deterministic_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(5000)], "doc_id long"
    )
    out = deterministic_shuffle(docs).collect()

    # dense bijection onto [0, N)
    positions = sorted(r.shuffle_pos for r in out)
    assert positions == list(range(5000))

    # deterministic across runs, and actually shuffled (not identity)
    again = {r.doc_id: r.shuffle_pos for r in deterministic_shuffle(docs).collect()}
    assert {r.doc_id: r.shuffle_pos for r in out} == again
    assert any(again[i] != i for i in range(100))

    # coarse_bits only changes the plan, never the order
    coarse = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, coarse_bits=4).collect()
    }
    assert coarse == again


def test_curate_corpus_stage_invariants(spark):
    # every survivor passed BOTH gates, exact duplicates keep only the
    # lowest doc_id, and bins never skip within a shard
    from datafusion_gpu_spark.operators.curation import curate_corpus
    from datafusion_gpu_spark.operators.text import lang_id, quality_features
    from pyspark.sql import functions as F

    rows = []
    for i in range(60):
        # quality-worthy english filler; every 10th is an exact dup of #0
        body = "the data of a table and the scan is " + " ".join(
            f"w{j}" for j in range(i % 7 + 20)
        )
        rows.append((i, body if i % 10 else rows[0][1] if rows else body))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate_corpus(docs, min_quality=0.1, budget=64, shards=4)
    got = {r.doc_id: r for r in out.collect()}

    feats = {r.doc_id: r for r in quality_features(docs).collect()}
    langs = {
        r.doc_id: r.lp
        for r in docs.select("doc_id", lang_id("text").alias("lp")).collect()
    }
    dup_ids = {r[0] for r in rows if r[1] == rows[0][1]}
    for did, r in got.items():
        assert feats[did].quality_score >= 0.1
        assert langs[did] == "en"
    # of the exact-duplicate family only the lowest id survives
    assert dup_ids & set(got) == {min(dup_ids)}
    # bins are contiguous from 0 within each shard
    by_shard = {}
    for r in got.values():
        by_shard.setdefault(r.shard, set()).add(r.bin)
    for bins in by_shard.values():
        assert bins == set(range(max(bins) + 1))


def test_curate_corpus_is_deterministic(spark):
    from datafusion_gpu_spark.operators.curation import curate_corpus

    rows = [(i, f"the a of and is word{i} " * 3) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, curate_corpus(docs).collect()))
    b = sorted(map(tuple, curate_corpus(docs).collect()))
    assert a == b and a


# -- DSIR importance resampling ----------------------------------------------


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import dsir_weights

    target_text = "alpha beta gamma alpha beta gamma alpha beta"
    docs = spark.createDataFrame(
        [
            # the target subcorpus defines the desired distribution
            (0, target_text, "tgt"), (1, "beta gamma alpha beta gamma", "tgt"),
            # raw docs: 2-3 match the target vocabulary, 4-5 do not
            (2, "alpha beta gamma beta alpha", "raw"),
            (3, "gamma gamma alpha beta alpha beta", "raw"),
            (4, "delta epsilon zeta delta epsilon", "raw"),
            (5, "zeta zeta epsilon delta zeta", "raw"),
        ],
        "doc_id long, text string, source string",
    )
    w = {
        r.doc_id: r.log_weight
        for r in dsir_weights(docs, F.col("source") == "tgt").collect()
    }
    assert min(w[2], w[3]) > max(w[4], w[5])


def test_dsir_resample_prefers_target_like_docs_and_is_deterministic(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import dsir_resample

    rows = [(0, "alpha beta gamma " * 20, "tgt")]
    rows += [(i, "alpha beta gamma alpha beta " * 10, "raw") for i in range(1, 6)]
    rows += [(i, "delta epsilon zeta delta " * 10, "raw") for i in range(6, 11)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pick = dsir_resample(docs, F.col("source") == "tgt", n=4)
    ids = [r.doc_id for r in pick.collect()]
    # heavy log-weight separation dominates the bounded Gumbel noise
    assert set(ids) <= {0, 1, 2, 3, 4, 5}
    assert ids == [r.doc_id for r in pick.collect()]  # replayable


# -- weighted sampling without replacement ------------------------------------


def test_weighted_sample_dominant_weights_always_selected(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import weighted_sample

    rows = [(i, 1_000_000.0) for i in range(10)]
    rows += [(i, 0.001) for i in range(10, 100)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(docs, F.col("w"), n=10)
    assert {r.doc_id for r in out.collect()} == set(range(10))


def test_weighted_sample_deterministic_and_salt_sensitive(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(50)], "doc_id long, w double"
    )
    a = [r.doc_id for r in weighted_sample(docs, F.col("w"), n=5).collect()]
    b = [r.doc_id for r in weighted_sample(docs, F.col("w"), n=5).collect()]
    c = [r.doc_id for r in weighted_sample(docs, F.col("w"), n=5, salt="other").collect()]
    assert a == b
    assert a != c  # a different salt is a different draw


def test_temperature_mix_upweights_tail_sources(spark):
    rows = [(i, "head") for i in range(900)] + [(900 + i, "tail") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    from datafusion_gpu_spark.operators.curation import temperature_mix

    out = temperature_mix(docs, alpha=0.3, budget_frac=0.5).toPandas()
    kept = out.groupby("source")["doc_id"].count()
    # natural share of tail is 10%; alpha=0.3 more than doubles its
    # share of the kept set (capped at keeping ALL of the tail)
    assert kept["tail"] == 100  # rate capped at 1.0 -> whole tail kept
    assert kept["tail"] / kept.sum() > 0.2
    # alpha=1 reproduces natural proportions (rates equal across sources)
    nat = temperature_mix(docs, alpha=1.0, budget_frac=0.5).toPandas()
    assert nat["keep_rate"].nunique() == 1


def test_weighted_sample_per_group_exact_k_and_determinism(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import weighted_sample_per_group

    docs = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(10 + i % 50)) for i in range(300)],
        "doc_id long, source string, w double",
    )
    out = weighted_sample_per_group(docs, F.col("w"), n=5, group="source")
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r.doc_id)
    assert set(per) == {"g0", "g1", "g2"}
    assert all(len(v) == 5 for v in per.values())
    # deterministic: a second run draws the identical sample
    again = {(r.source, r.doc_id) for r in
             weighted_sample_per_group(docs, F.col("w"), n=5, group="source").collect()}
    assert again == {(r.source, r.doc_id) for r in rows}


def test_weighted_sample_per_group_plan_uses_group_limit(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import weighted_sample_per_group

    docs = spark.createDataFrame(
        [(i, "g", float(i + 1)) for i in range(100)],
        "doc_id long, source string, w double",
    )
    plan = (
        weighted_sample_per_group(docs, F.col("w"), n=5, group="source")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank<=k filter must push into a per-partition group limit so a
    # hot group never fully sorts through one task's window buffer
    assert "WindowGroupLimit" in plan


def test_pack_bestfit_beats_sequential_and_respects_budget(spark):
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.operators.curation import (
        pack_sequences,
        pack_sequences_bestfit,
    )

    # [60, 60, 40, 40, 30, 30], budget 100: BFD reaches the
    # ceil(260/100) = 3-bin LOWER BOUND under a HARD budget
    # (60+40, 60+40, 30+30); the contiguous greedy also uses 3 bins but
    # only by OVERFLOWING (its bin semantics let the crossing doc spill:
    # key order gives fills 120/80/60) — BFD's win is budget-respecting
    # tightness, which is what fixed-context training actually needs
    rows = [(i, t) for i, t in enumerate([60, 60, 40, 40, 30, 30])]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    bfd = pack_sequences_bestfit(docs, budget=100, shards=1)
    out = bfd.collect()
    assert len(out) == 6 and len({r.doc_id for r in out}) == 6
    fills = {}
    for r in out:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    assert all(f <= 100 for f in fills.values())  # HARD budget holds
    assert len(fills) == 3  # the lower bound — optimal here
    seq = pack_sequences(docs, budget=100, shards=1).collect()
    seq_fills = {}
    for r in seq:
        seq_fills[r.bin] = seq_fills.get(r.bin, 0) + r.n_tokens
    assert max(seq_fills.values()) > 100  # the greedy overflows instead


def test_pack_bestfit_excludes_oversized_docs(spark):
    from datafusion_gpu_spark.operators.curation import pack_sequences_bestfit

    docs = spark.createDataFrame(
        [(1, 50), (2, 101), (3, 30)], "doc_id long, n_tokens long"
    )
    out = pack_sequences_bestfit(docs, budget=100, shards=1).collect()
    assert {r.doc_id for r in out} == {1, 3}


def test_pack_bestfit_string_keys(spark):
    # the output key column keeps the input's name and type — string
    # document ids must pack without an applyInPandas cast failure
    from datafusion_gpu_spark.operators.curation import pack_sequences_bestfit

    docs = spark.createDataFrame(
        [("a", 60), ("b", 60), ("c", 40), ("d", 40)],
        "url string, n_tokens long",
    )
    out = pack_sequences_bestfit(docs, budget=100, shards=1, key="url").collect()
    assert {r.url for r in out} == {"a", "b", "c", "d"}
    fills = {}
    for r in out:
        fills[r.bin_id] = fills.get(r.bin_id, 0) + r.n_tokens
    assert all(f <= 100 for f in fills.values())
    assert len(fills) == 2  # 60+40 twice


def test_apportion_exact_total_and_proportions(spark):
    from datafusion_gpu_spark.operators.curation import apportion_sample

    # 7/5/3 docs, total 10: quotas 4.67/3.33/2.0 -> floors 4/3/2, one
    # leftover slot goes to the largest remainder (a: .67)
    rows = (
        [(i, "a") for i in range(7)]
        + [(100 + i, "b") for i in range(5)]
        + [(200 + i, "c") for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = apportion_sample(docs, total=10).groupBy("source").count().collect()
    assert {r.source: r["count"] for r in got} == {"a": 5, "b": 3, "c": 2}


def test_apportion_is_deterministic_and_total_exact(spark):
    from datafusion_gpu_spark.operators.curation import apportion_sample

    rows = [(i, f"s{i % 7}") for i in range(83)]  # awkward ratios
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r.doc_id for r in apportion_sample(docs, total=31).collect())
    b = sorted(r.doc_id for r in apportion_sample(docs, total=31).collect())
    assert a == b and len(a) == 31


def test_apportion_oversubscribed_budget_falls_short_as_documented(spark):
    # total > corpus is unsatisfiable without replacement: sources run
    # out and the result falls short — the documented precondition
    from datafusion_gpu_spark.operators.curation import apportion_sample

    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    assert apportion_sample(docs, total=2).count() == 1


def test_token_budget_prefix_strict_prefix_semantics(spark):
    """The first doc that would overflow stops its group even when a
    later smaller doc would still fit; selection order is the salted
    md5 bucket order, replayed here in Python."""
    import hashlib

    from datafusion_gpu_spark.operators.curation import token_budget_prefix

    def bucket(doc_id: int) -> int:
        h = hashlib.md5(f"budget-v1:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % 1_000_000

    rows = [(i, "s", 40) for i in range(10)]  # 10 docs x 40 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = token_budget_prefix(df, budget_tokens=100)
    picked = sorted((r.doc_id, r.cum_tokens) for r in got.collect())
    order = sorted(range(10), key=lambda i: (bucket(i), i))
    expect = [(order[0], 40), (order[1], 80)]  # third 40 would hit 120 > 100
    assert picked == sorted(expect)

    # a big doc at the cut blocks everything after it, even small docs
    rows2 = [(1, "s", 10), (2, "s", 1000), (3, "s", 10)]
    df2 = spark.createDataFrame(rows2, "doc_id long, source string, n_tokens long")
    by_order = sorted([1, 2, 3], key=lambda i: (bucket(i), i))
    kept = sorted(r.doc_id for r in token_budget_prefix(df2, 25).collect())
    # walk the hash order in python with the same strict-prefix rule
    cum, expect2 = 0, []
    for i in by_order:
        cum += {1: 10, 2: 1000, 3: 10}[i]
        if cum > 25:
            break
        expect2.append(i)
    assert kept == sorted(expect2)


def test_salted_join_equals_plain_join(spark):
    """Hot-key fact side: the salted join must equal the plain inner
    join exactly, including duplicate dim keys (each fact row meets
    every matching dim row exactly once)."""
    from datafusion_gpu_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, i, i * 10) for i in range(50)] + [(2, 100, 7), (3, 101, 8)],
        "k long, rid long, v long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, tag string"
    )
    got = sorted(
        (r.k, r.rid, r.v, r.tag)
        for r in salted_join(fact, dim, "k", "rid", buckets=8).collect()
    )
    expect = sorted(
        (r.k, r.rid, r.v, r.tag) for r in fact.join(dim, "k").collect()
    )
    assert got == expect and len(got) == 101  # 50*2 + 1, key 3 unmatched


def test_k_anonymity_planted(spark):
    """Closed-form: 3 classes of sizes 12, 9, 1 under k=10 -> 2
    violating classes carrying 10 risky rows."""
    from datafusion_gpu_spark.queries.pipeline import _K_ANON

    rows = (
        [(1, "A")] * 12 + [(1, "B")] * 9 + [(2, "A")] * 1
    )
    df = spark.createDataFrame(rows, "c_nationkey int, c_mktsegment string")
    df.createOrReplaceTempView("customer")
    try:
        [r] = spark.sql(_K_ANON).collect()
    finally:
        spark.catalog.dropTempView("customer")
    assert r.n_classes == 3
    assert r.n_violating_classes == 2
    assert r.n_risky_rows == 10
    assert r.min_class_size == 1
    assert r.n_rows == 22


def test_source_overlap_planted(spark):
    """Two sources sharing exactly one 3-shingle out of known set
    sizes -> exact Jaccard; disjoint pair absent from the output."""
    from datafusion_gpu_spark.operators import dedup
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta", "s1"),  # shingles: ab g, b g d
            (1, "alpha beta gamma", "s2"),        # shingle:  a b g
            (2, "zeta eta theta iota", "s3"),     # disjoint
        ],
        "doc_id long, text string, source string",
    )
    sh = (
        docs.select(
            "source", F.explode(dedup.word_shingles(F.col("text"), n=3)).alias("sh")
        )
        .where(F.col("sh") != "")
        .distinct()
    )
    sizes = {r.source: r.n for r in sh.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"s1": 2, "s2": 1, "s3": 2}
    a = sh.select(F.col("source").alias("src_a"), "sh")
    b = sh.select(F.col("source").alias("src_b"), "sh")
    pairs = (
        a.join(b, "sh")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .collect()
    )
    assert len(pairs) == 1
    [p] = pairs
    assert (p.src_a, p.src_b, p.n_common) == ("s1", "s2", 1)
    # jaccard = 1 / (2 + 1 - 1) = 0.5


def test_l_diversity_planted(spark):
    """nation 1 has 3 distinct segments (passes l=3), nation 2 has one
    segment across 5 rows (violates, exposes 5 rows)."""
    from datafusion_gpu_spark.queries.pipeline import _L_DIVERSITY

    rows = [(1, "A"), (1, "B"), (1, "C"), (1, "A")] + [(2, "A")] * 5
    df = spark.createDataFrame(rows, "c_nationkey int, c_mktsegment string")
    df.createOrReplaceTempView("customer")
    try:
        [r] = spark.sql(_L_DIVERSITY).collect()
    finally:
        spark.catalog.dropTempView("customer")
    assert r.n_classes == 2
    assert r.n_violating_classes == 1
    assert r.n_exposed_rows == 5
    assert r.min_diversity == 1


def test_checksum_manifest_order_and_partition_invariant(spark):
    """The manifest is identical for a reshuffled, repartitioned copy of
    the same rows, and the sum_checksum moves when one row changes (the
    xor fold alone is blind to duplicate-pair edits)."""
    from datafusion_gpu_spark.queries.pipeline import _CHECKSUM_MANIFEST

    rows = [(i, i % 7, 100.0 + i, "P%d" % (i % 2)) for i in range(50)]
    schema = "o_orderkey long, o_custkey long, o_totalprice double, o_orderpriority string"

    def manifest(data, parts):
        df = spark.createDataFrame(data, schema).repartition(parts)
        df.createOrReplaceTempView("orders")
        try:
            return {
                r.part_key: (r.n_rows, r.xor_checksum, r.sum_checksum)
                for r in spark.sql(_CHECKSUM_MANIFEST).collect()
            }
        finally:
            spark.catalog.dropTempView("orders")

    base = manifest(rows, 4)
    shuffled = manifest(list(reversed(rows)), 13)
    assert base == shuffled
    mutated = manifest(rows[:-1] + [(49, 0, 999.0, "P1")], 4)
    assert mutated["P1"] != base["P1"]
    assert mutated["P0"] == base["P0"]


def test_t_closeness_planted(spark):
    """Closed form: global split 50/50 over two segments; nation 1
    mirrors it (tv = 0), nation 2 is all-A (tv = 0.5 > 0.25 flag)."""
    from datafusion_gpu_spark.queries.pipeline import _T_CLOSENESS

    rows = [(1, "A")] * 5 + [(1, "B")] * 5 + [(2, "A")] * 10 + [(3, "B")] * 10
    # global: A=15/30, B=15/30. n1: A .5 B .5 -> tv 0. n2: A 1,B 0 ->
    # tv = .5*(|1-.5|+|0-.5|) = .5. n3 mirror -> .5
    df = spark.createDataFrame(rows, "c_nationkey int, c_mktsegment string")
    df.createOrReplaceTempView("customer")
    try:
        got = {r.nation: r for r in spark.sql(_T_CLOSENESS).collect()}
    finally:
        spark.catalog.dropTempView("customer")
    assert got[1].tv_distance == 0.0 and not got[1].violates_t025
    assert got[2].tv_distance == 0.5 and got[2].violates_t025
    assert got[3].tv_distance == 0.5 and got[3].violates_t025
    assert got[2].class_size == 10


def test_capture_recapture_chapman(spark):
    """Chapman's estimator on deterministic hash captures: replay the
    salted-md5 marks in Python, verify the exact counts and the
    estimator arithmetic, and confirm the self-validating within-2-SE
    contract holds on planted corpora of two sizes (the independence of
    the two salts is what makes the overlap binomial)."""
    import hashlib
    import math

    from datafusion_gpu_spark.queries.pipeline_eval import _CHAPMAN_SPARK

    def bucket(salt, doc_id):
        h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:15]
        return int(h, 16) % 1_000_000

    for n_docs in (2000, 7000):
        spark.range(n_docs).selectExpr(
            "id AS doc_id", "'x' AS text", "'en' AS lang", "'web' AS source"
        ).createOrReplaceTempView("documents")
        got = spark.sql(_CHAPMAN_SPARK).collect()[0]
        n1 = sum(1 for d in range(n_docs) if bucket("crawl-a", d) < 400000)
        n2 = sum(1 for d in range(n_docs) if bucket("crawl-b", d) < 400000)
        m = sum(
            1
            for d in range(n_docs)
            if bucket("crawl-a", d) < 400000 and bucket("crawl-b", d) < 400000
        )
        assert (got.n1, got.n2, got.m_overlap, got.n_true) == (
            n1, n2, m, n_docs
        )
        n_hat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
        se = math.sqrt(
            (n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
            / ((m + 1.0) ** 2 * (m + 2.0))
        )
        assert got.n_hat == round(n_hat, 6)
        assert got.se_hat == round(se, 6)
        assert got.within_2se == (abs(n_hat - n_docs) <= 2.0 * se)
        assert got.within_2se is True  # the estimator really works

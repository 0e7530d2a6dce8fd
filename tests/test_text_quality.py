

def test_mattr_matches_brute_force_and_closed_forms(spark):
    """MATTR via interval stabbing == brute-force sliding-window set
    counting on random small docs (exact, including ttr/vocab), a
    constant-token doc gives mattr == 1/w exactly, an all-distinct doc
    gives mattr == 1.0, and docs shorter than the window are omitted."""
    import random

    from datafusion_gpu_spark.operators.text import mattr

    random.seed(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [(d, " ".join(random.choice(vocab) for _ in range(random.randint(3, 40))))
            for d in range(6)]
    docs.append((100, " ".join(["same"] * 25)))
    docs.append((101, " ".join(f"w{i}" for i in range(25))))
    w = 10
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in mattr(df, window=w).collect()}
    for d, text in docs:
        toks = text.lower().split()
        n = len(toks)
        if n < w:
            assert d not in got
            continue
        wins = [len(set(toks[i : i + w])) / w for i in range(n - w + 1)]
        r = got[d]
        assert r.n_tokens == n and r.vocab == len(set(toks))
        assert r.ttr == round(len(set(toks)) / n, 6)
        assert r.mattr == round(sum(wins) / len(wins), 6), d
    assert got[100].mattr == round(1 / w, 6)  # constant doc
    assert got[101].mattr == 1.0  # all-distinct doc

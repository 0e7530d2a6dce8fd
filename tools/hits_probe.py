"""Scale probe: graph.hits exactness at millions of edges.

The operator's scale claim is that the exact integer path-count
formulation makes HITS a chain of 2k equality-keyed join+aggregate
passes whose raw scores are EXACT bigint walk counts — no per-round
normalization state to drift. On a complete bipartite graph K_{a,b}
the counts have closed forms (h0 = 1 per source):

    a1(s) = a          h1(c) = a*b
    a2(s) = a^2 * b    h2(c) = a^2 * b^2

so the probe plants a DISCONNECTED UNION of two complete bipartite
blocks with different shapes (edges generated distributed via
spark.range arithmetic — no driver-side data, no cross join) and
asserts every authority/hub raw score equals its block's closed form
EXACTLY, and that the terminal normalization exposes the cross-block
ratio to the last rounded digit.

Usage: python tools/hits_probe.py [a1 b1 a2 b2]
  defaults 2000 1000 500 800 -> 2.0M + 0.4M = 2.4M edges.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    a1, b1, a2, b2 = (
        [int(x) for x in sys.argv[1:5]] if len(sys.argv) >= 5
        else (2000, 1000, 500, 800)
    )
    from pyspark.sql import functions as F

    from datafusion_gpu_spark.context import get_spark
    from datafusion_gpu_spark.operators import graph

    spark = get_spark("hits-probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    # block 1: src c0..c{a1-1} x dst s0..s{b1-1}; block 2 offset ids
    e1 = spark.range(a1 * b1).select(
        F.concat(F.lit("c"), (F.col("id") / b1).cast("long")).alias("src"),
        F.concat(F.lit("s"), (F.col("id") % b1)).alias("dst"),
    )
    e2 = spark.range(a2 * b2).select(
        F.concat(F.lit("C"), (F.col("id") / b2).cast("long")).alias("src"),
        F.concat(F.lit("S"), (F.col("id") % b2)).alias("dst"),
    )
    out = graph.hits(e1.unionAll(e2), iters=2).collect()
    dt = time.time() - t0

    want_auth = {"s": a1 * a1 * b1, "S": a2 * a2 * b2}
    want_hub = {"c": a1 * a1 * b1 * b1, "C": a2 * a2 * b2 * b2}
    mx_auth = max(want_auth.values())
    mx_hub = max(want_hub.values())
    n_checked = 0
    for r in out:
        block = r.node[0]
        want = want_auth[block] if r.side == "authority" else want_hub[block]
        assert r.raw == want, (r.side, r.node, r.raw, want)
        mx = mx_auth if r.side == "authority" else mx_hub
        assert abs(r.score - round(want / mx, 8)) < 1e-12, (r.node, r.score)
        n_checked += 1
    assert n_checked == a1 + b1 + a2 + b2
    print(
        f"hits_probe: {a1 * b1 + a2 * b2} edges, {n_checked} nodes — every "
        f"raw walk count EXACT vs closed form (K_a,b identities), "
        f"normalization exact to 8dp, in {dt:.1f} s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

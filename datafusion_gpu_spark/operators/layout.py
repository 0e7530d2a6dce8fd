"""Physical-layout operators: Z-order (Morton) clustering and layout
quality measurement.

Multi-dimensional clustering is the lakehouse answer to "my scans filter
on BOTH x and y": a sort on (x, y) clusters x only, while ordering rows
along the Z-curve interleaves the bits of both keys, so rows close in
(x, y) land in the same parquet row groups — and row-group min/max
statistics then let a scan skip most of the file for a 2-D box
predicate. Pure codegen bit arithmetic (shift/and/or), exactly
replayable by the SQL oracle; the locality WIN is measured (not
asserted) by counting row groups whose stats overlap a query box under
Z-order vs natural layout — see tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two nonnegative int
    columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i."""
    # disjoint bit positions, so plain addition == bitwise OR (and stays
    # an arithmetic expression — Column `|` is logical OR in PySpark)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftrightunsigned(a.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftrightunsigned(b.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    col_a: str,
    col_b: str,
    out_dir: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered along the Z-curve of (col_a, col_b):
    range-partition on the z key (contiguous curve segments per file),
    sort within partitions, drop the key. At 100 TB this is the layout
    pass run after compaction; rewrite cost is one range exchange."""
    keyed = df.withColumn("__z__", z_value(F.col(col_a), F.col(col_b), bits))
    (
        keyed.repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def row_groups_overlapping(
    path_glob: str, col_a: str, lo_a: int, hi_a: int, col_b: str, lo_b: int, hi_b: int
) -> tuple[int, int]:
    """(overlapping, total) row groups whose [min, max] statistics
    intersect the 2-D box — the skip-rate a stats-pruning scan achieves
    on this layout. Reads footers only."""
    import glob as _glob

    import pyarrow.parquet as pq

    overlapping = total = 0
    for path in sorted(_glob.glob(path_glob)):
        pf = pq.ParquetFile(path)
        idx = {c: i for i, c in enumerate(pf.schema_arrow.names)}
        for g in range(pf.metadata.num_row_groups):
            rg = pf.metadata.row_group(g)
            total += 1
            sa = rg.column(idx[col_a]).statistics
            sb = rg.column(idx[col_b]).statistics
            if sa is None or sb is None:
                overlapping += 1
                continue
            if sa.max >= lo_a and sa.min <= hi_a and sb.max >= lo_b and sb.min <= hi_b:
                overlapping += 1
    return overlapping, total


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    reject_duplicate_keys: bool = True,
) -> DataFrame:
    """MERGE INTO semantics over immutable files (the Delta/Iceberg
    ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` analogue, computed
    as a dataframe): every key present in ``changes`` takes the changes
    row (update-or-insert); every other base row passes through. A
    changes row with a NULL key matches nothing (SQL equality) and is
    inserted as-is — the same outcome a MERGE's NOT-MATCHED branch
    produces.

    Implementation is one full-outer join on the key, picking the
    changes side wherever a changes row is present (marker column, NOT
    per-column COALESCE — a NULL in a matched changes row must win, and
    a NULL-keyed insert must keep its payload). One hash shuffle per
    input, no driver involvement. At 100 TB the same plan co-locates
    for free when both sides are bucketed by the key (the compaction
    layout this module's small-files operator produces), and AQE's skew
    split handles a hot key. Schemas must match; the result has exactly
    the base schema.

    ``reject_duplicate_keys`` (default True, matching Delta/Iceberg's
    "multiple source rows matched" error): duplicate non-NULL keys in
    ``changes`` fail AT EXECUTION via a lazily-planned window count —
    no extra eager job, and the window's key shuffle is the same
    exchange the join needs anyway. Pass False only when the caller has
    already deduplicated (saves the window).
    """
    if base.columns != changes.columns:
        raise ValueError(
            f"merge_upsert: schema mismatch base={base.columns} "
            f"changes={changes.columns}"
        )
    if reject_duplicate_keys:
        from pyspark.sql import Window

        n_dup = F.count(F.lit(1)).over(Window.partitionBy(key))
        ok = F.col(key).isNull() | (n_dup <= 1)
        # the assertion rides INSIDE the kept key column (assert_true
        # yields NULL or raises) so column pruning cannot optimize the
        # check away
        guarded_key = F.when(
            F.assert_true(
                ok,
                f"merge_upsert: multiple changes rows matched one {key}; "
                "deduplicate the changes batch or pass "
                "reject_duplicate_keys=False",
            ).isNull(),
            F.col(key),
        )
        changes = changes.withColumn(key, guarded_key)
    b = base.alias("b")
    c = changes.withColumn("__from_changes__", F.lit(True)).alias("c")
    present = F.col("c.__from_changes__").isNotNull()
    picked = [
        F.when(present, F.col(f"c.{col}")).otherwise(F.col(f"b.{col}")).alias(col)
        if col != key
        else F.when(present, F.col(f"c.{key}"))
        .otherwise(F.col(f"b.{key}"))
        .alias(key)
        for col in base.columns
    ]
    return b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer").select(
        *picked
    )


def time_travel(
    base: DataFrame,
    log: DataFrame,
    key: str,
    version: int,
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Read the table AS OF ``version``: replay an ordered change log
    (the rows :func:`snapshot_diff` emits, stamped with a monotonically
    increasing ``version_col``) on top of the ``base`` snapshot — the
    Delta/Iceberg ``VERSION AS OF`` analogue computed as a dataframe.

    NOT an iterative per-version MERGE: replay is last-writer-wins per
    key, so the whole log up to ``version`` compacts in ONE hash
    aggregation (``max_by`` of the change payload over the version
    stamp) and applies with ONE full-outer join against the base — two
    shuffles total regardless of how many versions are replayed, the
    log-structured-merge shape that survives a 100x-longer history.
    A compacted ``delete`` drops the key, ``insert``/``update`` takes
    the change payload, untouched base rows pass through. Log keys are
    assumed non-null (snapshot_diff only emits NULL-keyed rows for
    NULL-keyed snapshots, which have no stable replay identity —
    documented contract, enforced nowhere). Two log rows for the same
    key with the SAME version stamp tie-break deterministically: the
    non-delete op wins (a delete+insert landing in one version reads
    as an upsert), via a (version, op!='delete') composite max_by key —
    snapshot_diff itself emits at most one op per (key, version), so
    the tie-break only matters for hand-built logs.

    ``log`` must carry the full base schema plus (version_col, op_col);
    delete rows may leave the non-key payload NULL.
    """
    missing = {key, version_col, op_col} - set(log.columns)
    if missing:
        raise ValueError(f"time_travel: log lacks columns {sorted(missing)}")
    vals = [c for c in base.columns if c != key]
    last = (
        log.where(F.col(version_col) <= version)
        .groupBy(key)
        .agg(
            F.max_by(
                F.struct(F.col(op_col).alias("op"), *[F.col(c) for c in vals]),
                # struct ordering is lexicographic: version first, then
                # the delete/non-delete priority breaks same-version ties
                F.struct(
                    F.col(version_col).alias("v"),
                    (F.col(op_col) != "delete").cast("int").alias("pri"),
                ),
            ).alias("__ch__")
        )
        .alias("c")
    )
    b = base.alias("b")
    j = b.join(last, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    changed = F.col("__ch__").isNotNull()
    picked = [
        F.when(changed, F.col(f"__ch__.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        if c != key
        else F.coalesce(F.col(f"c.{key}"), F.col(f"b.{key}")).alias(key)
        for c in base.columns
    ]
    return j.where(~changed | (F.col("__ch__.op") != "delete")).select(*picked)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Change-data emission from two immutable table snapshots — the
    inverse of :func:`merge_upsert`: one row per changed key with
    ``op`` in (insert, delete, update), carrying the NEW values for
    insert/update and the OLD values for delete (so a downstream MERGE
    of this feed onto ``old`` reproduces ``new`` exactly).

    One full-outer join on the key (same co-location/AQE story as
    merge_upsert); change detection is a null-safe struct comparison of
    every non-key column, so a legitimate NULL in either snapshot is a
    difference, not a match. Unchanged rows drop out. Keys are assumed
    non-null where possible; a NULL-keyed row never joins (SQL equality
    semantics), so an old-side NULL-keyed row surfaces as a delete and
    a new-side one as an insert — side-presence markers, not key
    nullness, drive the classification, so this degradation is exact.
    """
    if old.columns != new.columns:
        raise ValueError(
            f"snapshot_diff: schema mismatch old={old.columns} "
            f"new={new.columns}"
        )
    vals = [c for c in old.columns if c != key]
    # side-presence markers, NOT key nullness: a legitimately NULL-keyed
    # row would otherwise look like "no match on my own side" and
    # misclassify (a NULL-keyed old row must be a delete, not an insert)
    o = old.withColumn("__o__", F.lit(True)).alias("o")
    n = new.withColumn("__n__", F.lit(True)).alias("n")
    j = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    o_s = F.struct(*[F.col(f"o.{c}") for c in vals])
    n_s = F.struct(*[F.col(f"n.{c}") for c in vals])
    op = (
        F.when(F.col("__o__").isNull(), F.lit("insert"))
        .when(F.col("__n__").isNull(), F.lit("delete"))
        .when(~o_s.eqNullSafe(n_s), F.lit("update"))
    )
    picked = [
        F.when(F.col("__n__").isNotNull(), F.col(f"n.{c}"))
        .otherwise(F.col(f"o.{c}"))
        .alias(c)
        for c in vals
    ]
    return (
        j.select(
            op.alias("op"),
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            *picked,
        )
        .where(F.col("op").isNotNull())
    )


def incremental_agg(
    view: DataFrame,
    deltas: DataFrame,
    key: str,
    val_col: str,
    sign_col: str = "sign",
    cnt_col: str = "cnt",
    total_col: str = "total",
) -> DataFrame:
    """Incremental maintenance of a per-key (count, sum) aggregate view
    from a changelog — the Z-set / DBSP formulation (every linear
    aggregate maintains by addition): ``deltas`` carries one row per
    inserted (+1) or deleted (-1) base fact in ``sign_col``, an update
    being a delete+insert pair. The new view is

        new(k) = old(k) (+) groupagg(deltas)(k),   drop keys at cnt 0

    computed as ONE delta-sized hash aggregation plus ONE full-outer
    join onto the old view — maintenance cost scales with |delta|, not
    with the base-fact history, which at 100 TB is the difference
    between touching gigabytes per batch and re-scanning the lake
    (the full-outer join is the one shape Spark can't broadcast; both
    sides hash-partition on the view key, and the view side's shuffle
    is avoidable entirely when the view is stored bucketed on ``key``).

    Correctness contract (tested): applying the delta of a fact batch
    equals recomputing the view over base+batch; a key whose count
    reaches exactly 0 disappears (never a 0-count tombstone row); a
    negative count means the changelog deleted facts that were never
    inserted — left to surface downstream rather than masked.
    """
    d = (
        deltas.groupBy(F.col(key))
        .agg(
            F.sum(F.col(sign_col)).alias("_dcnt"),
            F.sum(F.col(val_col) * F.col(sign_col)).alias("_dtotal"),
        )
        .alias("d")
    )
    v = view.alias("v")
    j = v.join(d, F.col(f"v.{key}") == F.col(f"d.{key}"), "full_outer")
    cnt = F.coalesce(F.col(f"v.{cnt_col}"), F.lit(0)) + F.coalesce(
        F.col("_dcnt"), F.lit(0)
    )
    total = F.coalesce(F.col(f"v.{total_col}"), F.lit(0)) + F.coalesce(
        F.col("_dtotal"), F.lit(0)
    )
    return j.select(
        F.coalesce(F.col(f"v.{key}"), F.col(f"d.{key}")).alias(key),
        cnt.alias(cnt_col),
        total.alias(total_col),
    ).where(F.col(cnt_col) != 0)

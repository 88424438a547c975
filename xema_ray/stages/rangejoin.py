"""Range (interval) join — each fact row matches the interval of the same
key containing its timestamp (``start <= ts <= end``).

Ray Data has no native range join; this is the documented composition
(SURVEY §2 custom-operator rule): both sides are tagged, column-aligned
and unioned, then ONE ``groupby(key)`` co-partitions them and each group
resolves matches with a vectorized ``searchsorted`` over the sorted
interval starts — O((n_f + n_iv)·log n_iv) per key, no driver state.

Partitioning assumption: one key's facts + intervals fit one group
(same as the as-of join / session windows); for a pathological hot key
pass ``time_bucket_us`` — facts route to one (key, time-bucket) group
each, intervals replicate into every bucket they overlap, results exact.
Intervals of a key must be non-overlapping (true for session/tumbling
windows — for overlapping intervals the LAST containing interval by
start wins).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pa_schema(ds) -> pa.Schema:
    """Arrow schema for a Dataset whose blocks may be Arrow OR pandas
    (map_groups emits PandasBlockSchema with numpy dtypes)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return pa.schema([(f.name, f.type) for f in base])
    fields = []
    for name, dt in zip(base.names, base.types):
        try:
            t = pa.from_numpy_dtype(dt)
        except (pa.lib.ArrowNotImplementedError, TypeError):
            t = pa.string()
        fields.append((name, t))
    return pa.schema(fields)


def _aligned(ds, schema: pa.Schema, side: str):
    """Project a dataset onto the combined schema (missing columns null)
    and tag its side."""
    def fn(t: pa.Table) -> pa.Table:
        arrays = []
        for f in schema:
            if f.name in t.column_names:
                col = t[f.name]
                if col.type != f.type:
                    import pyarrow.compute as pc

                    col = pc.cast(col, f.type)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(t.num_rows, type=f.type))
        out = pa.table(dict(zip(schema.names, arrays)))
        return out.append_column("_side", pa.array([side] * t.num_rows))

    return ds.map_batches(fn, batch_format="pyarrow")


def range_join(fact_ds, intervals_ds, key: str, ts_col: str,
               start_col: str, end_col: str, interval_cols=None,
               time_bucket_us: int = None):
    """Inner range join: fact rows ⋈ containing interval (per key).

    Returns the fact columns plus ``interval_cols`` (default: every
    interval column except the key) for matched rows; unmatched fact rows
    drop (inner semantics).

    ``time_bucket_us`` (r3, VERDICT item 7 hot-key hardening): when set,
    the co-partitioning key becomes ``(key, floor(time/bucket))`` — facts
    land in exactly ONE time bucket, intervals are REPLICATED into every
    bucket they overlap (boundary replication), so a pathological key's
    rows spread over many groups while each fact still meets its
    containing interval.  Exact for any bucket width: no dedup needed
    because each fact exists once.
    """
    fact_schema = _pa_schema(fact_ds)
    iv_schema_all = _pa_schema(intervals_ds)
    if interval_cols is None:
        interval_cols = [f.name for f in iv_schema_all if f.name != key]
    fact_cols = list(fact_schema.names)

    combined_fields = list(fact_schema)
    have = set(fact_schema.names)
    for f in iv_schema_all:
        if f.name not in have:
            combined_fields.append(f)
            have.add(f.name)
    combined = pa.schema(combined_fields)

    # inner-join semantics: null keys match nothing — drop them BEFORE the
    # groupby (a null key would otherwise crash Ray's sort partitioner)
    def _drop_null_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t[key]))

    fact_side = _aligned(
        fact_ds.map_batches(_drop_null_key, batch_format="pyarrow"),
        combined, "f")
    iv_side = _aligned(
        intervals_ds.map_batches(_drop_null_key, batch_format="pyarrow"),
        combined, "i")

    group_key = key
    if time_bucket_us is not None:
        import pyarrow.compute as pc

        w = int(time_bucket_us)

        def fact_bucket(t: pa.Table) -> pa.Table:
            # numpy floor division, NOT pc.divide (which truncates toward
            # zero): a pre-epoch negative timestamp must land in the same
            # bucket its containing interval replicates into (code-review
            # r3, confirmed divergence)
            ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
            return t.append_column(
                "_tb", pa.array(ts // w, type=pa.int64()))

        def iv_explode(t: pa.Table) -> pa.Table:
            s = pc.cast(t[start_col], pa.int64()).to_numpy(zero_copy_only=False)
            e = pc.cast(t[end_col], pa.int64()).to_numpy(zero_copy_only=False)
            b0 = s // w
            b1 = np.maximum(e // w, b0)
            counts = (b1 - b0 + 1).astype(np.int64)
            rows = np.repeat(np.arange(t.num_rows), counts)
            tb = np.concatenate(
                [np.arange(a, b + 1, dtype=np.int64)
                 for a, b in zip(b0, b1)]) if t.num_rows else \
                np.empty(0, dtype=np.int64)
            out = t.take(pa.array(rows, type=pa.int64()))
            return out.append_column("_tb", pa.array(tb, type=pa.int64()))

        fact_side = fact_side.map_batches(fact_bucket, batch_format="pyarrow")
        iv_side = iv_side.map_batches(iv_explode, batch_format="pyarrow")
        group_key = [key, "_tb"]

    both = fact_side.union(iv_side)

    out_cols = fact_cols + [c for c in interval_cols if c not in fact_cols]
    out_schema = pa.schema([combined.field(c) for c in out_cols])

    def match(g: pa.Table) -> pa.Table:
        # ARROW group blocks: null-padded int64 columns stay int64 (a
        # pandas round-trip would floatify them and corrupt values >= 2^53
        # — ns-epoch timestamps and large ids)
        import pyarrow.compute as pc

        empty = out_schema.empty_table()
        side = g["_side"]
        iv = g.filter(pc.equal(side, "i"))
        fv = g.filter(pc.equal(side, "f"))
        if iv.num_rows == 0 or fv.num_rows == 0:
            return empty
        order = pc.sort_indices(iv[start_col])
        iv = iv.take(order)
        starts = pc.cast(iv[start_col], pa.int64()).to_numpy(zero_copy_only=False)
        ends = pc.cast(iv[end_col], pa.int64()).to_numpy(zero_copy_only=False)
        ts = pc.cast(fv[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(starts, ts, side="right") - 1
        safe = np.clip(idx, 0, iv.num_rows - 1)
        ok = (idx >= 0) & (ts <= ends[safe])
        if not ok.any():
            return empty
        matched = fv.filter(pa.array(ok)).select(fact_cols)
        pick = pa.array(safe[ok], type=pa.int64())
        for c in interval_cols:
            if c not in fact_cols:
                matched = matched.append_column(c, pc.take(iv[c], pick))
        return matched.select(out_cols)

    return both.groupby(group_key).map_groups(match, batch_format="pyarrow")

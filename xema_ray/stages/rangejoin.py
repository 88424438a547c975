"""Range (interval) join — each fact row matches the interval of the same
key containing its timestamp (``start <= ts <= end``).

Ray Data has no native range join; this is the documented composition
(SURVEY §2 custom-operator rule): both sides are tagged, column-aligned
and unioned, then ONE ``groupby(key)`` co-partitions them and each group
resolves matches with a vectorized ``searchsorted`` over the sorted
interval starts — O((n_f + n_iv)·log n_iv) per key, no driver state.

Partitioning assumption: one key's facts + intervals fit one group
(same as the as-of join / session windows); intervals of a key must be
non-overlapping (true for session/tumbling windows — for overlapping
intervals the LAST containing interval by start wins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
               start_col: str, end_col: str, interval_cols=None):
    """Inner range join: fact rows ⋈ containing interval (per key).

    Returns the fact columns plus ``interval_cols`` (default: every
    interval column except the key) for matched rows; unmatched fact rows
    drop (inner semantics).
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

    both = _aligned(fact_ds, combined, "f").union(
        _aligned(intervals_ds, combined, "i"))

    out_cols = fact_cols + [c for c in interval_cols if c not in fact_cols]
    # canonical output dtypes: the union's null-padding floatifies int
    # columns in the pandas group blocks; matched rows have no nulls, so
    # they cast back losslessly
    target_dtypes: dict = {}
    for f in combined:
        if f.name in out_cols:
            try:
                target_dtypes[f.name] = f.type.to_pandas_dtype()
            except (NotImplementedError, TypeError):
                pass

    def _restore(df: pd.DataFrame) -> pd.DataFrame:
        for c, dt in target_dtypes.items():
            if c in df.columns and df[c].dtype != dt:
                try:
                    df[c] = df[c].astype(dt)
                except (TypeError, ValueError):
                    pass
        return df

    def match(g: pd.DataFrame) -> pd.DataFrame:
        iv = g[g["_side"] == "i"].sort_values(start_col, kind="stable")
        fv = g[g["_side"] == "f"]
        empty = _restore(pd.DataFrame({c: pd.Series([], dtype=g[c].dtype)
                                       for c in out_cols}))
        if len(iv) == 0 or len(fv) == 0:
            return empty
        starts = iv[start_col].to_numpy(dtype=np.int64)
        ends = iv[end_col].to_numpy(dtype=np.int64)
        ts = fv[ts_col].astype("int64").to_numpy()
        idx = np.searchsorted(starts, ts, side="right") - 1
        safe = np.clip(idx, 0, len(iv) - 1)
        ok = (idx >= 0) & (ts <= ends[safe])
        if not ok.any():
            return empty
        matched = fv.loc[ok, fact_cols].reset_index(drop=True)
        picked = iv.iloc[safe[ok]].reset_index(drop=True)
        for c in interval_cols:
            if c not in fact_cols:
                matched[c] = picked[c].to_numpy()
        return _restore(matched[out_cols])

    return both.groupby(key).map_groups(match, batch_format="pandas")

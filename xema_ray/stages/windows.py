"""Stream-shaped windowing over the bounded events log.

Ray Data has no event-time windows; the engine treats the events table as
an ordered, key-partitioned log (ray guide "Streaming-shaped workloads"):
tumbling windows are a vectorized epoch-floor + grouped aggregate
(``events_hourly`` in pipelines/queries.py); session windows partition by
key, sort by timestamp within the group, and close a session when the gap
exceeds the timeout — ``groupby(key).map_groups`` with pandas inside.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
all events of one ``user_id`` fit in one group for the default paths.
For a pathological single-key stream (bot user with 10^8 events) pass
``time_bucket_seconds`` to :func:`sessions_per_key` — (key, time-bucket)
sub-partitioning with tiny per-bucket partials and a per-key boundary
merge; output identical for any bucket width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _epoch_us(series: pd.Series) -> np.ndarray:
    """int64 epoch-MICROSECONDS regardless of the datetime unit (pandas
    may deliver datetime64[ns]; astype(int64) alone would yield ns and
    make every gap/window 1000x off — code-review r2)."""
    if pd.api.types.is_datetime64_any_dtype(series):
        return series.astype("datetime64[us]").astype("int64").to_numpy()
    return series.astype("int64").to_numpy()


def sessionize_group(g: pd.DataFrame, ts_col: str, gap_us: int) -> pd.DataFrame:
    g = g.sort_values(ts_col, kind="stable")
    ts = _epoch_us(g[ts_col])
    new_session = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
    g = g.assign(_session=np.cumsum(new_session))
    return g


def session_stats(ds, key: str = "user_id", ts_col: str = "ts",
                  gap_seconds: int = 1800):
    """One row per (key, session): start/end epoch-us, event count.

    ``groupby(key)`` is the only shuffle; sessionization within a group is
    vectorized pandas.
    """
    gap_us = gap_seconds * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = sessionize_group(g, ts_col, gap_us)
        g = g.assign(_us=_epoch_us(g[ts_col]))
        out = g.groupby("_session").agg(
            session_start=("_us", "min"),
            session_end=("_us", "max"),
            n_events=("_us", "count"),
        ).reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        out["session_start"] = out["session_start"].astype("int64")
        out["session_end"] = out["session_end"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sessions_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                     gap_seconds: int = 1800,
                     time_bucket_seconds: int = None):
    """(key, n_sessions, n_events) — compact session summary per key.

    ``time_bucket_seconds`` (r3, VERDICT item 7 hot-key hardening): when
    set, events are sub-partitioned by ``(key, floor(ts/bucket))`` so a
    pathological key (bot user with 10^8 events) never lands in one
    group.  Each sub-bucket emits a TINY partial — (n_events, in-bucket
    session breaks, first/last event time) — and a per-key merge over the
    partials adds one break per adjacent-bucket boundary whose gap
    exceeds the timeout.  Output is identical to the unbucketed path for
    any bucket width (bucket boundaries only re-route where the gap test
    runs, never change it).
    """
    gap_us = gap_seconds * 1_000_000

    if time_bucket_seconds is None:
        def per_key(g: pd.DataFrame) -> pd.DataFrame:
            g = sessionize_group(g, ts_col, gap_us)
            return pd.DataFrame({
                key: [g[key].iloc[0]],
                "n_sessions": np.array([g["_session"].iloc[-1]], dtype=np.int64),
                "n_events": np.array([len(g)], dtype=np.int64),
            })

        return ds.groupby(key).map_groups(per_key, batch_format="pandas")

    bucket_us = time_bucket_seconds * 1_000_000

    def add_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_tb"] = _epoch_us(g[ts_col]) // bucket_us
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(_epoch_us(g[ts_col]))
        breaks = int(((ts[1:] - ts[:-1]) > gap_us).sum()) if len(ts) > 1 else 0
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "_tb": np.array([g["_tb"].iloc[0]], dtype=np.int64),
            "_n": np.array([len(ts)], dtype=np.int64),
            "_breaks": np.array([breaks], dtype=np.int64),
            "_first": np.array([ts[0]], dtype=np.int64),
            "_last": np.array([ts[-1]], dtype=np.int64),
        })

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_tb", kind="stable")
        first = g["_first"].to_numpy()
        last = g["_last"].to_numpy()
        boundary = int(((first[1:] - last[:-1]) > gap_us).sum()) if len(g) > 1 else 0
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_sessions": np.array(
                [1 + int(g["_breaks"].sum()) + boundary], dtype=np.int64),
            "n_events": np.array([int(g["_n"].sum())], dtype=np.int64),
        })

    partials = ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby([key, "_tb"]).map_groups(per_bucket, batch_format="pandas")
    return partials.groupby(key).map_groups(merge_key, batch_format="pandas")


def hopping_window_partials(ds, ts_col: str = "ts", value_col: str = "value",
                            size_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) windows: every event lands in the ``size/hop``
    overlapping windows ``[k·hop, k·hop + size)`` that contain it.

    Vectorized per batch: the window-index range per event is pure
    arithmetic, the explode is ``repeat``/``arange``, and each batch
    pre-aggregates (window → count, fixed-point value sum) so only tiny
    partial rows reach the final ``groupby(window)`` — the same
    partial-then-merge shape as the tumbling windows.  Values are
    fixed-pointed per ROW before summing (floor(v·1e6 + 0.5)) so the
    aggregate is order-insensitive and engine-exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    size_us = size_s * 1_000_000
    hop_us = hop_s * 1_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        # rows with a null timestamp carry no window (SQL's NULL bounds
        # yield an empty generate_series); null VALUES count toward n but
        # contribute 0 to the sum (SQL sum ignores NULL) — code-review r2
        tbl = tbl.filter(pc.is_valid(tbl[ts_col]))
        col = tbl[ts_col]
        t = col.type
        if pa.types.is_timestamp(t) and t.unit != "us":
            col = pc.cast(col, pa.timestamp("us"))  # normalize ns/ms/s → µs
        ts = pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)
        vcol = tbl[value_col]
        val = pc.fill_null(vcol, 0.0).to_numpy(zero_copy_only=False)
        val_m = np.floor(val * 1e6 + 0.5).astype(np.int64)
        k_min = np.floor_divide(ts - size_us, hop_us) + 1
        k_max = np.floor_divide(ts, hop_us)
        counts = (k_max - k_min + 1).astype(np.int64)
        rows = np.repeat(np.arange(len(ts)), counts)
        # window index per exploded row: k_min[row] + local offset
        offs = np.arange(len(rows)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        ks = k_min[rows] + offs
        starts = ks * hop_us
        # per-batch partial aggregation by window start
        uniq, inv = np.unique(starts, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, val_m[rows])
        return pa.table({
            "window_start": pa.array(uniq, type=pa.int64()),
            "n": pa.array(cnt, type=pa.int64()),
            "sum_value_m": pa.array(sums, type=pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow")


def hopping_window_counts(ds, ts_col: str = "ts", value_col: str = "value",
                          size_s: int = 3600, hop_s: int = 900):
    """(window_start_us, n, sum_value_m) per hopping window."""
    from ray.data.aggregate import Sum

    partials = hopping_window_partials(ds, ts_col, value_col, size_s, hop_s)
    return partials.groupby("window_start").aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value_m", alias_name="sum_value_m"),
    )


def rolling_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", id_col: str = "event_id",
                    window_rows: int = 4, scale: int = 1_000_000,
                    time_bucket_seconds: int = None):
    """ROLLING count-window aggregate over the ts-ordered per-key log
    (the fourth window class next to tumbling/hopping/session): one
    output row per event with

    * ``delta_us`` — microseconds since the key's previous event
      (−1 for the key's first event, the SQL ``lag`` semantics), and
    * ``roll_sum_fp`` — fixed-point sum of ``value`` over the current
      and previous ``window_rows − 1`` events of the same key
      (``ROWS BETWEEN w−1 PRECEDING AND CURRENT ROW``).

    Exactness: each value is quantised to ``floor(value · scale)``
    BEFORE summation — one IEEE multiply + floor, bit-identical across
    engines — so the rolling sum is an order-exact integer cumsum.

    Shape: one ``groupby(key)`` shuffle; in-group work is a numpy
    cumsum over the (ts, id)-sorted rows.  Partitioning assumption
    (SURVEY §2 custom-operator rule): one key's events fit one group.
    ``time_bucket_seconds`` lifts it for a pathological hot key (bot
    user with 10^8 events): rows sub-partition by ``(key,
    floor(ts/bucket))``; each bucket finishes every row except its
    first ``window_rows − 1`` (incomplete window) and its first row
    (unknown lag), emitting those as PENDING rows plus one tiny TAIL
    row (last ``window_rows − 1`` quantised values + last ts); a
    per-key merge over ≤ 2·w small rows per bucket completes them.
    Output identical to the plain path for any bucket width.
    """
    w = window_rows

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="stable")
        us = _epoch_us(g[ts_col])
        v = np.floor(g[value_col].to_numpy(dtype=np.float64) * scale
                     ).astype(np.int64)
        c = np.cumsum(v)
        roll = c.copy()
        if len(v) > w:
            roll[w:] = c[w:] - c[:-w]
        delta = np.empty(len(g), dtype=np.int64)
        delta[0] = -1
        if len(g) > 1:
            delta[1:] = us[1:] - us[:-1]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key: g[key].to_numpy(),
            "delta_us": delta,
            "roll_sum_fp": roll,
        })

    if time_bucket_seconds is None:
        return ds.groupby(key).map_groups(per_key, batch_format="pandas")

    bucket_us = time_bucket_seconds * 1_000_000

    def add_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_tb"] = _epoch_us(g[ts_col]) // bucket_us
        return g

    n_pend = max(w - 1, 1)  # first w-1 rows lack window; row 0 lacks lag

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="stable")
        us = _epoch_us(g[ts_col])
        v = np.floor(g[value_col].to_numpy(dtype=np.float64) * scale
                     ).astype(np.int64)
        n = len(g)
        c = np.cumsum(v)
        roll = c.copy()
        if n > w:
            roll[w:] = c[w:] - c[:-w]
        delta = np.empty(n, dtype=np.int64)
        delta[0] = -1
        if n > 1:
            delta[1:] = us[1:] - us[:-1]
        kind = np.where(np.arange(n) < n_pend, "p", "f")
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            key: g[key].to_numpy(),
            "delta_us": delta,
            "roll_sum_fp": roll,
            "kind": kind,
            "_tb": g["_tb"].to_numpy(dtype=np.int64),
            "pos": np.arange(n, dtype=np.int64),
            "ts_us": us,
            "vals": [None] * n,
        })
        tail = pd.DataFrame({
            id_col: np.array([-1], dtype=g[id_col].dtype),
            key: g[key].iloc[:1].to_numpy(),
            "delta_us": np.array([-1], dtype=np.int64),
            "roll_sum_fp": np.array([0], dtype=np.int64),
            "kind": ["t"],
            "_tb": g["_tb"].iloc[:1].to_numpy(dtype=np.int64),
            "pos": np.array([0], dtype=np.int64),
            "ts_us": us[-1:],
            "vals": [v[-(w - 1):].tolist() if w > 1 else []],
        })
        return pd.concat([out, tail], ignore_index=True)

    def fix(g: pd.DataFrame) -> pd.DataFrame:
        tails = g[g["kind"] == "t"].sort_values("_tb")
        t_tb = tails["_tb"].to_numpy(dtype=np.int64)
        t_ts = tails["ts_us"].to_numpy(dtype=np.int64)
        t_vals = list(tails["vals"])
        pend = g[g["kind"] == "p"].sort_values(["_tb", "pos"])
        out_delta, out_roll = [], []
        for _tb, pos, delta, roll, ts in zip(
                pend["_tb"].to_numpy(dtype=np.int64),
                pend["pos"].to_numpy(dtype=np.int64),
                pend["delta_us"].to_numpy(dtype=np.int64),
                pend["roll_sum_fp"].to_numpy(dtype=np.int64),
                pend["ts_us"].to_numpy(dtype=np.int64)):
            j = np.searchsorted(t_tb, _tb)  # tails strictly before _tb
            if pos == 0 and j > 0:
                delta = ts - t_ts[j - 1]
            need = w - 1 - int(pos)
            if need > 0 and j > 0:
                prev = [x for vs in t_vals[:j] for x in vs][-need:]
                roll = roll + sum(prev)
            out_delta.append(delta)
            out_roll.append(roll)
        return pd.DataFrame({
            id_col: pend[id_col].to_numpy(),
            key: pend[key].to_numpy(),
            "delta_us": np.array(out_delta, dtype=np.int64),
            "roll_sum_fp": np.array(out_roll, dtype=np.int64),
        })

    cols = [id_col, key, "delta_us", "roll_sum_fp"]
    p1 = ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby([key, "_tb"]).map_groups(per_bucket, batch_format="pandas")
    final = p1.filter(expr="kind == 'f'").select_columns(cols)
    fixed = p1.filter(expr="kind != 'f'") \
        .groupby(key).map_groups(fix, batch_format="pandas")
    return final.union(fixed)

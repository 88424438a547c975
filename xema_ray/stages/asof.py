"""As-of join over a key-partitioned event log (the brief's canonical
custom operator: Ray Data lacks it; compose ``groupby(key)`` +
``merge_asof`` within the sorted group — ray guide "As-of / range join").

Partitioning assumption (documented per the custom-operator rule): all
events of one key fit in one group on the default path.  For a
pathological hot key pass ``time_bucket_seconds`` (r3, VERDICT item 7):
events sub-partition by ``(key, floor(ts/bucket))``, a tiny per-bucket
partial carries each bucket's LAST right-event timestamp, and a per-key
running-max over those partials gives every bucket its carry-in — the
right event to match when a left event has no prior right event inside
its own bucket.  Output identical to the plain path for any width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _epoch_us_series(series: pd.Series) -> np.ndarray:
    if pd.api.types.is_datetime64_any_dtype(series):
        return series.astype("datetime64[us]").astype("int64").to_numpy()
    return series.astype("int64").to_numpy()


def asof_join_events(ds, key: str = "user_id", ts_col: str = "ts",
                     left_type: str = "click", right_type: str = "view",
                     type_col: str = "event_type",
                     time_bucket_seconds: int = None):
    """For every ``left_type`` event, attach the timestamp of the same
    key's most recent ``right_type`` event at-or-before it.

    Returns (key, left event ts, matched right ts) as epoch microseconds
    (int64); "no prior match" is encoded as -1 (null encodings differ
    between engines and would break value-hash comparison).

    ``time_bucket_seconds``: hot-key sub-partitioned path (module doc).
    """

    def asof_frame(g: pd.DataFrame, carry_us: int = -1) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        left = g[g[type_col] == left_type][[key, ts_col]]
        right = g[g[type_col] == right_type][[ts_col]].rename(
            columns={ts_col: "matched_ts"})
        if left.empty:
            return pd.DataFrame({key: pd.Series([], dtype="int64"),
                                 "event_us": pd.Series([], dtype="int64"),
                                 "matched_us": pd.Series([], dtype="int64")})
        merged = pd.merge_asof(left, right, left_on=ts_col,
                               right_on="matched_ts", direction="backward")
        event_us = merged[ts_col].values.astype("datetime64[us]").astype("int64")
        matched_vals = merged["matched_ts"].values.astype("datetime64[us]").astype("int64")
        matched_vals[merged["matched_ts"].isna().to_numpy()] = carry_us
        return pd.DataFrame({
            key: merged[key].astype("int64"),
            "event_us": event_us,
            "matched_us": matched_vals,
        })

    if time_bucket_seconds is None:
        return ds.groupby(key).map_groups(asof_frame, batch_format="pandas")

    bucket_us = time_bucket_seconds * 1_000_000

    def add_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_tb"] = _epoch_us_series(g[ts_col]) // bucket_us
        return g

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")

    # tiny partial per (key, bucket): the bucket's LAST right-event ts
    def last_right(g: pd.DataFrame) -> pd.DataFrame:
        r = g[g[type_col] == right_type]
        last = int(_epoch_us_series(r[ts_col]).max()) if len(r) else -1
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "_tb": np.array([g["_tb"].iloc[0]], dtype=np.int64),
            "_last": np.array([last], dtype=np.int64),
        })

    partials = bucketed.groupby([key, "_tb"]).map_groups(
        last_right, batch_format="pandas")

    # per-key running max over bucket order -> each bucket's carry-in
    def carries(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_tb", kind="stable").reset_index(drop=True)
        prior = np.concatenate(
            [[-1], np.maximum.accumulate(g["_last"].to_numpy())[:-1]])
        return pd.DataFrame({key: g[key], "_tb": g["_tb"],
                             "_carry": prior.astype(np.int64)})

    carry_rows = partials.groupby(key).map_groups(
        carries, batch_format="pandas").take_all()
    import ray

    carry_map = {(r[key], r["_tb"]): r["_carry"] for r in carry_rows}
    cref = ray.put(carry_map)
    _cache: dict = {}  # one deserialize per worker process, not per group
    # (a plain dict is not zero-copy; re-fetching it for every
    # (key, bucket) group was O(groups x map) — code-review r3)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cm = _cache.get("m")
        if cm is None:
            cm = _cache["m"] = ray.get(cref)
        carry = cm.get((g[key].iloc[0], int(g["_tb"].iloc[0])), -1)
        return asof_frame(g.drop(columns=["_tb"]), carry_us=int(carry))

    return bucketed.groupby([key, "_tb"]).map_groups(
        per_bucket, batch_format="pandas")

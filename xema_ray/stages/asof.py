"""As-of join over a key-partitioned event log (the brief's canonical
custom operator: Ray Data lacks it; compose ``groupby(key)`` +
``merge_asof`` within the sorted group — ray guide "As-of / range join").

Partitioning assumption (documented per the custom-operator rule): all
events of one key fit in one group; a pathological single hot key would
need time-range sub-bucketing with boundary replication.
"""

from __future__ import annotations

import pandas as pd


def asof_join_events(ds, key: str = "user_id", ts_col: str = "ts",
                     left_type: str = "click", right_type: str = "view",
                     type_col: str = "event_type"):
    """For every ``left_type`` event, attach the timestamp of the same
    key's most recent ``right_type`` event at-or-before it.

    Returns (key, left event ts, matched right ts) as epoch microseconds
    (int64); "no prior match" is encoded as -1 (null encodings differ
    between engines and would break value-hash comparison).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
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
        matched_vals[merged["matched_ts"].isna().to_numpy()] = -1
        return pd.DataFrame({
            key: merged[key].astype("int64"),
            "event_us": event_us,
            "matched_us": matched_vals,
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")

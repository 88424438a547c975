"""Stream-shaped windowing over the bounded events log.

Ray Data has no event-time windows; the engine treats the events table as
an ordered, key-partitioned log (ray guide "Streaming-shaped workloads"):
tumbling windows are a vectorized epoch-floor + grouped aggregate
(``events_hourly`` in pipelines/queries.py); session windows partition by
key, sort by timestamp within the group, and close a session when the gap
exceeds the timeout — ``groupby(key).map_groups`` with pandas inside.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
all events of one ``user_id`` fit in one group (true for bounded keys;
salt + two-phase merge would be needed for a pathological single-key
stream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize_group(g: pd.DataFrame, ts_col: str, gap_us: int) -> pd.DataFrame:
    g = g.sort_values(ts_col, kind="stable")
    ts = g[ts_col].astype("int64").to_numpy()
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
        out = g.groupby("_session").agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "count"),
        ).reset_index(drop=True)
        out.insert(0, key, g[key].iloc[0])
        out["session_start"] = out["session_start"].astype("int64")
        out["session_end"] = out["session_end"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def sessions_per_key(ds, key: str = "user_id", ts_col: str = "ts",
                     gap_seconds: int = 1800):
    """(key, n_sessions, n_events) — compact session summary per key."""
    gap_us = gap_seconds * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = sessionize_group(g, ts_col, gap_us)
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_sessions": np.array([g["_session"].iloc[-1]], dtype=np.int64),
            "n_events": np.array([len(g)], dtype=np.int64),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")

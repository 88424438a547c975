"""Funnel analysis over an event log — how far each user progresses
through an ORDERED sequence of steps (view → click → purchase), judged
on strictly-increasing FIRST-occurrence times.

Shape: the only thing that ever shuffles is one pre-aggregated row per
(batch, user) carrying the per-step minimum timestamps — data rows stay
put (the grouped-stats pattern of :mod:`xema_ray.stages.stats`).  The
exchange is a coarse hash-bucket ``groupby(bucket)``: each user lands
in exactly one bucket, per-bucket folds are globally complete, and the
output is a |steps|+1-row depth histogram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SENTINEL = np.int64(2**62)  # "never happened" (far future)


def funnel_depths(ds, steps, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts"):
    """Depth histogram ``(depth int64, n_users int64)`` for the ordered
    ``steps``: a user is at depth d when the first occurrences of
    steps[0..d-1] happen in strictly increasing time order and step d
    is missing or out of order.  Users with no step-0 event count at
    depth 0.
    """
    from xema_ray.stages.shuffle import default_shuffle_buckets

    steps = list(steps)
    n_steps = len(steps)
    n_buckets = default_shuffle_buckets()
    step_index = {s: i for i, s in enumerate(steps)}

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False)
        types = t[type_col].to_pandas()
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        sidx = types.map(step_index).to_numpy()
        rel = ~pd.isna(sidx)
        # EVERY user seen in the batch emits a partial row (a user with
        # zero funnel-step events is still a depth-0 user, matching
        # GROUP BY user over the full log)
        uu = np.unique(users.astype(np.int64))
        mins = np.full((len(uu), n_steps), _SENTINEL, dtype=np.int64)
        if rel.any():
            idx = np.searchsorted(uu, users[rel].astype(np.int64))
            np.minimum.at(mins, (idx, sidx[rel].astype(np.int64)),
                          ts[rel])
        return pa.table({
            "user": pa.array(uu, type=pa.int64()),
            "bucket": pa.array((uu % n_buckets).astype(np.int32),
                               type=pa.int32()),
            **{f"t{i}": pa.array(mins[:, i], type=pa.int64())
               for i in range(n_steps)}})

    def bucket_depths(g: pd.DataFrame) -> pd.DataFrame:
        uu, codes = np.unique(g["user"].to_numpy(dtype=np.int64),
                              return_inverse=True)
        mins = np.full((len(uu), n_steps), _SENTINEL, dtype=np.int64)
        for i in range(n_steps):
            np.minimum.at(mins[:, i], codes,
                          g[f"t{i}"].to_numpy(dtype=np.int64))
        depth = np.zeros(len(uu), dtype=np.int64)
        alive = np.ones(len(uu), dtype=bool)
        prev = np.full(len(uu), -np.int64(2**62), dtype=np.int64)
        for i in range(n_steps):
            step_ok = alive & (mins[:, i] < _SENTINEL) \
                & (mins[:, i] > prev)
            depth[step_ok] = i + 1
            alive = step_ok
            prev = mins[:, i]
        counts = np.bincount(depth, minlength=n_steps + 1)
        return pd.DataFrame({"depth": np.arange(n_steps + 1,
                                                dtype=np.int64),
                             "n_users": counts.astype(np.int64)})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_depths,
                                      batch_format="pandas").take_all()
    totals = np.zeros(n_steps + 1, dtype=np.int64)
    for r in rows:
        totals[r["depth"]] += r["n_users"]
    return pa.table({
        "depth": pa.array(np.arange(n_steps + 1, dtype=np.int64),
                          type=pa.int64()),
        "n_users": pa.array(totals, type=pa.int64()),
    })

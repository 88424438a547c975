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


def _ts_us(col) -> np.ndarray:
    """int64 epoch-MICROSECONDS regardless of the column's datetime unit
    (pandas-sourced data arrives as timestamp[ns]; a raw int64 cast
    would then be off by 1000x)."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)



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
        ts = _ts_us(t[ts_col])
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


def retention_counts(ds, user_col: str = "user_id", ts_col: str = "ts",
                     horizon_days: int = 7):
    """Cohort RETENTION matrix over an event log: users cohorted by
    their first-activity day (epoch days), counted as retained on day
    ``cohort + k`` for k = 0..horizon.  Returns ``(cohort, k, n_users)``
    sorted.

    Exchange discipline: per-batch DISTINCT (user, day) pairs are the
    only rows that move (already a huge reduction over raw events), the
    coarse bucket groupby gives each user to exactly one fold, and the
    fold emits pre-counted ``(cohort, k, n)`` partials the driver sums
    — no per-event shuffle, no skew sensitivity (a bot user with 10^8
    events still contributes ≤ horizon+1 distinct days).
    """
    from xema_ray.stages.shuffle import default_shuffle_buckets

    day_us = np.int64(86_400_000_000)
    n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_us(t[ts_col])
        days = ts // day_us
        pairs = np.unique(np.stack([users, days], axis=1), axis=0)
        return pa.table({
            "user": pa.array(pairs[:, 0], type=pa.int64()),
            "day": pa.array(pairs[:, 1], type=pa.int64()),
            "bucket": pa.array((pairs[:, 0] % n_buckets).astype(np.int32),
                               type=pa.int32()),
        })

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(np.stack([g["user"].to_numpy(dtype=np.int64),
                                    g["day"].to_numpy(dtype=np.int64)],
                                   axis=1), axis=0)  # cross-batch distinct
        users, days = pairs[:, 0], pairs[:, 1]
        firsts = np.ones(len(users), dtype=bool)
        firsts[1:] = users[1:] != users[:-1]
        # rows are (user, day)-sorted -> first row per user = cohort day
        cohort = np.repeat(days[firsts], np.diff(
            np.append(np.flatnonzero(firsts), len(users))))
        k = days - cohort
        m = k <= horizon_days
        key = cohort[m] * (horizon_days + 1) + k[m]
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "cohort": uk // (horizon_days + 1),
            "k": uk % (horizon_days + 1),
            "n": cnt.astype(np.int64),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_fold,
                                      batch_format="pandas").take_all()
    agg: dict = {}
    for r in rows:
        key = (int(r["cohort"]), int(r["k"]))
        agg[key] = agg.get(key, 0) + int(r["n"])
    keys = sorted(agg)
    return pa.table({
        "cohort": pa.array([c for c, _ in keys], type=pa.int64()),
        "k": pa.array([k for _, k in keys], type=pa.int64()),
        "n_users": pa.array([agg[x] for x in keys], type=pa.int64()),
    })


def daily_active(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Daily-active rollup ``(day, n_events, n_users)`` — the exact
    COUNT(DISTINCT user) per epoch-day, plus the raw event count.

    Exchange discipline (same as :func:`retention_counts`): per-batch
    pre-aggregated ``(day, user, n)`` triples are the only rows that
    move — bounded by |users| × |days| per batch, never by events —
    bucketed by ``user % B`` so each user folds in exactly one group
    (cross-batch distinct is exact), and the final ``groupby(day)``
    merges B tiny per-bucket partials.  A bot user with 10^8 events
    contributes one triple per (batch, day); its *event count* still
    arrives exactly through the pre-summed ``n``.
    """
    from ray.data.aggregate import Sum

    from xema_ray.stages.shuffle import default_shuffle_buckets

    day_us = np.int64(86_400_000_000)
    n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        days = _ts_us(t[ts_col]) // day_us
        pairs, counts = np.unique(np.stack([days, users], axis=1), axis=0,
                                  return_counts=True)
        return pa.table({
            "day": pa.array(pairs[:, 0], type=pa.int64()),
            "user": pa.array(pairs[:, 1], type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            "bucket": pa.array((pairs[:, 1] % n_buckets).astype(np.int32),
                               type=pa.int32()),
        })

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per_pair = g.groupby(["day", "user"], sort=True)["n"].sum()
        per_day = per_pair.groupby(level="day").agg(["count", "sum"])
        return pd.DataFrame({
            "day": per_day.index.to_numpy(dtype=np.int64),
            "n_users": per_day["count"].to_numpy(dtype=np.int64),
            "n_events": per_day["sum"].to_numpy(dtype=np.int64),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_fold, batch_format="pandas") \
        .groupby("day").aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("n_users", alias_name="n_users"),
        )


def weekly_active(ds, user_col: str = "user_id", ts_col: str = "ts",
                  window_days: int = 7):
    """Rolling DISTINCT-user window (WAU): for every epoch-day in the
    log's span, the exact count of users active in the trailing
    ``window_days`` days — the distinct-count analogue of a hopping
    window (a user active twice in a window still counts once, so
    per-window partial SUMS are wrong; per-user coverage is right).

    Exchange discipline: per-batch DISTINCT (user, day) pairs bucketed
    by user (same as :func:`retention_counts`); each bucket fold
    expands every user's active days into the ≤ days × window_days
    window-days it covers, dedupes PER USER (coverage, not activity
    count), and emits pre-counted (window, n) partials; one
    ``groupby(window)`` merges B tiny partials.  Windows beyond the
    log's last day are trimmed on the driver (the last active day
    emits coverage ``window_days − 1`` days past it).
    """
    from xema_ray.stages.shuffle import default_shuffle_buckets

    day_us = np.int64(86_400_000_000)
    n_buckets = default_shuffle_buckets()
    w = int(window_days)

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        days = _ts_us(t[ts_col]) // day_us
        pairs = np.unique(np.stack([users, days], axis=1), axis=0)
        return pa.table({
            "user": pa.array(pairs[:, 0], type=pa.int64()),
            "day": pa.array(pairs[:, 1], type=pa.int64()),
            "bucket": pa.array((pairs[:, 0] % n_buckets).astype(np.int32),
                               type=pa.int32()),
        })

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(np.stack([g["user"].to_numpy(dtype=np.int64),
                                    g["day"].to_numpy(dtype=np.int64)],
                                   axis=1), axis=0)  # cross-batch distinct
        users, days = pairs[:, 0], pairs[:, 1]
        # windows covered by one active day d: [d, d+w-1]
        cov_u = np.repeat(users, w)
        cov_w = (days[:, None] + np.arange(w, dtype=np.int64)).ravel()
        uw = np.unique(np.stack([cov_u, cov_w], axis=1), axis=0)  # per-user dedup
        wd, cnt = np.unique(uw[:, 1], return_counts=True)
        return pd.DataFrame({"day": wd, "n": cnt.astype(np.int64)})

    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_fold, batch_format="pandas") \
        .groupby("day").sum("n").take_all()  # <= span+w-1 rows
    if not rows:
        return pa.table({"day": pa.array([], type=pa.int64()),
                         "wau": pa.array([], type=pa.int64())})
    last_day = max(r["day"] for r in rows) - (w - 1)
    kept = sorted((r["day"], r["sum(n)"]) for r in rows
                  if r["day"] <= last_day)
    return pa.table({
        "day": pa.array([d for d, _ in kept], type=pa.int64()),
        "wau": pa.array([n for _, n in kept], type=pa.int64()),
    })


def attribution_matrix(ds, user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id"):
    """FIRST-touch × LAST-touch attribution: per user, the type of the
    earliest and latest event under the total (ts, event_id) order,
    rolled up to a ``(first_type, last_type, n_users)`` matrix.

    Exchange discipline: each batch reduces every user to ONE rider row
    (min/max key + the two types) — bounded by |users| per batch, never
    events — bucketed by ``user % B`` so the cross-batch argmin/argmax
    folds exactly once per user; B tiny (first, last, n) partials merge
    in one final groupby.  The (ts, id) composite key makes the fold
    deterministic under timestamp ties."""
    from ray.data.aggregate import Sum

    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(users):
            return pa.table({"user": pa.array([], pa.int64()),
                             "min_ts": pa.array([], pa.int64()),
                             "min_id": pa.array([], pa.int64()),
                             "first": pa.array([], pa.string()),
                             "max_ts": pa.array([], pa.int64()),
                             "max_id": pa.array([], pa.int64()),
                             "last": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int32())})
        ts = _ts_us(t[ts_col])
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # composite (ts, id) packed per-element is unsafe (overflow);
        # lexsort instead with id as the minor key
        order = np.lexsort((eid, ts, users))
        us = users[order]
        firsts = np.ones(len(us), dtype=bool)
        firsts[1:] = us[1:] != us[:-1]
        starts = np.nonzero(firsts)[0]
        ends = np.append(starts[1:], len(us)) - 1
        types = np.asarray(t[type_col].to_pylist(), dtype=object)[order]
        ts_s, eid_s = ts[order], eid[order]
        return pa.table({
            "user": pa.array(us[starts], pa.int64()),
            "min_ts": pa.array(ts_s[starts], pa.int64()),
            "min_id": pa.array(eid_s[starts], pa.int64()),
            "first": pa.array(types[starts], pa.string()),
            "max_ts": pa.array(ts_s[ends], pa.int64()),
            "max_id": pa.array(eid_s[ends], pa.int64()),
            "last": pa.array(types[ends], pa.string()),
            "bucket": pa.array((us[starts] % n_buckets).astype(np.int32),
                               pa.int32())})

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        users = g["user"].to_numpy(dtype=np.int64)
        o = np.lexsort((g["min_id"].to_numpy(dtype=np.int64),
                        g["min_ts"].to_numpy(dtype=np.int64), users))
        us = users[o]
        firsts = np.ones(len(us), dtype=bool)
        firsts[1:] = us[1:] != us[:-1]
        first_type = g["first"].to_numpy()[o][firsts]
        o2 = np.lexsort((-g["max_id"].to_numpy(dtype=np.int64),
                         -g["max_ts"].to_numpy(dtype=np.int64), users))
        us2 = users[o2]
        firsts2 = np.ones(len(us2), dtype=bool)
        firsts2[1:] = us2[1:] != us2[:-1]
        last_type = g["last"].to_numpy()[o2][firsts2]
        out = pd.DataFrame({"first_type": first_type,
                            "last_type": last_type})
        out = out.groupby(["first_type", "last_type"], sort=True,
                          as_index=False).size() \
            .rename(columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    # final merge: B tiny pre-counted matrices — driver fold (the
    # funnel_depths precedent); a second Ray sort exchange would add
    # ~7 s fixed cost to sum a few hundred rows
    rows = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_fold,
                                      batch_format="pandas").take_all()
    acc: dict = {}
    for r in rows:
        key = (r["first_type"], r["last_type"])
        acc[key] = acc.get(key, 0) + int(r["n_users"])
    keys = sorted(acc)
    return pa.table({
        "first_type": pa.array([k[0] for k in keys], pa.string()),
        "last_type": pa.array([k[1] for k in keys], pa.string()),
        "n_users": pa.array([acc[k] for k in keys], pa.int64())})


def decayed_user_scores(ds, user_col: str = "user_id", ts_col: str = "ts",
                        halflife_days: int = 1, cap: int = 40):
    """EXACT exponential-recency activity score per user:
    ``score = Σ_events 2^(cap − min(age//halflife, cap))`` where age is
    whole days before the corpus' max timestamp.

    Powers of two up to 2^cap are exact in int64 AND in a SQL engine's
    ``power()`` double (integers ≤ 2^52) — so a decayed score, normally
    a float-accumulation hazard, hash-matches an oracle exactly.  Two
    corpus-size-free passes: a max-timestamp fold (one int per batch),
    then per-batch per-user integer partials into a user groupby."""
    from ray.data.aggregate import Sum

    day_us = np.int64(86_400_000_000)

    anchor = None
    for b in ds.map_batches(
            lambda t: pa.table({"m": pa.array(
                [int(_ts_us(t[ts_col]).max())] if t.num_rows else [],
                pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for v in b["m"].to_pylist():
            anchor = v if anchor is None else max(anchor, v)
    if anchor is None:
        return ds.map_batches(lambda t: pa.table(
            {"user_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.int64())}), batch_format="pyarrow")
    anchor_day = anchor // int(day_us)

    def partial(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        days = _ts_us(t[ts_col]) // day_us
        age = np.minimum((anchor_day - days) // halflife_days, cap)
        w = np.int64(1) << (cap - age).astype(np.int64)
        uniq, inv = np.unique(users, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, w)
        return pa.table({"user_id": pa.array(uniq, pa.int64()),
                         "score": pa.array(sums, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("score", alias_name="score"))


def transition_counts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      id_col: str = "event_id"):
    """Global Markov TRANSITION matrix over per-user event sequences:
    ``(prev_type, next_type, n)`` where consecutive-ness is defined by
    the total (ts, event_id) order within each user.

    Unlike the argmin/argmax folds, a transition SPANS adjacent rows,
    so a user's events must co-locate once: rows exchange through the
    coarse ``user % B`` bucket groupby (same shape as sessions), each
    bucket lexsorts its users' rows, pairs adjacent types vectorized,
    and emits a pre-counted ≤|types|² matrix; B tiny matrices fold on
    the driver.  Hot-key caveat: one group carries a user's full
    history — for a pathological bot user apply the time-bucket
    sub-partitioning of :func:`~xema_ray.stages.windows.rolling_per_key`
    (boundary rows replicate one row per bucket edge).
    """
    import pandas as pd

    from xema_ray.stages.shuffle import default_shuffle_buckets

    n_buckets = default_shuffle_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        users = t[user_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array(
            (users % n_buckets).astype(np.int32), pa.int32()))

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        users = g[user_col].to_numpy(dtype=np.int64)
        ts = g[ts_col].to_numpy()
        eid = g[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, ts, users))
        us = users[order]
        types = g[type_col].to_numpy()[order]
        same_user = us[1:] == us[:-1]
        prev_t = types[:-1][same_user]
        next_t = types[1:][same_user]
        out = pd.DataFrame({"prev_type": prev_t, "next_type": next_t})
        out = out.groupby(["prev_type", "next_type"], sort=True,
                          as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    rows = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_fold,
                                      batch_format="pandas").take_all()
    acc: dict = {}
    for r in rows:
        key = (r["prev_type"], r["next_type"])
        acc[key] = acc.get(key, 0) + int(r["n"])
    keys = sorted(acc)
    return pa.table({
        "prev_type": pa.array([k[0] for k in keys], pa.string()),
        "next_type": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([acc[k] for k in keys], pa.int64())})

"""Example: the streaming-shaped EVENT-LOG analytics story end to end —
the operator family a product-analytics pipeline needs over an
append-only event log, each one exchange-disciplined (pre-aggregated
partials move, raw events never do):

  daily-active rollup (exact distinct users/day)
    → session windows (30-min gap, hot-key-safe)
    → funnel depths (view → click → purchase)
    → cohort retention matrix
    → per-user rolling value windows + lag deltas

    python examples/event_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import ray.data as rd

from xema_ray.stages.funnel import daily_active, funnel_depths, retention_counts
from xema_ray.stages.windows import rolling_per_key, sessions_per_key

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
path = os.path.join(sf_dir, "events.parquet")

# 1. daily active: exact COUNT(DISTINCT user) without a distinct shuffle
da = daily_active(rd.read_parquet(path, columns=["user_id", "ts"])).take_all()
peak = max(da, key=lambda r: r["n_users"])
print(f"daily active: {len(da)} days, peak {peak['n_users']} users "
      f"({peak['n_events']} events) on day {peak['day']}")

# 2. sessionization (time-bucketed hot-key path, identical output)
ses = sessions_per_key(rd.read_parquet(path, columns=["user_id", "ts"]),
                       gap_seconds=1800, time_bucket_seconds=6 * 3600)
tot = ses.sum(["n_sessions", "n_events"])
print(f"sessions: {tot['sum(n_sessions)']} sessions over "
      f"{tot['sum(n_events)']} events")

# 3. funnel depths over the ordered step sequence
fd = funnel_depths(
    rd.read_parquet(path, columns=["user_id", "event_type", "ts"]),
    steps=["view", "click", "purchase"]).to_pylist()
print("funnel depths:", {r["depth"]: r["n_users"] for r in fd})

# 4. cohort retention (distinct (user, day) pairs are the only exchange)
rc = retention_counts(rd.read_parquet(path, columns=["user_id", "ts"]),
                      horizon_days=7)
d0 = sum(r["n_users"] for r in rc.to_pylist() if r["k"] == 0)
d7 = sum(r["n_users"] for r in rc.to_pylist() if r["k"] == 7)
print(f"retention: {d0} cohort-day users, {d7} retained at day 7")

# 5. rolling per-user value windows (4-event fixed-point sums + lag)
roll = rolling_per_key(
    rd.read_parquet(path, columns=["event_id", "user_id", "ts", "value"]),
    window_rows=4, time_bucket_seconds=24 * 3600)
n = roll.count()
print(f"rolling windows: {n} per-event rows")
print("analytics_done", len(da), "days")

ray.shutdown()

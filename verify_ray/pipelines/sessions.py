"""Sessionization: gap-based session windows over the events log.

Ray Data has no event-time window/watermark machinery, so sessions are
computed with the documented batch-engine pattern (ray_guide): treat
events as a keyed log, ``groupby(user_id)`` to co-locate each user's
events, sort by ``ts`` within the group, and derive session boundaries
where the gap exceeds the threshold.  The ordering assumption is
per-group only — no global sort.

The shuffle moves (user_id, ts, value) triples, not whole rows; the
group fn is vectorized pandas (diff/cumsum), not per-event Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(events_ds, gap_minutes: float = 30.0,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> pd.DataFrame:
    """One row per session: (user_id, session_start, n_events, sum_value,
    duration_sec)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col]
        new_session = ts.diff() > gap
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"),
            sum_value=(value_col, "sum"),
        )
        out[user_col] = g[user_col].iloc[0]
        out["duration_sec"] = (
            (out.session_end - out.session_start).dt.total_seconds())
        return out[[user_col, "session_start", "n_events", "sum_value",
                    "duration_sec"]]

    res = (events_ds.select_columns([user_col, ts_col, value_col])
           .groupby(user_col)
           .map_groups(per_user, batch_format="pandas")
           .to_pandas())
    res["sum_value"] = np.round(res["sum_value"], 6)
    return (res.sort_values([user_col, "session_start"])
            .reset_index(drop=True))


SESSIONS_ORACLE_TEMPLATE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {gap_minutes} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       date_part('epoch', MAX(ts) - MIN(ts)) AS duration_sec
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, session_start
"""

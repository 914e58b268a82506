"""Conversation-level and stream-shaped operators.

The reference has no conversation concept (documents are independent files),
but the transcript data model makes per-conversation reading natural
(SURVEY §1 "conversation/turn duality"):

- ``conversation_stats`` — groupby(conv_id) aggregate: turns, distinct roles,
  total text chars, first/last ts. Pre-aggregates inside map_batches (one
  partial row per conv per batch) before the small groupby, so the shuffle
  moves per-conv partials, not rows (SURVEY §4 "pre-aggregate" discipline).
- ``sessionize_events`` — the streaming-window pattern from the events table:
  per-user tumbling sessions split on gaps > ``gap``; implemented as
  groupby(user).map_groups over ts-sorted groups (Ray Data has no event-time
  windows; the ordering assumption is per-group sort inside the task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def conversation_stats(ds):
    """One row per conv_id: n_turns, n_roles, total_chars, first_ts, last_ts
    (epoch us). Partial-aggregation inside each batch → tiny groupby."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": batch.column("conv_id").to_pylist(),
                "role": batch.column("role").to_pylist(),
                "chars": pc.utf8_length(batch.column("text")).to_numpy(zero_copy_only=False),
                "ts": pc.cast(batch.column("ts"), pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("conv_id").agg(
            n_turns=("role", "size"),
            total_chars=("chars", "sum"),
            first_ts=("ts", "min"),
            last_ts=("ts", "max"),
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    grouped = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("total_chars", alias_name="total_chars"),
            Min("first_ts", alias_name="first_ts"),
            Max("last_ts", alias_name="last_ts"),
        )
    )
    return grouped


def sessionize_events(ds, gap_seconds: int = 1800):
    """Per-user sessions: consecutive events ≤ gap apart share a session.
    Output: one row per session (user_id, session_idx, n_events, start_ts,
    end_ts as epoch seconds). groupby(user_id) shuffle; per-group pandas."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("int64") // 1_000_000  # epoch seconds
        new_session = (ts.diff().fillna(gap_seconds + 1) > gap_seconds).cumsum()
        out = (
            pd.DataFrame({"ts_s": ts, "sid": new_session, "event_id": g["event_id"]})
            .groupby("sid")
            .agg(n_events=("event_id", "size"), start_ts=("ts_s", "min"), end_ts=("ts_s", "max"))
            .reset_index(drop=True)
        )
        out.insert(0, "session_idx", np.arange(len(out), dtype=np.int64))
        out.insert(0, "user_id", group["user_id"].iloc[0])
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")

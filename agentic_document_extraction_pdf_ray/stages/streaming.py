"""Incremental streaming state: actor-held sessionization.

Ray Data has no watermarks; for stream-shaped input the guide's pattern is
one stateful actor per key-hash bucket, fed batches in event-time order,
holding incremental state (ray_guide.md "streaming-shaped workloads"). The
reference's only incremental state is the ordered within-group scan
(SURVEY.md §2.10); this stage generalizes it to an UNBOUNDED log: sessions
stay open across batches and close when the idle gap passes.

Used via :func:`streaming_sessionize`, which drives ts-sorted batches
through a pool of bucket actors and emits closed sessions incrementally;
``flush()`` closes the tail sessions at end of stream. Batch equivalence
with the grouped implementation (`pipelines.events.events_sessions`) is
asserted in tests.

SCALE NOTE: this is the streaming-PATTERN demo — the driver pumps the
ts-ordered batches, so it is the right shape for an unbounded feed where
a coordinator exists, not the batch scale path. For bounded logs at any
size, use ``events_sessions`` (bucketed vectorized gap scan, no driver
loop); at true stream scale the driver loop's role is played by the
ingest layer pushing batches at the bucket actors directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import ray


@dataclass
class _OpenSession:
    start_us: int
    last_us: int
    n_events: int


@ray.remote
class SessionBucketActor:
    """Holds open sessions for the users hashed to this bucket."""

    def __init__(self, gap_min: int = 30):
        self.gap_us = gap_min * 60 * 1_000_000
        self.open: dict[int, _OpenSession] = {}

    def ingest(self, batch: pd.DataFrame) -> list[dict]:
        """Consume a ts-ascending batch; return sessions that CLOSED."""
        closed: list[dict] = []
        users = batch["user_id"].to_numpy()
        ts = batch["ts"].astype("int64").to_numpy()
        for u, t in zip(users, ts):
            u = int(u)
            t = int(t)
            cur = self.open.get(u)
            if cur is None:
                self.open[u] = _OpenSession(t, t, 1)
            elif t - cur.last_us > self.gap_us:
                closed.append({"user_id": u, "start_us": cur.start_us,
                               "end_us": cur.last_us, "n_events": cur.n_events})
                self.open[u] = _OpenSession(t, t, 1)
            else:
                cur.last_us = t
                cur.n_events += 1
        return closed

    def flush(self) -> list[dict]:
        out = [{"user_id": u, "start_us": s.start_us, "end_us": s.last_us,
                "n_events": s.n_events} for u, s in sorted(self.open.items())]
        self.open = {}
        return out


def streaming_sessionize(sf_dir: str, gap_min: int = 30,
                         n_buckets: int = 4,
                         batch_rows: int = 4096) -> pd.DataFrame:
    """Drive the events log in ts order through bucket actors.

    The log is read ts-sorted (a real stream arrives ordered per
    partition); each batch is split by user-hash and shipped to its bucket
    actor; closed sessions stream out incrementally.
    """
    import ray.data
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"]).sort("ts")
    actors = [SessionBucketActor.remote(gap_min) for _ in range(n_buckets)]
    closed: list[dict] = []
    pending = []
    for batch in ds.iter_batches(batch_size=batch_rows, batch_format="pandas"):
        batch = batch.assign(ts=batch["ts"].astype("datetime64[us]"))
        buckets = batch["user_id"].to_numpy() % n_buckets
        for b in range(n_buckets):
            part = batch[buckets == b]
            if len(part):
                pending.append(actors[b].ingest.remote(part))
        # drain completed ingests opportunistically (incremental output)
        ready, pending = ray.wait(pending, num_returns=len(pending), timeout=0)
        for r in ready:
            closed.extend(ray.get(r))
    for r in ray.get(pending):
        closed.extend(r)
    for a in actors:
        closed.extend(ray.get(a.flush.remote()))
    df = pd.DataFrame(closed)
    if df.empty:
        return pd.DataFrame({"user_id": [], "n_sessions": [], "n_events": []})
    agg = (df.groupby("user_id", as_index=False)
           .agg(n_sessions=("start_us", "size"), n_events=("n_events", "sum")))
    return agg.astype({"user_id": "int64", "n_sessions": "int64",
                       "n_events": "int64"})

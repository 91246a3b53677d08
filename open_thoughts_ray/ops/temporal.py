"""Temporal operators Ray Data lacks natively: as-of join + session
windows (SURVEY brief: custom operators as compositions of
``map_batches`` + ``groupby().map_groups`` + sort).

Partitioning assumption (documented per the brief): both operators
co-locate rows by a key column via ONE groupby shuffle and order by
timestamp *within* each group — correct whenever the join/session key is
the partition key, the natural layout for per-user/per-entity event
logs.  A single hot key's group must fit one task; salt hot keys
upstream if a key exceeds block size.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def asof_join(left, right, key: str, ts: str, right_value_cols: list[str]):
    """For each left row, attach the latest right row with the same key
    and ``right.ts <= left.ts`` (DuckDB ``ASOF JOIN`` semantics, inner).

    ``right`` must already carry its value columns under names disjoint
    from the left schema (rename upstream); it is projected to
    ``[key, ts] + right_value_cols``.  Implementation: tag + NA-pad +
    union both sides, one ``groupby(key)`` shuffle, ``pd.merge_asof``
    per group — a co-group as-of, not a per-row lookup.
    """
    lcols = list(left.schema().names)
    rcols = [key, ts] + list(right_value_cols)
    overlap = set(right_value_cols) & set(lcols)
    if overlap:
        raise ValueError(f"rename right columns first, collide: {overlap}")
    all_cols = sorted(set(lcols) | set(rcols))

    def pad(df: pd.DataFrame, side: int) -> pd.DataFrame:
        for c in all_cols:
            if c not in df.columns:
                df[c] = pd.NA
        df["_side"] = side
        return df[all_cols + ["_side"]]

    u = left.map_batches(lambda df: pad(df, 0), batch_format="pandas").union(
        right.select_columns(rcols).map_batches(
            lambda df: pad(df, 1), batch_format="pandas"
        )
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lf = g.loc[g._side == 0, lcols].sort_values(ts, kind="mergesort")
        rf = g.loc[g._side == 1, rcols].sort_values(ts, kind="mergesort")
        if lf.empty:
            return lf
        if rf.empty:
            return lf.iloc[0:0]
        out = pd.merge_asof(lf, rf.drop(columns=[key]), on=ts,
                            direction="backward")
        return out[out[right_value_cols[0]].notna()]

    return u.groupby(key).map_groups(per_key, batch_format="pandas")


def sessionize(events, key: str, ts_col: str, gap_s: int):
    """Session windows per key: consecutive events with gaps ≤ gap_s form
    one session.  One row per session: key, session_start (epoch s),
    n_events, duration_s — the lag>gap → cumsum labeling trick, matching
    the SQL window-function formulation exactly."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        # normalize resolution first: parquet gives datetime64[us], test
        # literals give [ns] — int64 scale differs 1000× between them
        secs = (
            g[ts_col].astype("datetime64[us]").astype("int64") // 1_000_000
        ).to_numpy()
        import numpy as np

        new_session = np.ones(len(secs), dtype=bool)
        new_session[1:] = (secs[1:] - secs[:-1]) > gap_s
        sid = new_session.cumsum()
        df = pd.DataFrame({key: g[key].to_numpy(), "s": secs, "sid": sid})
        out = (
            df.groupby("sid")
            .agg(**{key: (key, "first"), "session_start": ("s", "min"),
                    "n_events": ("s", "size"),
                    "session_end": ("s", "max")})
            .reset_index(drop=True)
        )
        out["duration_s"] = (out.session_end - out.session_start).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["session_start"] = out["session_start"].astype("int64")
        return out[[key, "session_start", "n_events", "duration_s"]]

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def interval_join(left, right, left_ts: str, right_ts: str,
                  lower_us: int, upper_us: int,
                  left_cols: list[str], right_cols: list[str]):
    """Time-range (non-equi) join: emit one row per (l, r) pair with
    ``r.ts ∈ [l.ts + lower_us, l.ts + upper_us]`` (closed interval =
    SQL BETWEEN).  Ray Data has no inequality join, so this is the
    bucketed composition: left rows hash to their own time bucket of
    width W = 2·(upper−lower); right rows replicate into the ≤2 buckets
    whose left rows they can match; one keyed shuffle co-locates each
    bucket and a searchsorted range-scan emits pairs vectorized.
    Partitioning assumption: bucket population is bounded by event rate
    × W — a burst of rows inside one W-window all land in one group
    (salt the bucket key with a secondary hash if that ever skews)."""
    import numpy as np

    if upper_us <= lower_us:
        raise ValueError("empty interval")
    if set(left_cols) & set(right_cols):
        raise ValueError("left_cols and right_cols must be disjoint "
                         "(rename before joining)")
    w = 2 * (upper_us - lower_us)
    lsch, rsch = left.schema(), right.schema()
    types = {c: t for c, t in zip(lsch.names, lsch.types) if c in left_cols}
    types.update(
        {c: t for c, t in zip(rsch.names, rsch.types) if c in right_cols})
    out_schema = pa.schema([(c, types[c]) for c in left_cols + right_cols])

    def _pad(t: pa.Table, missing: list[str]) -> pa.Table:
        for c in missing:
            t = t.append_column(c, pa.nulls(len(t), types[c]))
        return t

    def tag_left(t: pa.Table) -> pa.Table:
        us = (t.column(left_ts).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        t = t.select(left_cols)
        t = _pad(t, right_cols)
        t = t.append_column("_ts", pa.array(us, pa.int64()))
        t = t.append_column("_b", pa.array(us // w, pa.int64()))
        return t.append_column("_is_l", pa.array(np.ones(len(t), dtype=bool)))

    def tag_right(t: pa.Table) -> pa.Table:
        us = (t.column(right_ts).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        # a right row at r matches left rows with l ∈ [r−upper, r−lower]
        # → replicate into buckets floor((r−upper)/w)..floor((r−lower)/w)
        # (≤2 by the W = 2·span choice; exact int64 floor division)
        lo_b = (us - upper_us) // w
        n_copies = ((us - lower_us) // w - lo_b + 1)
        idx = np.repeat(np.arange(len(us)), n_copies)
        offs = np.arange(len(idx)) - np.repeat(
            np.cumsum(n_copies) - n_copies, n_copies)
        t = t.select(right_cols).take(pa.array(idx))
        t = _pad(t, left_cols).select(left_cols + right_cols)
        t = t.append_column("_ts", pa.array(us[idx], pa.int64()))
        t = t.append_column("_b", pa.array(lo_b[idx] + offs, pa.int64()))
        return t.append_column("_is_l", pa.array(np.zeros(len(t), dtype=bool)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        is_l = g.column("_is_l").to_numpy(zero_copy_only=False)
        ls, rs = g.filter(pa.array(is_l)), g.filter(pa.array(~is_l))
        if not len(ls) or not len(rs):
            return out_schema.empty_table()
        r_us = rs.column("_ts").to_numpy(zero_copy_only=False)
        order = np.argsort(r_us, kind="mergesort")
        r_us = r_us[order]
        rs = rs.take(pa.array(order))
        l_us = ls.column("_ts").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(r_us, l_us + lower_us, side="left")
        hi = np.searchsorted(r_us, l_us + upper_us, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(len(l_us)), counts)
        ri = np.arange(len(li)) + np.repeat(lo - (np.cumsum(counts) - counts),
                                            counts)
        cols = {c: ls.column(c).take(pa.array(li)) for c in left_cols}
        cols.update({c: rs.column(c).take(pa.array(ri)) for c in right_cols})
        return pa.table(cols)

    both = lt.union(rt)
    return both.groupby("_b").map_groups(per_bucket, batch_format="pyarrow")


def rolling_sum_per_key(ds, key: str, ts_col: str, order_col: str,
                        value_col: str, window_rows: int,
                        out_col: str = "rolling_sum"):
    """Per-key rolling sum over the current + preceding ``window_rows−1``
    rows ordered by (ts, order_col) — SQL ``sum(v) OVER (PARTITION BY k
    ORDER BY ts, o ROWS BETWEEN w−1 PRECEDING AND CURRENT ROW)``.
    One keyed shuffle; cumsum-difference inside each group (no Python
    row loop)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values([ts_col, order_col], kind="mergesort")
        v = g[value_col].to_numpy()
        c = np.cumsum(v)
        roll = c.copy()
        if len(v) > window_rows:
            roll[window_rows:] = c[window_rows:] - c[:-window_rows]
        out = g[[key, order_col]].copy()
        out[out_col] = roll
        return out

    return ds.select_columns(
        [key, ts_col, order_col, value_col]
    ).groupby(key).map_groups(per_key, batch_format="pandas")


def max_gap_per_key(events, key: str, ts_col: str):
    """Largest inter-event gap per key (lag-window analytics): one row
    per key with ≥2 events — (key, max_gap_us:int64, n_gaps:int64).
    Consecutive differences of a sorted multiset are tie-order-invariant,
    so sorting on ts alone is deterministic.  One keyed shuffle carrying
    (key, ts) only; integer microseconds so the oracle hash is exact."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        us = np.sort(
            g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        )
        if len(us) < 2:
            return pd.DataFrame({key: [], "max_gap_us": [], "n_gaps": []}).astype(
                {key: g[key].dtype, "max_gap_us": "int64", "n_gaps": "int64"}
            )
        gaps = np.diff(us)
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "max_gap_us": [int(gaps.max())],
            "n_gaps": [int(len(gaps))],
        })

    return events.select_columns([key, ts_col]).groupby(key).map_groups(
        per_key, batch_format="pandas"
    )


def funnel_counts(ds, stages: list[str], user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  num_partitions: int | None = None):
    """Ordered funnel analysis: one row of per-stage user counts, where a
    user completes stage i+1 only with an event STRICTLY after their
    earliest completion of stage i (the product-analytics funnel).

    PARTITION-level plan (the exact_dedup trick): one ``user % P`` keyed
    shuffle of the thin (user, type, ts) projection, then each partition
    sorts once and walks user SEGMENTS with vectorized per-stage mins —
    P pandas dispatches total, never one per user (a per-user
    ``groupby(user).map_groups`` pays millions of group dispatches at
    crawl scale).  Each partition emits one int row of stage counts
    folded by a final Sum — output O(#stages)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .dedup_text import _auto_partitions

    num_partitions = _auto_partitions(num_partitions)
    thin = ds.select_columns([user_col, type_col, ts_col]).map_batches(
        lambda t: t.append_column(
            "_part",
            pa.array(t.column(user_col).to_numpy(zero_copy_only=False)
                     % num_partitions, pa.int64())),
        batch_format="pyarrow",
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col], kind="mergesort")
        users = g[user_col].to_numpy()
        types = g[type_col].to_numpy(dtype=object)
        ts = g[ts_col].to_numpy()
        bounds = np.flatnonzero(np.concatenate(
            [[True], users[1:] != users[:-1], [True]]))
        done = np.zeros(len(stages), dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            ut, uts = types[s:e], ts[s:e]
            cutoff = None
            for i, stage in enumerate(stages):
                sel = ut == stage
                if cutoff is not None:
                    sel = sel & (uts > cutoff)
                if not sel.any():
                    break
                cutoff = uts[sel].min()
                done[i] += 1
        return pd.DataFrame({f"n_{st}": [int(done[i])]
                             for i, st in enumerate(stages)})

    per = thin.groupby("_part").map_groups(per_partition,
                                           batch_format="pandas")
    sums = per.sum([f"n_{s}" for s in stages])
    return pa.table({f"n_{s}": pa.array([int(sums[f"sum(n_{s})"] or 0)],
                                        pa.int64())
                     for s in stages})

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

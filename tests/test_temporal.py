import numpy as np
import pandas as pd
import pytest

from open_thoughts_ray.ops.temporal import asof_join, sessionize


def _events_df():
    rows = []
    # user 1: purchases at t=100, 500; errors at 50, 200, 600
    for eid, (u, t, k) in enumerate([
        (1, 100, "purchase"), (1, 500, "purchase"),
        (1, 50, "error"), (1, 200, "error"), (1, 600, "error"),
        (2, 300, "purchase"), (2, 300, "error"),  # same-instant → match
        (3, 10, "error"),                          # no purchase → dropped
    ]):
        rows.append({"event_id": eid, "user_id": u,
                     "ts": pd.Timestamp(t, unit="s"), "event_type": k})
    return pd.DataFrame(rows)


def test_asof_join(ray_session):
    import ray.data as rd

    df = _events_df()
    errors = rd.from_pandas(df[df.event_type == "error"][["event_id", "user_id", "ts"]])
    purchases = rd.from_pandas(
        df[df.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "p_event_id"})
    )
    out = asof_join(errors, purchases, key="user_id", ts="ts",
                    right_value_cols=["p_event_id"]).to_pandas()
    got = {int(r.event_id): int(r.p_event_id) for r in out.itertuples()}
    # error@50 has no prior purchase → dropped; error@200 → purchase@100 (id 0);
    # error@600 → purchase@500 (id 1); user2 error@300 → purchase@300 (id 5)
    assert got == {3: 0, 4: 1, 6: 5}


def test_asof_join_rejects_collisions(ray_session):
    import ray.data as rd

    df = _events_df()
    a = rd.from_pandas(df[["event_id", "user_id", "ts"]])
    with pytest.raises(ValueError):
        asof_join(a, a, key="user_id", ts="ts", right_value_cols=["event_id"])


def test_sessionize(ray_session):
    import ray.data as rd

    ts = [0, 100, 200, 4000, 4100, 10000]  # user 1: 3 sessions at gap 1800
    df = pd.DataFrame({
        "user_id": [1] * 6 + [2],
        "ts": [pd.Timestamp(t, unit="s") for t in ts + [50]],
    })
    out = sessionize(rd.from_pandas(df), "user_id", "ts", gap_s=1800).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start").reset_index(drop=True)
    assert list(u1.session_start) == [0, 4000, 10000]
    assert list(u1.n_events) == [3, 2, 1]
    assert list(u1.duration_s) == [200, 100, 0]
    assert len(out[out.user_id == 2]) == 1

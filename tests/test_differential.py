"""Randomized differential tests: run the r3 normalizer/audit ops on
SEEDED random tables and compare against the same DuckDB SQL the driver
oracle uses — negatives, ties, out-of-range values and skewed
distributions that the fixed sf test tables never produce."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def _rand_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # heavy-tailed, signed, with exact ties
        "value": np.round(rng.standard_t(3, n) * 50, 2),
        "event_type": rng.choice(["a", "b", "c"], n),
    })


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_zscore_differential(ray_session, seed):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import zscore_column

    df = _rand_events(seed)
    got = (zscore_column(rd.from_pandas(df).repartition(5), "value",
                         "z_value")
           .to_pandas()[["event_id", "z_value"]]
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute("""
        WITH c AS (SELECT event_id,
                          CAST(floor(value*100 + 0.5) AS BIGINT) AS c
                   FROM events),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(c) AS BIGINT) AS s,
                     CAST(sum(c*c) AS BIGINT) AS ss FROM c),
        m AS (SELECT CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mu,
                     CAST(ss AS DOUBLE)/CAST(n AS DOUBLE)
                       - (CAST(s AS DOUBLE)/CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE)/CAST(n AS DOUBLE)) AS var
              FROM s)
        SELECT event_id,
               CASE WHEN m.var > 0
                    THEN (CAST(c.c AS DOUBLE) - m.mu) / sqrt(m.var)
                    ELSE 0.0 END AS z_value
        FROM c, m ORDER BY event_id
    """).fetchdf()
    assert np.array_equal(got["z_value"].to_numpy(),
                          exp["z_value"].to_numpy())


@pytest.mark.parametrize("seed", [3, 11])
def test_histogram_differential(ray_session, seed):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import histogram_column

    df = _rand_events(seed)
    got = (histogram_column(rd.from_pandas(df).repartition(4), "value",
                            -100.0, 100.0, 8)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute("""
        SELECT CAST(least(greatest(
                 floor((value - -100.0) / ((100.0 - -100.0) / 8.0)),
                 0), 7) AS BIGINT) AS bucket, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchdf()
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


@pytest.mark.parametrize("seed", [5, 19])
def test_percent_rank_differential(ray_session, seed):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import percent_rank_annotate

    rng = np.random.default_rng(seed)
    # small value domain → lots of ties
    df = pd.DataFrame({"event_id": np.arange(300, dtype=np.int64),
                       "v": rng.integers(-5, 6, 300)})
    got = (percent_rank_annotate(rd.from_pandas(df).repartition(3), "v")
           .to_pandas()[["event_id", "pr_v"]]
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT event_id, percent_rank() OVER (ORDER BY v) AS pr_v
        FROM t ORDER BY event_id
    """).fetchdf()
    assert np.array_equal(got["pr_v"].to_numpy(), exp["pr_v"].to_numpy())


@pytest.mark.parametrize("seed", [2, 13])
def test_minmax_and_robust_differential(ray_session, seed):
    import ray.data as rd

    from open_thoughts_ray.ops.relational import (minmax_normalize_column,
                                                  robust_scale_column)

    df = _rand_events(seed, n=257)
    con = duckdb.connect()
    con.register("events", df)

    got_mm = (minmax_normalize_column(rd.from_pandas(df).repartition(4),
                                      "value", "norm_value")
              .to_pandas()[["event_id", "norm_value"]]
              .sort_values("event_id").reset_index(drop=True))
    exp_mm = con.execute("""
        WITH s AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
        SELECT event_id,
               CASE WHEN s.hi - s.lo > 0
                    THEN (value - s.lo) / (s.hi - s.lo) ELSE 0.0 END
                 AS norm_value
        FROM events, s ORDER BY event_id
    """).fetchdf()
    assert np.array_equal(got_mm["norm_value"].to_numpy(),
                          exp_mm["norm_value"].to_numpy())

    got_rs = (robust_scale_column(rd.from_pandas(df).repartition(4),
                                  "value", "robust_value")
              .to_pandas()[["event_id", "robust_value"]]
              .sort_values("event_id").reset_index(drop=True))
    exp_rs = con.execute("""
        WITH s AS (SELECT quantile_cont(value, 0.25) AS q1,
                          quantile_cont(value, 0.5) AS med,
                          quantile_cont(value, 0.75) AS q3 FROM events)
        SELECT event_id,
               CASE WHEN s.q3 - s.q1 > 0
                    THEN (value - s.med) / (s.q3 - s.q1) ELSE 0.0 END
                 AS robust_value
        FROM events, s ORDER BY event_id
    """).fetchdf()
    assert np.array_equal(got_rs["robust_value"].to_numpy(),
                          exp_rs["robust_value"].to_numpy())

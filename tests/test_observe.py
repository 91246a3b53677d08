import pandas as pd
import pyarrow.compute as pc

from open_thoughts_ray.ops.observe import (
    counted,
    counters_reset,
    counters_snapshot,
)


def test_stage_counters_accumulate(ray_session):
    import ray.data as rd

    counters_reset()
    df = pd.DataFrame({"doc_id": range(10),
                       "n_chars": [5, 50, 5, 50, 5, 50, 5, 50, 5, 50]})
    ds = counted(rd.from_pandas(df).repartition(4), "ingest",
                 masks={"long": lambda t: pc.greater(t.column("n_chars"),
                                                     10)})
    out = ds.to_pandas()
    assert len(out) == 10  # pass-through, rows untouched
    snap = counters_snapshot()
    assert snap["ingest/rows"] == 10
    assert snap["ingest/long"] == 5
    # second stage accumulates separately
    counted(rd.from_pandas(df), "stage2").materialize()
    snap2 = counters_snapshot()
    assert snap2["stage2/rows"] == 10
    assert snap2["ingest/rows"] == 10
    counters_reset()
    assert counters_snapshot() == {}

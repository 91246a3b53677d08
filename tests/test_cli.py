"""python -m open_thoughts_ray — the ``ray job submit`` entrypoint."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from open_thoughts_ray.__main__ import main


def test_cli_yaml_runs_and_writes(ray_session, tmp_path, capsys):
    pq.write_table(
        pa.table({"id": pa.array(range(12), pa.int64()),
                  "output": pa.array([f"t {i}" for i in range(12)], pa.string())}),
        str(tmp_path / "in.parquet"),
    )
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        "operators:\n"
        "  - id: src\n"
        "    config: {type: parquet_source, path: \"{input_path}\"}\n"
        "  - id: up\n"
        "    config: {type: map_batches_function,\n"
        "             function: tests.yaml_udfs.uppercase_output}\n"
    )
    out_dir = str(tmp_path / "out")
    result = main(["yaml", str(cfg), "--out", out_dir,
                   "--format", f"input_path={tmp_path / 'in.parquet'}"])
    assert result["rows"] == 12
    # one JSON line on stdout (the job log contract)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["rows"] == 12
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    got = pa.concat_tables([pq.read_table(os.path.join(out_dir, f))
                            for f in files])
    assert sorted(got.column("output").to_pylist())[0] == "T 0"


def test_cli_flagship_smoke(ray_session, images_table, tmp_path, capsys):
    result = main(["flagship", "--table", images_table,
                   "--out", str(tmp_path / "dec"), "--cpus", "4",
                   "--chunk-fragments", "64"])
    assert result["rows"] == 10000
    assert result["kept"] > 0
    assert os.path.isdir(result["decisions_dir"])


def test_cli_build_index_and_ingest(ray_session, tmp_path):
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.__main__ import main

    rng = np.random.default_rng(55)

    def doc(n=30):
        return " ".join(f"w{int(v)}" for v in rng.integers(0, 500, n))

    seen_texts = [doc() for _ in range(10)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(seen_texts, pa.string()),
    }), tmp_path / "corpus.parquet")
    toks = seen_texts[0].split()
    toks[0] = "zz" + toks[0]
    pq.write_table(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([" ".join(toks), doc()], pa.string()),
    }), tmp_path / "delta.parquet")

    r1 = main(["build-index", "--table", str(tmp_path / "corpus.parquet"),
               "--out", str(tmp_path / "idx")])
    assert (tmp_path / "idx" / "index_meta.json").exists()
    r2 = main(["ingest", "--delta", str(tmp_path / "delta.parquet"),
               "--index", str(tmp_path / "idx"),
               "--out", str(tmp_path / "kept"),
               "--threshold", "0.5"])
    assert r2["rows_kept"] == 1
    kept = pq.read_table(str(tmp_path / "kept")).to_pandas()
    assert list(kept.doc_id) == [101]


def test_cli_yaml_partitioned_output(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq

    from open_thoughts_ray.__main__ import main

    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(6)], pa.string()),
        "source": pa.array(["a", "b"] * 3, pa.string()),
    }), tmp_path / "docs.parquet")
    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        "operators:\n"
        "  - id: src\n"
        f"    config: {{type: parquet_source, path: {tmp_path}/docs.parquet}}\n")
    r = main(["yaml", str(cfg), "--out", str(tmp_path / "out"),
              "--partition-by", "source"])
    assert r["rows"] == 6
    subdirs = {d for d in os.listdir(tmp_path / "out")
               if (tmp_path / "out" / d).is_dir()}
    assert {"source=a", "source=b"} <= subdirs
    back = pq.read_table(str(tmp_path / "out")).to_pandas()
    assert len(back) == 6

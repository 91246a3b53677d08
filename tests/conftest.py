import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def images_table(ray_session) -> str:
    """Deterministic benchmark table (FIXTURES.md F1 sf-test: N=10,000, 64 fragments)."""
    from open_thoughts_ray.fixtures.images import build_images_table

    return build_images_table(
        "/tmp/otr_pytest_images", n_rows=10000, n_parts=64, seed=42, use_ray=True
    )


@pytest.fixture(scope="session")
def oracle_frame(images_table):
    """Oracle labels for the session images table (pandas, sorted)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from open_thoughts_ray.io import lance_table
    from open_thoughts_ray.models import artifacts
    from open_thoughts_ray.oracle.reference_impl import oracle_labels

    imgs = pa.concat_tables(
        [pq.read_table(p) for p in lance_table.fragment_paths(images_table)]
    )
    lab = oracle_labels(imgs, artifacts.load_langid(), artifacts.load_lm())
    return lab.to_pandas().sort_values("image_id").reset_index(drop=True)

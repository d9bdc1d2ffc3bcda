import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (see repo instructions)."""
    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    if owned:  # never tear down a session this fixture did not create
        ray.shutdown()


@pytest.fixture(scope="session")
def smoke_fixture(tmp_path_factory):
    """Small deterministic crawl fixture shared across tests."""
    from spider_ray.datagen import write_fixture

    out = str(tmp_path_factory.mktemp("fixture_smoke"))
    return write_fixture(out, n_pages=2000, seed=42)

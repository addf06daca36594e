import logging

import pytest

import ray


@pytest.fixture(scope="session")
def ray_session():
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
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus(ray_session, tmp_path_factory):
    """Deterministic tiny corpus (serial generation) + gold tables."""
    import os

    from easyner_ray.sources.synthetic import ensure_corpus

    root = tmp_path_factory.mktemp("synth")
    os.environ["EASYNER_SYNTH_ROOT"] = str(root)
    out = ensure_corpus("tiny", 0.0002, with_gold=True)  # 50 conversations
    return out

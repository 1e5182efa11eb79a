"""Session-scoped Ray fixture: one ray.init per pytest session."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """80 synthetic pages as an Arrow table (covers every page family)."""
    from caligraph_ray.corpus import generate_pages_table
    return generate_pages_table(80, seed=42)

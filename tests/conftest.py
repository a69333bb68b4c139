import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract: library
    code never calls ray.init itself)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from raycrawl.corpus import ensure_corpus

    return ensure_corpus("tiny")


@pytest.fixture(scope="session")
def small_corpus():
    from raycrawl.corpus import ensure_corpus

    return ensure_corpus("small")

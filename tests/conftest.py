import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


# soak profile: HYPOTHESIS_PROFILE=soak pytest tests/test_property.py ...
# (used by long background fuzz runs; default profile stays fast for CI)
try:
    from hypothesis import settings as _hyp_settings

    _hyp_settings.register_profile("soak", max_examples=150, deadline=None,
                                   print_blob=True)
except ImportError:
    pass

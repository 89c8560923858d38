import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    # tiny test inputs split into one block per row; with the default
    # preserve_order=False the streaming executor may emit blocks in
    # COMPLETION order under load (reproduced ~1/150), flaking every
    # positional assert in the suite.  Tests assert plan order.
    from ray.data import DataContext
    DataContext.get_current().execution_options.preserve_order = True
    yield
    ray.shutdown()

import os

os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
# Ray's default worker niceness (15) deprioritizes workers vs any nice-0
# process; set before ray.init so the raylet spawns workers at nice 0.
os.environ.setdefault("RAY_worker_niceness", "0")

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
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
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Deterministic synthetic sequences fixture shared across tests."""
    from verify_ray.sources import synth

    d = tmp_path_factory.mktemp("synthdata")
    seq_dir = str(d / "sequences")
    res = synth.make_sequences(seq_dir, n_rows=5000, n_files=8, seed=42)
    manifest = synth.make_manifest(str(d))
    return {"dir": seq_dir, "result": res, "manifest": manifest, "root": str(d)}

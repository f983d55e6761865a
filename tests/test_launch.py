"""Unit tests for parallel/launch.maybe_initialize_distributed (VERDICT r2
weak #8): the three env-var configuration branches, with jax.distributed
monkeypatched — the real runtime needs an actual pod."""

import jax
import pytest

from lit_llama_tpu.parallel import launch


class _InitRecorder:
    def __init__(self, fail=False):
        self.calls = []
        self.fail = fail

    def __call__(self, **kwargs):
        self.calls.append(kwargs)
        if self.fail:
            raise RuntimeError("no coordinator reachable")


@pytest.fixture
def clean_launch(monkeypatch):
    """Reset the module latch and scrub the env vars the function reads."""
    monkeypatch.setattr(launch, "_initialized", False)
    for var in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    rec = _InitRecorder()
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    return rec


def test_no_config_returns_false(clean_launch):
    """Single-host (no coordinator, no pod hostnames): never touches
    jax.distributed."""
    assert launch.maybe_initialize_distributed() is False
    assert clean_launch.calls == []


def test_explicit_coordinator_branch(clean_launch, monkeypatch):
    """JAX_COORDINATOR + JAX_NUM_PROCESSES + JAX_PROCESS_ID are forwarded."""
    monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert launch.maybe_initialize_distributed() is True
    assert clean_launch.calls == [
        dict(coordinator_address="10.0.0.1:1234", num_processes=4, process_id=2)
    ]
    # the latch makes a second call a no-op
    assert launch.maybe_initialize_distributed() is False
    assert len(clean_launch.calls) == 1


def test_tpu_pod_auto_branch(clean_launch, monkeypatch):
    """On a Cloud TPU pod (TPU_WORKER_HOSTNAMES set) initialize() resolves the
    topology itself — called with no kwargs."""
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert launch.maybe_initialize_distributed() is True
    assert clean_launch.calls == [{}]


def test_init_failure_is_nonfatal(clean_launch, monkeypatch):
    """An unreachable coordinator degrades to single-host instead of raising."""
    rec = _InitRecorder(fail=True)
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "0")
    assert launch.maybe_initialize_distributed() is False
    assert len(rec.calls) == 1
    assert launch._initialized is False


def test_missing_process_vars_raise(clean_launch, monkeypatch):
    """A coordinator without JAX_NUM_PROCESSES/JAX_PROCESS_ID is a config
    error, not a silent single-host run."""
    monkeypatch.setenv("JAX_COORDINATOR", "10.0.0.1:1234")
    with pytest.raises(KeyError):
        launch.maybe_initialize_distributed()

"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's distributed tests require a real 8-GPU host
(tests/models/test_gpt_parallel.py:1-2 in /root/reference); JAX lets us run
the same sharded programs single-process on virtual CPU devices, so the full
TP/DP test matrix runs in CI on any machine.
"""

import os

# Force the CPU backend (the environment pins JAX_PLATFORMS to the TPU plugin;
# the config.update below overrides it after import) and expose 8 virtual
# devices for sharding tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: XLA compiles are the dominant test cost here.
# Key the directory by CPU feature set — XLA:CPU AOT executables compiled on
# a machine with different vector extensions SIGSEGV/SIGILL when loaded
# (observed: stale cache entries from an avx512-variant host crashed the
# suite mid-run).
import hashlib  # noqa: E402
try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((l for l in _f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_tag = hashlib.sha1(_flags.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "flash_attn"))


def install_reference_shims():
    """Make the torch reference importable on CPU: stub the CUDA-only /
    unavailable modules it imports behind try/except or at module scope."""
    import sys
    import types

    if "torchvision" not in sys.modules:
        import importlib.machinery
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        tv_ops = types.ModuleType("torchvision.ops")
        tv_ops.__spec__ = importlib.machinery.ModuleSpec("torchvision.ops", None)

        import torch

        class StochasticDepth(torch.nn.Module):
            def __init__(self, p, mode):
                super().__init__()
                self.p = p
                self.mode = mode

            def forward(self, x):
                assert self.p == 0 or not self.training
                return x

        tv_ops.StochasticDepth = StochasticDepth
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv_ops
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
        sys.path.insert(0, os.path.join(REFERENCE_PATH, "training"))

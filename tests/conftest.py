"""Test config: run everything on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; numerical tests want determinism and
no dependency on the (single) TPU chip being reachable.
"""

import os

# Real-TPU lane: GS_SLAM_TPU_TESTS=1 pytest -m tpu  keeps the chip backend
# so tests marked `tpu` exercise the actual Mosaic lowering (the round-1
# kernel fault shipped because kernels were only ever tested in CPU
# interpret mode).
TPU_LANE = os.environ.get("GS_SLAM_TPU_TESTS") == "1"

if not TPU_LANE:
    # Force-set (the container env pins JAX_PLATFORMS=axon for the chip).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    # The axon sitecustomize imports jax and pins the TPU platform before
    # conftest runs, so the env var alone is not enough — force via config.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    # Key the cache dir by jax version: entries serialized by a different
    # jax/PJRT build deserialize into segfaults, not cache misses.
    # KNOWN HAZARD (r5): a pytest process killed mid-compile (timeout,
    # OOM) can leave a partial cache entry that later SEGFAULTS the
    # cache-write path (jax compilation_cache.put_executable_and_time)
    # deterministically at the same test. If the suite starts dying at
    # a fixed percentage with a "Fatal Python error" in
    # put_executable_and_time, delete this directory and rerun.
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_cache_gsslam_{jax.__version__}"
    )
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        f"/tmp/jax_cache_gsslam_tpu_{jax.__version__}",
    )
# Persist EVERY compile: the e2e/multichip tests dispatch hundreds of small
# eager programs (scatter/reshard/KFStore updates) that individually sit
# under any seconds-level threshold but together dominate suite runtime.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

if not TPU_LANE:
    assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def no_persistent_cache():
    """Disable the persistent compilation cache for one test.

    The CPU PJRT serializer deterministically segfaults on the mono e2e
    mapping executable (a large lax.scan over interpret-mode pallas
    callbacks): first observed as a corrupted-entry abort on cache READ,
    then — after clearing the cache — as a segfault inside
    ``executable.serialize()`` on WRITE (jax 0.9.0,
    compilation_cache.py:265). Interpret-mode compiles are cheap, so the
    test loses nothing by skipping persistence.

    IMPORTANT: jax's cache object is a process-global singleton that is
    initialized lazily ONCE (compilation_cache.py:136-153); flipping
    ``jax_compilation_cache_dir`` after that first initialization is a
    no-op — the already-built cache keeps serving (and serializing)
    entries.  ``reset_cache()`` drops the singleton so the config change
    actually takes effect, both on entry and on restore."""
    from jax._src import compilation_cache as _cc

    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    _cc.reset_cache()
    yield
    jax.config.update("jax_compilation_cache_dir", old)
    _cc.reset_cache()

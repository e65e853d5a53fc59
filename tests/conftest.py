"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on a virtual CPU mesh, since tests
must run without TPU hardware (and the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

if not os.environ.get("CACTUS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

# persistent compile cache: the DP kernels jit once per shape bin
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cactus_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("CACTUS_TEST_TPU"):
    # The axon site hook force-registers the TPU backend at interpreter
    # startup and overrides JAX_PLATFORMS; re-pin the default platform to
    # CPU after import so tests run on the virtual 8-device CPU mesh.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

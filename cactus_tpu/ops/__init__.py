"""Device compute kernels (seed join, banded DP, chaining, pair-HMM)."""


def smart_put(total_work: int, threshold: int = 10_000_000,
              pallas_env: str | None = None):
    """Array-placement function routing small workloads to host CPU.

    Accelerator dispatch latency (remote tunnels especially) dwarfs the
    compute below ~threshold elementary operations; jit follows input
    placement, so committing inputs to the CPU device runs the kernel
    there with zero code changes.

    pallas_env: the opt-out env var of a hardware-validated Pallas
    backend (e.g. "CACTUS_PAIRHMM_PALLAS").  When that backend is
    active it will run on the TPU regardless, so CPU-committing the
    inputs would only add a wasted host round trip — keep them on the
    accelerator."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    pallas_on = (pallas_env is not None
                 and os.environ.get(pallas_env, "1") == "1")
    if (jax.devices()[0].platform == "tpu" and total_work < threshold
            and not pallas_on):
        cpu = jax.devices("cpu")[0]
        return lambda x: jax.device_put(np.asarray(x), cpu)
    return jnp.asarray

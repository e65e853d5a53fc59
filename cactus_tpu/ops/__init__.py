"""Device compute kernels (seed join, banded DP, chaining, pair-HMM)."""


def smart_put(total_work: int, threshold: int = 10_000_000):
    """Array-placement function routing small workloads to host CPU.

    Accelerator dispatch latency (remote tunnels especially) dwarfs the
    compute below ~threshold elementary operations; jit follows input
    placement, so committing inputs to the CPU device runs the kernel
    there with zero code changes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    if jax.devices()[0].platform == "tpu" and total_work < threshold:
        cpu = jax.devices("cpu")[0]
        return lambda x: jax.device_put(np.asarray(x), cpu)
    return jnp.asarray

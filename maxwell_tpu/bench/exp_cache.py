"""Probe: does the persistent JAX compilation cache work over the axon
PJRT tunnel? If yes, round-3 VERDICT item 3 (127 s cold compile at 64^3)
collapses to a one-time cost per shape, paid once per machine.

Run twice: first run compiles + writes cache; second run must show a
near-zero compile time for the same fn.

Usage: python -m maxwell_tpu.bench.exp_cache
"""

from __future__ import annotations

import sys
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device={dev}", file=sys.stderr, flush=True)

    @jax.jit
    def f(x):
        # something nontrivial so compile time is visible
        for _ in range(20):
            x = jnp.tanh(x @ x) + x
        return x

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.perf_counter()
    f(x).block_until_ready()
    t1 = time.perf_counter()
    print(f"first-call (compile+run): {t1 - t0:.3f}s", flush=True)

    import glob

    entries = glob.glob("/root/repo/.jax_cache/*")
    print(f"cache entries: {len(entries)}", flush=True)


if __name__ == "__main__":
    main()

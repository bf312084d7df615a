"""Microbenchmark the fused integrate kernel in isolation on the device.

Separates per-step fixed overhead (blocked-operand DMA issue, grid machinery)
from per-block compute: times the kernel at several BLOCKS_PER_STEP values
and at 0% activity (pure step overhead).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kernel_bench.py [A_log2] [b ...]
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from mrhash_tpu.ops import fused_integrate as FI
    from mrhash_tpu.ops import camera as C

    A = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 15)
    bs = [int(x) for x in sys.argv[2:]] or [8, 16]

    rows, cols = 680, 1200
    hpad, wpad = 688, 1280
    rng = np.random.default_rng(0)
    cam = C.make_camera(fx=600.0, fy=600.0, cx=599.5, cy=339.5,
                        rows=rows, cols=cols, min_depth=0.01, max_depth=30.0)

    img = jnp.asarray(rng.uniform(0.5, 5.0, (2, hpad, wpad)), jnp.float32)
    cam_vec = FI.make_cam_vec(cam, 0.01, 0.07, 0.0, 30.0, 1, 255, hpad, wpad)

    # plausible block positions: ~3m in front of the camera, spread out
    bpos = rng.integers(20, 45, (A, 3)).astype(np.int32)
    bpos[:, 2] = rng.integers(30, 40, (A,))
    meta = np.zeros((A, 128), np.int32)
    meta[:, :3] = bpos
    meta[:, 3] = 1
    meta_on = jnp.asarray(meta)
    meta_off = jnp.asarray(np.where(np.arange(128) == 3, 0, meta))

    pool_rows = jnp.asarray(
        rng.integers(0, 255, (A, FI.POOL_LANES)), jnp.int32)

    def clock(name, fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out[:1, :1].astype(jnp.float32)).block_until_ready())
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:28s} {dt:8.2f} ms   "
              f"({dt * 1e3 / (A // 1):.3f} us/slot)")
        return dt

    for b in bs:
        try:
            f = lambda m, p, b=b: FI.fused_integrate_pallas(
                img, cam_vec, m, p, b=b)
            clock(f"fused b={b} active", f, meta_on, pool_rows)
            clock(f"fused b={b} inactive", f, meta_off, pool_rows)
        except Exception as e:
            print(f"b={b} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

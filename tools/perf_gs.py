"""Stage timing of the GS render forward at reference resolution: preprocess,
tile-pair sort, per-tile gathers, blend scan, backward step.

Usage: python tools/perf_gs.py [--count 16384] [--rows 680 --cols 1200]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=16384)
    ap.add_argument("--rows", type=int, default=680)
    ap.add_argument("--cols", type=int, default=1200)
    ap.add_argument("--cap", type=int, default=128)
    args = ap.parse_args()

    from mrhash_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from mrhash_tpu.gs import rasterizer as R
    from mrhash_tpu.gs.model import GaussianModel, OptimizationParams
    from mrhash_tpu.gs import losses

    H, W = args.rows, args.cols
    G = args.count
    rng = np.random.default_rng(0)

    p = OptimizationParams(None)
    m = GaussianModel(p, capacity=G, initial_size=G)
    # synthetic cloud in front of the camera
    pos = np.concatenate([rng.uniform(-3, 3, (G, 2)),
                          rng.uniform(2, 8, (G, 1))], 1).astype(np.float32)
    col = rng.integers(0, 255, (G, 3)).astype(np.float32)
    sc = rng.uniform(0.02, 0.1, (G,)).astype(np.float32)
    m.add_gaussians(pos, col, sc)

    cam = dict(rot_w2c=jnp.eye(3), t_w2c=jnp.zeros(3),
               fx=jnp.float32(600.0 * W / 1200), fy=jnp.float32(600.0 * W / 1200),
               cx=jnp.float32(W / 2 - .5), cy=jnp.float32(H / 2 - .5),
               W=W, H=H)
    active = m.active_mask
    params = m.params
    cap = args.cap

    K = 10

    def fence(out):
        # axon's block_until_ready returns early; a host scalar fetch is the
        # only reliable fence (project memory / DESIGN.md)
        x = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(x[:1].astype(jnp.float32) if x.ndim else x))

    def clock(name, fn, *a, n=K):
        out = fn(*a)
        fence(out)
        out = fn(*a)      # second warmup: donation-steady execution
        fence(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        fence(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:28s} {dt:8.2f} ms")
        return out

    grid_x = (W + R.BLOCK - 1) // R.BLOCK
    grid_y = (H + R.BLOCK - 1) // R.BLOCK
    n_tiles = grid_x * grid_y
    print(f"# G={G}, tiles={n_tiles}, cap={cap}", file=sys.stderr)

    @jax.jit
    def f_pre(params):
        attrs = R.preprocess(params, active, cam, p.sh_degree)
        return attrs["xy"]
    clock("preprocess", f_pre, params)

    attrs = jax.jit(lambda q: R.preprocess(q, active, cam, p.sh_degree))(
        params)

    @jax.jit
    def f_pairs(attrs):
        tile, depth, gidx, ok = R._tile_pairs(attrs, grid_x, grid_y)
        return jnp.sum(jnp.where(ok, tile, 0))
    clock("tile_pairs", f_pairs, attrs)

    tile, depth, gidx, ok = jax.jit(
        lambda a: R._tile_pairs(a, grid_x, grid_y))(attrs)

    @jax.jit
    def f_sort(tile, depth, gidx, ok):
        st = jnp.where(ok, tile, n_tiles)
        st, dep, gi = jax.lax.sort((st, depth, gidx), num_keys=2)
        return jnp.sum(gi[:8])
    clock(f"sort[{tile.shape[0]/1e6:.1f}M pairs]", f_sort, tile, depth,
          gidx, ok)

    st = jnp.where(ok, tile, n_tiles)
    st, dep, gi = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c),
                                                       num_keys=2))(
        st, depth, gidx)

    @jax.jit
    def f_gather(st, gi, attrs):
        bounds = jnp.searchsorted(st, jnp.arange(n_tiles + 1,
                                                 dtype=jnp.int32))
        starts = bounds[:n_tiles]
        counts = bounds[1:] - bounds[:-1]
        k = jnp.arange(cap, dtype=jnp.int32)
        lidx = starts[:, None] + k[None, :]
        lvalid = k[None, :] < jnp.minimum(counts[:, None], cap)
        lidx = jnp.where(lvalid, lidx, 0)
        gl = gi[lidx]
        attr9 = jnp.concatenate(
            [attrs["xy"], attrs["conic"], attrs["opacity"][:, None],
             attrs["rgb"]], axis=1)
        ta = attr9[gl]
        return (ta[..., 0:2], ta[..., 2:5], ta[..., 5], ta[..., 6:9],
                lvalid)
    clock("ranges+tile gathers", f_gather, st, gi, attrs)

    txy, tconic, topac, trgb, lvalid = jax.jit(f_gather.__wrapped__)(
        st, gi, attrs) if hasattr(f_gather, "__wrapped__") else f_gather(
        st, gi, attrs)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    pin = jnp.arange(R.BLOCK * R.BLOCK, dtype=jnp.int32)
    pixf = jnp.stack(
        [((tids % grid_x) * R.BLOCK)[:, None] + (pin % R.BLOCK)[None, :],
         ((tids // grid_x) * R.BLOCK)[:, None] + (pin // R.BLOCK)[None, :]],
        -1).astype(jnp.float32)

    @jax.jit
    def f_blend(txy, tconic, topac, trgb, lvalid):
        Tf, Cf = R.blend_tiles(txy, tconic, topac, trgb,
                               lvalid.astype(jnp.float32), pixf)
        return jnp.sum(Cf[:1, :8])
    clock("blend fwd (scan)", f_blend, txy, tconic, topac, trgb, lvalid)

    @jax.jit
    def f_blend_grad(txy, tconic, topac, trgb, lvalid):
        def loss(a, b, c, d):
            Tf, Cf = R.blend_tiles(a, b, c, d, lvalid.astype(jnp.float32),
                                   pixf)
            return jnp.sum(Cf) + jnp.sum(Tf)
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(txy, tconic, topac, trgb)
        return g[0]
    clock("blend fwd+bwd", f_blend_grad, txy, tconic, topac, trgb, lvalid)

    @jax.jit
    def f_render(params):
        img, _ = R.render(params, active, cam, jnp.zeros(3), p.sh_degree,
                          max_per_tile=cap)
        return jnp.sum(img[:, :2, :8])
    clock("full render fwd", f_render, params)


if __name__ == "__main__":
    main()

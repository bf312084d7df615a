"""GaussianModel: parameter store + per-group Adam (optax), preallocated.

Re-derivation of mrhash/src/gs/gaussian.{cuh,cu}: parameters _xyz /
_scaling(log) / _rotation(quat, w=1) / _opacity(inv-sigmoid 0.5) /
_features_dc / _features_rest (SH degree 3), per-group Adam learning rates
(gaussian.cu:213-238, eps 1e-15), incremental densification
(cat_tensors_to_optimizer, :284-306), PLY export (:260-282).

TPU-native shape policy: instead of torch's concat-growing tensors (a
recompile per frame under jit), capacity is preallocated and an active-count
scalar grows; new gaussians are written into fresh slots whose Adam moments
are already zero — exactly what cat'ing zero-initialized exp_avg achieves in
the reference.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrhash_tpu.gs.rasterizer import rgb2sh


class OptimizationParams:
    """configurations/params.json schema (gaussian.cu:21-59)."""

    DEFAULTS = dict(sh_degree=3, position_lr=0.00016, feature_lr=0.0025,
                    opacity_lr=0.05, scaling_lr=0.001, rotation_lr=0.001,
                    lambda_dssim=0.2, qtree_thresh=0.1,
                    qtree_min_pixel_size=1, kf_thresh=50, kf_iters=5,
                    non_kf_iters=3, random_kf_num=2, global_iters=10,
                    keep_all_frames=False)

    def __init__(self, path=None):
        vals = dict(self.DEFAULTS)
        if path:
            with open(path) as f:
                vals.update(json.load(f))
        for k, v in vals.items():
            setattr(self, k, v)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


class GaussianModel:
    def __init__(self, optim_params: OptimizationParams,
                 capacity: int = 1 << 20):
        self.p = optim_params
        self.capacity = int(capacity)
        d = self.p.sh_degree
        self.n_rest = (d + 1) ** 2 - 1
        cap = self.capacity
        self.params = dict(
            xyz=jnp.zeros((cap, 3), jnp.float32),
            scaling=jnp.zeros((cap, 3), jnp.float32),
            rotation=jnp.zeros((cap, 4), jnp.float32).at[:, 0].set(1.0),
            opacity=jnp.zeros((cap, 1), jnp.float32),
            f_dc=jnp.zeros((cap, 1, 3), jnp.float32),
            f_rest=jnp.zeros((cap, self.n_rest, 3), jnp.float32),
        )
        self.count = 0
        self.background = jnp.zeros((3,), jnp.float32)
        # per-group Adam with the reference's lrs (gaussian.cu:215-238)
        lrs = dict(xyz=self.p.position_lr, f_dc=self.p.feature_lr,
                   f_rest=self.p.feature_lr / 20.0,
                   scaling=self.p.scaling_lr, rotation=self.p.rotation_lr,
                   opacity=self.p.opacity_lr)
        self.tx = optax.multi_transform(
            {k: optax.adam(lr, eps=1e-15) for k, lr in lrs.items()},
            {k: k for k in self.params})
        self.opt_state = self.tx.init(self.params)

    @property
    def active_mask(self):
        return jnp.arange(self.capacity) < self.count

    def add_gaussians(self, positions, colors_u8, scales):
        """Add_gaussians (gaussian.cu:147-211): new slots initialized with
        log-scale (isotropic), identity quat, opacity inv-sigmoid(0.5), DC
        SH from RGB."""
        n = positions.shape[0]
        if n == 0:
            return
        if self.count + n > self.capacity:
            n = self.capacity - self.count
            if n <= 0:
                print("GaussianModel | capacity exceeded, dropping gaussians")
                return
            positions, colors_u8, scales = (positions[:n], colors_u8[:n],
                                            scales[:n])
        sl = slice(self.count, self.count + n)
        p = self.params
        fused = rgb2sh(jnp.asarray(colors_u8, jnp.float32) / 255.0)
        p["xyz"] = p["xyz"].at[sl].set(jnp.asarray(positions, jnp.float32))
        p["scaling"] = p["scaling"].at[sl].set(
            jnp.log(jnp.asarray(scales, jnp.float32))[:, None].repeat(3, 1))
        p["rotation"] = p["rotation"].at[sl].set(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32))
        p["opacity"] = p["opacity"].at[sl].set(
            inverse_sigmoid(jnp.float32(0.5)))
        p["f_dc"] = p["f_dc"].at[sl].set(fused[:, None, :])
        p["f_rest"] = p["f_rest"].at[sl].set(0.0)
        self.count += n

    def save_ply(self, path, iteration=0):
        """Save_ply (gaussian.cu:260-282): binary PLY with the Inria
        attribute layout."""
        import os
        n = self.count
        p = jax.device_get(jax.tree.map(lambda x: x[:n], self.params))
        names = (["x", "y", "z", "nx", "ny", "nz"]
                 + [f"f_dc_{i}" for i in range(3)]
                 + [f"f_rest_{i}" for i in range(3 * self.n_rest)]
                 + ["opacity"]
                 + [f"scale_{i}" for i in range(3)]
                 + [f"rot_{i}" for i in range(4)])
        cols = np.concatenate([
            p["xyz"], np.zeros((n, 3), np.float32),
            p["f_dc"].transpose(0, 2, 1).reshape(n, -1),
            p["f_rest"].transpose(0, 2, 1).reshape(n, -1),
            p["opacity"], p["scaling"], p["rotation"]], axis=1)
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, f"point_cloud_{iteration}.ply")
        rec = np.rec.fromarrays(
            [cols[:, i].astype("<f4") for i in range(cols.shape[1])],
            names=",".join(names))
        with open(fname, "wb") as fh:
            header = ["ply", "format binary_little_endian 1.0",
                      f"element vertex {n}"]
            header += [f"property float {nm}" for nm in names]
            header += ["end_header", ""]
            fh.write("\n".join(header).encode())
            rec.tofile(fh)
        return fname

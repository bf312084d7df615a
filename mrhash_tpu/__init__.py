"""mrhash-tpu: TPU-native hash-based 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of rvp-group/mrhash
("Resolution Where It Counts", ACM TOG 2025): variance-adaptive multi-
resolution TSDF fusion in a spatial-hash voxel grid, host streaming for
unbounded scenes, Transvoxel marching-cubes meshing, and online 3D Gaussian
Splatting — designed for TPU (static shapes, batched sort/scan algorithms
instead of atomics, device<->host streaming instead of cudaMemcpy).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing mrhash_tpu must not pull jax-heavy modules for tools
    # that only need params/tables.
    if name == "GeoWrapper":
        from mrhash_tpu.geowrapper import GeoWrapper
        return GeoWrapper
    raise AttributeError(name)

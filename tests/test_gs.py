"""Gaussian Splatting stack tests: quad-tree stats, rasterizer forward
sanity, gradient flow, and an overfit-one-frame PSNR climb (the reference's
online-optimization behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrhash_tpu.gs import losses
from mrhash_tpu.gs.model import GaussianModel, OptimizationParams
from mrhash_tpu.gs.quadtree import build_qtree
from mrhash_tpu.gs.rasterizer import render, rgb2sh


def test_qtree_flat_vs_textured():
    rng = np.random.default_rng(0)
    flat = jnp.full((64, 64, 3), 100, jnp.uint8)
    leaves, valid, n, overflow = build_qtree(flat, threshold=0.1,
                                             min_pixel_size=1,
                                             max_leaves=4096)
    n_flat = int(n)
    assert n_flat == 1  # uniform image: root is a leaf
    textured = jnp.asarray(rng.integers(0, 255, (64, 64, 3)), jnp.uint8)
    _, _, n2, _ = build_qtree(textured, threshold=0.1, min_pixel_size=1,
                              max_leaves=4096)
    assert int(n2) > 100  # noise subdivides deeply
    # leaves tile the image: total area preserved
    leaves3, valid3, n3, _ = build_qtree(textured, threshold=1e9,
                                         min_pixel_size=1, max_leaves=4096)
    assert int(n3) == 1


def test_qtree_leaf_areas_cover_image():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 255, (48, 80, 3)), jnp.uint8)
    leaves, valid, n, overflow = build_qtree(img, threshold=3.0,
                                             min_pixel_size=2,
                                             max_leaves=8192)
    lv = np.asarray(leaves)[np.asarray(valid)]
    assert int(overflow) == 0
    assert lv[:, 2].min() > 0 and lv[:, 3].min() > 0
    assert np.sum(lv[:, 2] * lv[:, 3]) == 48 * 80


def make_model(n=64, seed=0, capacity=256, anisotropic=False):
    rng = np.random.default_rng(seed)
    p = OptimizationParams()
    m = GaussianModel(p, capacity=capacity)
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    pos[:, 2] += 3.0
    cols = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    scales = np.full((n,), 0.08, np.float32)
    m.add_gaussians(pos, cols, scales)
    if anisotropic:
        # rotation gradients vanish for isotropic gaussians (sigma = s^2 I);
        # perturb per-axis log-scales so dSigma/dq != 0
        key = jax.random.PRNGKey(seed)
        m.params["scaling"] = m.params["scaling"] + 0.3 * jax.random.normal(
            key, m.params["scaling"].shape)
    return m


def cam_dict(H=64, W=64, f=60.0):
    return dict(rot_w2c=jnp.eye(3, dtype=jnp.float32),
                t_w2c=jnp.zeros(3, jnp.float32),
                fx=jnp.float32(f), fy=jnp.float32(f),
                cx=jnp.float32(W / 2 - 0.5), cy=jnp.float32(H / 2 - 0.5),
                W=W, H=H)


def test_render_forward():
    m = make_model()
    cam = cam_dict()
    img, radii = render(m.params, m.active_mask, cam, m.background, 3)
    assert img.shape == (3, 64, 64)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.max() > 0.05          # something rendered
    assert (np.asarray(radii)[:m.count] > 0).any()
    # empty background stays at bg color (0)
    assert arr.min() >= 0.0


def test_render_gradients_flow():
    m = make_model(anisotropic=True)
    cam = cam_dict()
    gt = jnp.zeros((3, 64, 64), jnp.float32)

    def loss(params):
        img, _ = render(params, m.active_mask, cam, m.background, 3)
        return losses.l1_loss(img, gt)

    g = jax.grad(loss)(m.params)
    for k in ("xyz", "opacity", "f_dc", "scaling", "rotation"):
        gn = float(jnp.abs(g[k]).sum())
        assert np.isfinite(gn) and gn > 0, k


def test_overfit_single_frame_psnr_improves():
    from mrhash_tpu.gs.container import GaussianContainer
    m = make_model(n=128, capacity=256)
    cam = cam_dict()
    # ground truth = render of a perturbed copy (realizable target)
    gt, _ = render(jax.tree.map(lambda x: x, m.params), m.active_mask, cam,
                   m.background, 3)
    gt = jax.lax.stop_gradient(gt)
    # perturb the model and recover by optimization
    key = jax.random.PRNGKey(0)
    m.params["xyz"] = m.params["xyz"] + 0.02 * jax.random.normal(
        key, m.params["xyz"].shape)

    import optax
    tx = m.tx
    opt_state = m.opt_state

    def loss_fn(params):
        img, _ = render(params, m.active_mask, cam, m.background, 3)
        return losses.l1_loss(img, gt)

    @jax.jit
    def step(params, opt_state):
        l, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = tx.update(g, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, up), opt_state, l

    params = m.params
    l0 = float(loss_fn(params))
    for _ in range(30):
        params, opt_state, l = step(params, opt_state)
    assert float(l) < l0 * 0.9


def test_losses():
    a = jnp.zeros((3, 32, 32))
    b = jnp.ones((3, 32, 32)) * 0.5
    assert float(losses.l1_loss(a, b)) == pytest.approx(0.5)
    assert float(losses.ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert float(losses.ssim(a, b)) < 0.5
    assert float(losses.psnr(a, a)) > 100


def test_model_save_ply(tmp_path):
    m = make_model(n=16)
    f = m.save_ply(str(tmp_path), 7)   # background writer thread
    m.wait_ply()
    data = open(f, "rb").read()
    assert b"element vertex 16" in data
    assert b"f_rest_44" in data  # SH degree 3: 15 coeffs x 3 channels


def test_blend_custom_vjp_matches_autodiff():
    """The hand-written back-to-front blend backward (rasterizer.blend_tiles,
    mirrors backward.cu:386-594) must match autodiff through the forward
    scan — including the alpha clamp, the skip masks, and the T_fin/bg
    pathway."""
    from mrhash_tpu.gs import rasterizer as R

    rng = np.random.default_rng(0)
    T, K = 3, 7
    P = R.BLOCK * R.BLOCK
    txy = jnp.asarray(rng.uniform(0, R.BLOCK, (T, K, 2)), jnp.float32)
    # positive-definite-ish conics, a few large alphas to hit clamps
    a = rng.uniform(0.05, 0.6, (T, K))
    c = rng.uniform(0.05, 0.6, (T, K))
    b = rng.uniform(-0.1, 0.1, (T, K))
    tconic = jnp.asarray(np.stack([a, b, c], -1), jnp.float32)
    topac = jnp.asarray(rng.uniform(0.2, 1.2, (T, K)), jnp.float32)
    trgb = jnp.asarray(rng.uniform(0, 1, (T, K, 3)), jnp.float32)
    lvalid = jnp.asarray(rng.uniform(0, 1, (T, K)) > 0.2, jnp.float32)
    pin = jnp.arange(P, dtype=jnp.int32)
    pixf = jnp.stack([jnp.broadcast_to((pin % R.BLOCK).astype(jnp.float32),
                                       (T, P)),
                      jnp.broadcast_to((pin // R.BLOCK).astype(jnp.float32),
                                       (T, P))], -1)

    def loss_custom(txy, tconic, topac, trgb):
        Tf, Cf = R.blend_tiles(txy, tconic, topac, trgb, lvalid, pixf)
        return jnp.sum(Cf * Cf) + 2.0 * jnp.sum(Tf)

    def loss_auto(txy, tconic, topac, trgb):
        (Tf, Cf), _ = R._blend_forward(txy, tconic, topac, trgb, lvalid,
                                       pixf)
        return jnp.sum(Cf * Cf) + 2.0 * jnp.sum(Tf)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(txy, tconic, topac,
                                                     trgb)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(txy, tconic, topac, trgb)
    for name, x, y in zip(("xy", "conic", "opac", "rgb"), gc, ga):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
    # the forward outputs themselves agree
    Tf1, Cf1 = R.blend_tiles(txy, tconic, topac, trgb, lvalid, pixf)
    (Tf2, Cf2), _ = R._blend_forward(txy, tconic, topac, trgb, lvalid, pixf)
    np.testing.assert_allclose(np.asarray(Tf1), np.asarray(Tf2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Cf1), np.asarray(Cf2), atol=1e-7)


def test_blend_pallas_matches_xla():
    """The Pallas tile-blend kernels (gs/blend_pallas.py) must reproduce the
    XLA scan blend bit-for-bit-ish (same gates, same order) in forward AND
    backward, including non-multiple-of-batch tile counts (padding path).
    Runs the kernels in interpret mode on CPU."""
    from mrhash_tpu.gs import blend_pallas as BP
    from mrhash_tpu.gs import rasterizer as R

    rng = np.random.default_rng(1)
    T, K = 11, 16   # T not a multiple of TILE_BATCH; K multiple of UNROLL
    P = R.BLOCK * R.BLOCK
    txy = jnp.asarray(rng.uniform(0, R.BLOCK, (T, K, 2)), jnp.float32)
    a = rng.uniform(0.05, 0.6, (T, K))
    c = rng.uniform(0.05, 0.6, (T, K))
    b = rng.uniform(-0.1, 0.1, (T, K))
    tconic = jnp.asarray(np.stack([a, b, c], -1), jnp.float32)
    topac = jnp.asarray(rng.uniform(0.2, 1.2, (T, K)), jnp.float32)
    trgb = jnp.asarray(rng.uniform(0, 1, (T, K, 3)), jnp.float32)
    lvalid = jnp.asarray(rng.uniform(0, 1, (T, K)) > 0.2, jnp.float32)
    pin = jnp.arange(P, dtype=jnp.int32)
    pixf = jnp.stack([jnp.broadcast_to((pin % R.BLOCK).astype(jnp.float32),
                                       (T, P)),
                      jnp.broadcast_to((pin // R.BLOCK).astype(jnp.float32),
                                       (T, P))], -1)

    Tf_x, Cf_x = R.blend_tiles(txy, tconic, topac, trgb, lvalid, pixf)
    Tf_p, Cf_p = BP.blend_tiles(True, txy, tconic, topac, trgb, lvalid,
                                pixf)
    np.testing.assert_allclose(np.asarray(Tf_p), np.asarray(Tf_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Cf_p), np.asarray(Cf_x), atol=1e-6)

    def loss_x(txy, tconic, topac, trgb):
        Tf, Cf = R.blend_tiles(txy, tconic, topac, trgb, lvalid, pixf)
        return jnp.sum(Cf * Cf) + 2.0 * jnp.sum(Tf)

    def loss_p(txy, tconic, topac, trgb):
        Tf, Cf = BP.blend_tiles(True, txy, tconic, topac, trgb, lvalid,
                                pixf)
        return jnp.sum(Cf * Cf) + 2.0 * jnp.sum(Tf)

    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(txy, tconic, topac, trgb)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(txy, tconic, topac, trgb)
    for name, x, y in zip(("xy", "conic", "opac", "rgb"), gx, gp):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_compact_pairs_match_dense():
    """The exact-count pair expansion (_tile_pairs_compact) must produce a
    bit-identical image to the dense 64-slot form whenever nothing drops:
    both emit pairs gaussian-major and row-major within a rect, and
    lax.sort is stable, so the per-tile front-most-K selection is the same
    list.  Also checks gradients match."""
    m = make_model(n=96, seed=3, anisotropic=True)
    cam = cam_dict()
    img_c, rad_c = render(m.params, m.active_mask, cam, m.background, 3,
                          pairs="compact")
    img_d, rad_d = render(m.params, m.active_mask, cam, m.background, 3,
                          pairs="dense")
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_d))
    np.testing.assert_array_equal(np.asarray(rad_c), np.asarray(rad_d))

    gt = jnp.zeros((3, 64, 64), jnp.float32)

    def loss(params, pairs):
        img, _ = render(params, m.active_mask, cam, m.background, 3,
                        pairs=pairs)
        return losses.l1_loss(img, gt)

    gc_ = jax.grad(lambda p: loss(p, "compact"))(m.params)
    gd_ = jax.grad(lambda p: loss(p, "dense"))(m.params)
    for k in gc_:
        np.testing.assert_array_equal(np.asarray(gc_[k]),
                                      np.asarray(gd_[k]))

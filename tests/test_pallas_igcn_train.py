"""Fused Pallas implicit (IGCN) TRAIN path vs the pure-JAX oracle.

Verification chain (mirrors the standard family's, tests/test_pallas_train.py):
kernels ≡ ``train_ref.layers_forward`` (here, inside the differentiable
fixed-point scan — forward AND gradients); ``layers_forward`` ≡ flax stack
(tests/test_train_ref.py); the solver is the SAME code the module runs
(``models/solvers.py``); the train-mode BatchNorm is unit-checked against
``IGCN._bn`` directly.  Reference workload: ``runners/implicit_pose.py:270-420``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.ops import train_ref as tr
from diffpose_tpu.ops.pallas_igcn_train import (
    make_pallas_igcn_train_fn,
    make_pallas_implicit_train_step,
)

B = 16
L, HEADS, HID = 2, 4, 96


@pytest.fixture(scope="module")
def setup():
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = IGCN(
        basis=basis, hid_dim=HID, num_layers=L, num_heads=HEADS,
        solver="anderson", max_iterations=3, min_iterations=3, anderson_m=3,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x[:2], t[:2]
    )
    masks = tr.make_dropout_masks(
        jax.random.PRNGKey(5), num_layers=L, n_pts=17, batch=B,
        num_heads=HEADS, hid_dim=HID)
    return basis, model, variables["params"], variables["batch_stats"], x, t, masks


def _oracle_stack(basis):
    bj = jnp.asarray(basis, jnp.float32)

    def stack(w, h0, tp, masks):
        return tr.layers_forward(
            w, h0, tp, masks, basis=bj,
            num_layers=L, num_heads=HEADS, hid_dim=HID)

    return stack


def _fns(basis, model):
    fused = make_pallas_igcn_train_fn(
        model, block_b_fwd=8, block_b_bwd=8, group=17,
        precision=None, interpret=True)
    oracle = make_pallas_igcn_train_fn(model, stack_override=_oracle_stack(basis))
    return fused, oracle


def test_fused_fn_matches_oracle(setup):
    basis, model, params, bstats, x, t, masks = setup
    fused, oracle = _fns(basis, model)
    out_k, aux_k, bs_k = fused(params, bstats, x, t, masks)
    out_o, aux_o, bs_o = oracle(params, bstats, x, t, masks)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_o), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(aux_k["fixed_point"]), np.asarray(aux_o["fixed_point"]), atol=2e-4)
    assert int(aux_k["iterations"]) == int(aux_o["iterations"]) == 3
    for k in ("bn_mean", "bn_var"):
        np.testing.assert_allclose(
            np.asarray(bs_k[k]), np.asarray(bs_o[k]), atol=1e-5)


@pytest.mark.parametrize("solver,iters", [("damped", 3), ("anderson", 2)])
def test_fused_grads_match_oracle(setup, solver, iters):
    """Kernel backward ≡ jax.grad of the oracle through the solve.

    Grad parity is asserted where the solve's derivative is
    well-conditioned: the damped solver (any depth) and Anderson before
    the history fills.  At FULL Anderson history the m×m Gram solve's
    eigenvalues span [λ=0.1, ‖dF‖²≈1e4], so d(α)/d(dF) amplifies a
    ~1e-7 forward difference into O(1) relative grad differences — true
    for ANY two float implementations (verified: two pure-JAX autodiff
    paths diverge identically; the reference backprops through the same
    torch.linalg.solve) — covered by the finiteness test below instead.
    """
    basis, _, _, bstats, x, t, masks = setup
    model = IGCN(
        basis=basis, hid_dim=HID, num_layers=L, num_heads=HEADS,
        solver=solver, max_iterations=iters, min_iterations=iters, anderson_m=3,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x[:2], t[:2])["params"]
    fused, oracle = _fns(basis, model)
    e = jnp.asarray(np.random.default_rng(1).normal(size=(B, 17, 5)), jnp.float32)

    def loss(fn):
        def inner(p):
            out, _, _ = fn(p, bstats, x, t, masks)
            return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))
        return inner

    g_k = jax.grad(loss(fused))(params)
    g_o = jax.grad(loss(oracle))(params)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(g_o)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(g_k)
    for (pr, vo), (_, vk) in zip(flat_o, flat_k):
        absd = float(jnp.abs(vo - vk).max())
        if absd < 1e-5:  # k.bias grads are mathematically 0
            continue
        rel = absd / (float(jnp.abs(vo).max()) + 1e-8)
        assert rel < 1e-3, (jax.tree_util.keystr(pr), rel)


def test_fused_grads_finite_at_full_history(setup):
    """Full-history Anderson (the production config): grads must be finite
    and same order of magnitude as the oracle's (see conditioning note)."""
    basis, model, params, bstats, x, t, masks = setup
    fused, oracle = _fns(basis, model)
    e = jnp.asarray(np.random.default_rng(1).normal(size=(B, 17, 5)), jnp.float32)

    def loss(fn):
        def inner(p):
            out, _, _ = fn(p, bstats, x, t, masks)
            return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))
        return inner

    g_k = jax.grad(loss(fused))(params)
    g_o = jax.grad(loss(oracle))(params)
    nk = float(jnp.sqrt(sum(jnp.sum(v * v) for v in jax.tree_util.tree_leaves(g_k))))
    no = float(jnp.sqrt(sum(jnp.sum(v * v) for v in jax.tree_util.tree_leaves(g_o))))
    assert np.isfinite(nk) and np.isfinite(no)
    assert 0.2 < nk / no < 5.0, (nk, no)


def test_warm_start_blend_matches_oracle(setup):
    basis, model, params, bstats, x, t, masks = setup
    fused, oracle = _fns(basis, model)
    z0 = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, 17, HID)), jnp.float32)
    w = jnp.asarray(0.7, jnp.float32)
    out_k, aux_k, _ = fused(params, bstats, x, t, masks, z0, w)
    out_o, aux_o, _ = oracle(params, bstats, x, t, masks, z0, w)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_o), atol=2e-4)
    # zero weight reduces exactly to the cold start
    cold, _, _ = oracle(params, bstats, x, t, masks)
    blend0, _, _ = oracle(params, bstats, x, t, masks, z0, jnp.zeros((), jnp.float32))
    np.testing.assert_allclose(np.asarray(blend0), np.asarray(cold), atol=1e-6)


def test_train_bn_matches_module(setup):
    """The fn's inline train-mode BatchNorm ≡ IGCN._bn(train=True) on the
    matching layout ([N,B,H] joint-major vs the module's [B,J,H])."""
    basis, model, params, bstats, x, t, masks = setup
    h = jnp.asarray(np.random.default_rng(3).normal(size=(B, 17, HID)), jnp.float32)
    (y_mod, (mean_mod, var_mod)) = model.apply(
        {"params": params, "batch_stats": bstats}, h, True, method=IGCN._bn)

    hj = jnp.transpose(h, (1, 0, 2))
    mean = jnp.mean(hj, axis=(0, 1))
    var = jnp.var(hj, axis=(0, 1))
    yj = (hj - mean) * jax.lax.rsqrt(var + 1e-5)
    yj = yj * params["bn_scale"] + params["bn_bias"]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_mod), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_mod), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(yj, (1, 0, 2))), np.asarray(y_mod), atol=1e-5)


def test_remat_matches_plain(setup):
    """remat=True recomputes the stack stashes in the backward sweep —
    gradients must be identical to the stash-saving path.  Damped solver:
    well-conditioned, so any remat recompute drift would show exactly
    (full-history Anderson would amplify fusion-level bit noise — see
    test_fused_grads_match_oracle)."""
    basis, _, _, bstats, x, t, masks = setup
    model = IGCN(
        basis=basis, hid_dim=HID, num_layers=L, num_heads=HEADS,
        solver="damped", max_iterations=3, min_iterations=3,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x[:2], t[:2])["params"]
    plain = make_pallas_igcn_train_fn(model, stack_override=_oracle_stack(basis))
    rem = make_pallas_igcn_train_fn(
        model, stack_override=_oracle_stack(basis), remat=True)
    e = jnp.asarray(np.random.default_rng(4).normal(size=(B, 17, 5)), jnp.float32)

    def loss(fn):
        def inner(p):
            out, _, _ = fn(p, bstats, x, t, masks)
            return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))
        return inner

    g_p = jax.grad(loss(plain))(params)
    g_r = jax.grad(loss(rem))(params)
    for vp, vr in zip(jax.tree_util.tree_leaves(g_p),
                      jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vr), atol=1e-5)


def test_step_integration_vs_module(setup):
    """make_pallas_implicit_train_step runs the full step surface (GMM →
    antithetic t → solve → Adam → EMA → batch_stats) — vs the module step
    the loss differs only by the dropout draw (same ballpark), the fixed
    iteration count and metric surface match exactly."""
    basis, model, params, bstats, x, t, masks = setup
    from diffpose_tpu.data import make_synthetic_dataset
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.train import TrainState, make_optimizer
    from diffpose_tpu.train.implicit_steps import make_implicit_train_step

    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51)
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    mk_state = lambda: TrainState.create(
        params, opt.init(params), ema_params=ema_register(params),
        model_state=bstats,
    )
    ds = make_synthetic_dataset(num_frames=B, seed=0)
    batch = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
    }

    fused_step = make_pallas_implicit_train_step(
        model, opt, betas, block_b_fwd=8, block_b_bwd=8, group=17,
        precision=None, interpret=True, ema_mu=0.9)
    module_step = make_implicit_train_step(model, opt, betas, ema_mu=0.9)

    sf, sm = mk_state(), mk_state()
    for i in range(2):
        k = jax.random.PRNGKey(30 + i)
        sf, mf = fused_step(sf, batch, k)
        sm, mm = module_step(sm, batch, k)
    assert np.isfinite(float(mf["loss"])) and np.isfinite(float(mm["loss"]))
    assert int(mf["fp_iterations"]) == int(mm["fp_iterations"]) == 3
    assert set(mf) == set(mm)
    # same data, same step key stream; only the dropout realization differs
    assert abs(np.log(float(mf["loss"]) / float(mm["loss"]))) < 0.5
    for k in ("bn_mean", "bn_var"):
        np.testing.assert_allclose(
            np.asarray(sf.model_state[k]), np.asarray(sm.model_state[k]),
            rtol=0.5, atol=0.1)
    assert int(sf.step) == int(sm.step) == 2

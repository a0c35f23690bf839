"""Hardware validation + timing for in-kernel PRNG dropout (hardware-only:
Mosaic's interpret mode lacks the PRNG primitives, so this is the pendant
of tests/test_pallas_train.py for the ``dropout="prng"`` path).

Usage:
  python scripts/probe_prng_dropout.py check          # correctness vs oracle
  python scripts/probe_prng_dropout.py time [iters] [--bf=F --bb=B --grp=G]

``check``: dumps the kernel-generated masks (run_fwd_dump), feeds them to
the pure-JAX oracle (ops/train_ref.py), and asserts (a) keep rates, (b)
forward agreement, (c) jax.grad agreement through the custom VJP — which
also proves the backward kernel regenerates bit-identical masks.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.ops import train_ref as tr
from diffpose_tpu.ops.pallas_denoiser import _prep_weights
from diffpose_tpu.ops.pallas_train import (
    STACK_KEYS,
    build_pallas_train_stack,
    fused_train_forward,
)


def check():
    B = 64
    bf = next((int(a[5:]) for a in sys.argv if a.startswith("--bf=")), 8)
    bb = next((int(a[5:]) for a in sys.argv if a.startswith("--bb=")), 8)
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = GCNDiff(basis=basis)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:2], t[:2])["params"]
    seed = jnp.array([12345], jnp.int32)

    # the dump variant adds ~0.5 MB of mask-output blocks per tile, so the
    # check runs at small tiles; bf != bb exercises the chunked draw (mask
    # = f(layer, batch chunk of mtb=min(bf,bb), stream), any tile size)
    print(f"check at block_b_fwd={bf} block_b_bwd={bb}")
    stack_fn = build_pallas_train_stack(
        basis, block_b_fwd=bf, block_b_bwd=bb, group=4,
        precision="bf16x3", dropout="prng")

    # --- dump the kernel-drawn masks (they depend only on the seed) ---
    weights, _, _, _ = _prep_weights(params, basis, 5, 4, 96)
    w_stack = {k: weights[k] for k in STACK_KEYS}
    h0 = jnp.zeros((17, B, 96), jnp.float32)
    tp = jnp.zeros((5, B, 96), jnp.float32)
    _, _, dumps = jax.jit(
        lambda w, h, tpp, s: stack_fn.run_fwd_dump(w, h, tpp, s)
    )(w_stack, h0, tp, seed)

    keeps = {"probs_h": 0.9, "m1": 0.75, "m2": 0.75, "m3": 0.9, "m4": 0.9}
    for k, kp in keeps.items():
        m = np.asarray(dumps[k])
        assert set(np.unique(m)) <= {0.0, 1.0}, k
        print(f"  {k}: keep rate {m.mean():.4f} (expect {kp})")
        assert abs(m.mean() - kp) < 0.01, k
    # head-expansion consistency is implied by the fwd comparison below

    masks = tr.DropoutMasks(
        probs=jnp.transpose(dumps["probs_h"], (0, 2, 1, 3, 4)),
        attn_out=dumps["m1"], gnet_out=dumps["m2"],
        cheb1=dumps["m3"], cheb2=dumps["m4"],
    )

    got = jax.jit(
        lambda p: fused_train_forward(p, basis, x, t, seed, stack_fn)
    )(params)

    # kernel-vs-kernel: the masks-mode kernel fed the dumped masks must
    # reproduce the prng kernel bit-for-bit (same math, same masks)
    stack_masks = build_pallas_train_stack(
        basis, block_b_fwd=bf, block_b_bwd=bb, group=4,
        precision="bf16x3", dropout="masks")
    got_m = jax.jit(
        lambda p: fused_train_forward(p, basis, x, t, masks, stack_masks)
    )(params)
    kk_max = float(jnp.abs(got - got_m).max())
    print(f"  forward max|Δ| prng-kernel vs masks-kernel(dumped): {kk_max:.2e}")

    with jax.default_matmul_precision("float32"):
        want = jax.jit(lambda p: tr.train_forward(p, basis, x, t, masks))(params)
    fwd_max = float(jnp.abs(got - want).max())
    scale = float(jnp.abs(want).max())
    print(f"  forward vs oracle-with-dumped-masks: max|Δ| {fwd_max:.2e} "
          f"on max|out| {scale:.2e} (rel {fwd_max/scale:.2e})")
    # the kernel-vs-kernel check must be EXACT (same math, same masks);
    # kernel-vs-f32-oracle is the bf16x3-vs-true-f32 (HIGH vs HIGHEST)
    # numeric envelope of the already-shipped masks path — measured
    # 4.8e-3 rel on random N(0,1) inputs + random init (train fwd)
    assert kk_max == 0.0, kk_max
    assert fwd_max / scale < 1e-2, (fwd_max, scale)

    e = jnp.asarray(np.random.default_rng(1).normal(size=(B, 17, 5)),
                    jnp.float32)

    def loss_ref(p):
        out = tr.train_forward(p, basis, x, t, masks)
        return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))

    def loss_ker(p):
        out = fused_train_forward(p, basis, x, t, seed, stack_fn)
        return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))

    def loss_mask_ker(p):
        out = fused_train_forward(p, basis, x, t, masks, stack_masks)
        return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))

    with jax.default_matmul_precision("float32"):
        g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_ker = jax.jit(jax.grad(loss_ker))(params)
    g_mk = jax.jit(jax.grad(loss_mask_ker))(params)

    # decisive: raw BWD kernel outputs (dA0, dtp, d-stashes), prng vs
    # masks kernel with the dumped masks — must be bit-identical (proves
    # the backward kernel regenerates the exact masks at its own tiling)
    from diffpose_tpu.ops.pallas_train import kernel_masks

    dd5 = jnp.asarray(
        np.random.default_rng(7).normal(size=(17, B, 96)), jnp.float32)
    _, stashes_p = jax.jit(stack_fn.run_fwd)(w_stack, h0, tp, seed)
    km = kernel_masks(masks, dk=24)
    bwd_p = jax.jit(stack_fn.run_bwd)(w_stack, seed, stashes_p, dd5)
    stashes_m = {k: stashes_p[k] for k in
                 ("ha", "hb", "y1", "att", "r1", "rc1", "rd1")}
    bwd_m = jax.jit(stack_masks.run_bwd)(w_stack, km, stashes_m, dd5)
    kk_bwd = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(bwd_p),
                        jax.tree_util.tree_leaves(bwd_m)))
    print(f"  bwd-kernel outputs max|Δ| prng vs masks(dumped): {kk_bwd:.2e}")
    assert kk_bwd == 0.0, kk_bwd

    # end-to-end grads, prng vs masks path: NOT bit-identical by design —
    # the masks path recomputes hc/u in XLA at ambient precision for the
    # weight-grad GEMMs while the prng path uses the kernel's stashes
    # (slightly MORE accurate); the difference is that recompute rounding
    kk_grad = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(g_ker),
                        jax.tree_util.tree_leaves(g_mk)))
    print(f"  grads max|Δ| prng-kernel vs masks-kernel(dumped): {kk_grad:.2e}")
    assert kk_grad < 2e-3, kk_grad

    # informational: both kernels vs true-f32 jax.grad(oracle) — the
    # bf16x3 envelope of the shipped path (cancellation-prone attention
    # k grads are the worst case)
    rels = []
    for (pr, vr), (_, vk) in zip(
            jax.tree_util.tree_flatten_with_path(g_ref)[0],
            jax.tree_util.tree_flatten_with_path(g_ker)[0]):
        absd = float(jnp.abs(vr - vk).max())
        if absd < 1e-5:
            continue
        rel = absd / (float(jnp.abs(vr).max()) + 1e-8)
        rels.append((rel, jax.tree_util.keystr(pr)))
    rels.sort(reverse=True)
    for rel, name in rels[:5]:
        print(f"    bf16x3-vs-f32 grad rel {rel:.2e}  {name}")
    assert rels[0][0] < 5e-2, rels[0]
    print("PRNG dropout: all checks passed")


def timeit():
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.ops.pallas_train import make_pallas_train_step
    from diffpose_tpu.train.optim import make_optimizer
    from diffpose_tpu.train.state import TrainState

    B = 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 30
    bf = next((int(a[5:]) for a in sys.argv if a.startswith("--bf=")), 64)
    bb = next((int(a[5:]) for a in sys.argv if a.startswith("--bb=")), 32)
    grp = next((int(a[6:]) for a in sys.argv if a.startswith("--grp=")), 17)
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 0)

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    model = GCNDiff(basis=basis)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(params=params, opt_state=opt.init(params),
                              ema_params=ema_register(params))
    rng = np.random.default_rng(0)
    pool3d = rng.normal(size=(B, 17, 3)).astype(np.float32)
    pool2d = rng.normal(size=(B, 17, 5, 5)).astype(np.float32)
    pool2d[..., 0] = np.abs(pool2d[..., 0]) + 0.5
    pool2d[..., 3:5] = np.abs(pool2d[..., 3:5]) * 0.01 + 1e-3
    batch = {
        "poses_3d": jax.device_put(jnp.asarray(pool3d)),
        "poses_2d_gmm": jax.device_put(jnp.asarray(pool2d)),
    }

    step = make_pallas_train_step(
        opt, betas, basis, block_b_fwd=bf, block_b_bwd=bb, group=grp,
        precision="bf16x3", dropout="prng",
        vmem_limit_bytes=vmem_mb * 2**20 or None)
    step_j = jax.jit(step, donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, m = step_j(state, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"compile {time.perf_counter()-t0:.0f}s  first loss {float(m['loss']):.4f}",
          flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_j(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"PRNG-dropout train step (bf={bf} bb={bb} grp={grp}): "
          f"{ms:7.2f} ms/step ({B/ms*1e3:,.0f} frames/s)  "
          f"loss {float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "time":
        timeit()
    else:
        check()

"""Hardware timing: video-family (spatio-temporal) train/eval throughput.

Single-chip timing at each parity-grade matmul precision; frames/s
counts window_batch × frames per step (the video model denoises whole
81/243-frame windows — capability target README.md:92-93 / BASELINE
configs[4]).

``--impl=xla`` (default) times the module path; ``--impl=pallas`` times
the fused spatial-stack paths — eval through
``ops/pallas_video.make_pallas_video_denoiser_fn`` and train through
``ops/pallas_video_train.make_pallas_video_train_step`` (kernel pair per
spatial block, temporal blocks XLA).

Usage: probe_video.py [iters] [--b=16 --frames=81 --impl=xla|pallas
                               --bbf=64 --bbb=32 --grp=17 --vmem=100
                               --eval-only | --train-only]
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

from diffpose_tpu.data.video import synthetic_video_dataset
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import ema_register
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.train import TrainState, make_optimizer
from diffpose_tpu.train.video_steps import make_video_eval_step, make_video_train_step


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20
    b = next((int(a[4:]) for a in sys.argv if a.startswith("--b=")), 16)
    frames = next((int(a[9:]) for a in sys.argv if a.startswith("--frames=")), 81)

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    model = SpatioTemporalDiff(basis=basis, frames=frames)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2, frames, 17, 5)), jnp.zeros((2,)),
    )["params"]
    opt = make_optimizer(lr=2e-5, steps_per_epoch=1)

    def fresh_state():
        # per-precision-loop: the train step donates its state, so the
        # buffers must be rebuilt for each jitted variant
        return TrainState.create(params, opt.init(params),
                                 ema_params=ema_register(params))

    ds = synthetic_video_dataset(num_windows=b, frames=frames, seed=0)
    batch = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
        "seeds": jnp.arange(b, dtype=jnp.int32),
    }
    batch = jax.device_put(batch)
    fps_den = b * frames
    impl = next((a[7:] for a in sys.argv if a.startswith("--impl=")), "xla")
    bbf = next((int(a[6:]) for a in sys.argv if a.startswith("--bbf=")), 64)
    bbb = next((int(a[6:]) for a in sys.argv if a.startswith("--bbb=")), 32)
    grp = next((int(a[6:]) for a in sys.argv if a.startswith("--grp=")), 17)
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 100)
    do_eval = "--train-only" not in sys.argv
    do_train = "--eval-only" not in sys.argv

    if impl == "pallas":
        from diffpose_tpu.ops.pallas_video import make_pallas_video_denoiser_fn
        from diffpose_tpu.ops.pallas_video_train import make_pallas_video_train_step

        # XLA-side remainder (temporal blocks, DDIM mixing) at 3-pass
        # bf16 — same contract as the frame bench (parity-grade, PERF.md)
        with jax.default_matmul_precision("BF16_BF16_F32_X3"):
            state = fresh_state()
            if do_eval:
                eval_bb = next((int(a[9:]) for a in sys.argv
                                if a.startswith("--blockb=")), 128)
                override = make_pallas_video_denoiser_fn(
                    model, block_b=eval_bb, precision="bf16x3",
                    vmem_limit_bytes=vmem_mb * 2**20 or None)
                if "--denoise-only" in sys.argv:
                    # model-only throughput (no P1/P2 metrics): cost
                    # attribution for the eval step's Procrustes share
                    from diffpose_tpu.diffusion.ddim import ddim_sample

                    x0 = jnp.concatenate(
                        [jnp.zeros((b, frames, 17, 2)),
                         jnp.zeros((b, frames, 17, 3))], axis=-1)
                    pstate = fresh_state()

                    @jax.jit
                    def den(params, z):
                        out = ddim_sample(
                            lambda zz, tv: override(params, zz, tv),
                            z, (0, 6), betas)
                        return out[..., 2:].sum()

                    t0 = time.perf_counter()
                    den(pstate.params, x0).block_until_ready()
                    print(f"denoise-only compile {time.perf_counter()-t0:.0f}s",
                          flush=True)
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        r = den(pstate.params, x0)
                    r.block_until_ready()
                    ms = (time.perf_counter() - t0) / iters * 1e3
                    print(f"video denoise-only (b={b} f={frames}, pallas "
                          f"bb{eval_bb}): {ms:7.2f} ms "
                          f"({fps_den/ms*1e3:,.0f} frames/s)", flush=True)
                ev = jax.jit(make_video_eval_step(
                    model, betas, (0, 6), denoise_override=override))
                t0 = time.perf_counter()
                p1, p2, _ = ev(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(p1)
                print(f"eval[pallas bf16x3 bb{eval_bb}] compile "
                      f"{time.perf_counter()-t0:.0f}s  "
                      f"P1 {float(np.mean(p1))*1000:.1f} mm", flush=True)
                t0 = time.perf_counter()
                for _ in range(iters):
                    p1, p2, _ = ev(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(p1)
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"video eval (b={b} f={frames}, pallas bf16x3 bb{eval_bb}): "
                      f"{ms:7.2f} ms ({fps_den/ms*1e3:,.0f} frames/s)", flush=True)

            if do_train:
                drp = next((a[10:] for a in sys.argv
                            if a.startswith("--dropout=")), "masks")
                tr = jax.jit(make_pallas_video_train_step(
                    model, opt, betas, block_b_fwd=bbf, block_b_bwd=bbb,
                    group=grp, dropout=drp,
                    vmem_limit_bytes=vmem_mb * 2**20 or None),
                    donate_argnums=(0,))
                st = fresh_state()
                t0 = time.perf_counter()
                st, m = tr(st, batch, jax.random.PRNGKey(2))
                jax.block_until_ready(m["loss"])
                print(f"train[pallas bf16x3 ({bbf},{bbb}) grp{grp} {drp}] "
                      f"compile {time.perf_counter()-t0:.0f}s  "
                      f"loss {float(m['loss']):.2f}", flush=True)
                t0 = time.perf_counter()
                for i in range(iters):
                    st, m = tr(st, batch,
                               jax.random.fold_in(jax.random.PRNGKey(3), i))
                jax.block_until_ready(m["loss"])
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"video train (b={b} f={frames}, pallas bf16x3): "
                      f"{ms:7.2f} ms ({fps_den/ms*1e3:,.0f} frames/s)", flush=True)
        return

    precs = next((a[8:].split(",") for a in sys.argv if a.startswith("--precs=")),
                 ("float32", "BF16_BF16_F32_X3"))
    for prec in precs:
        with jax.default_matmul_precision(prec):
            state = fresh_state()
            if do_eval:
                ev = jax.jit(make_video_eval_step(model, betas, (0, 6)))
                t0 = time.perf_counter()
                p1, p2, _ = ev(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(p1)
                print(f"eval[{prec}] compile {time.perf_counter()-t0:.0f}s  "
                      f"P1 {float(np.mean(p1))*1000:.1f} mm", flush=True)
                t0 = time.perf_counter()
                for _ in range(iters):
                    p1, p2, _ = ev(state, batch, jax.random.PRNGKey(1))
                jax.block_until_ready(p1)
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"video eval (b={b} f={frames}, {prec}): {ms:7.2f} ms "
                      f"({fps_den/ms*1e3:,.0f} frames/s)", flush=True)

            if do_train:
                tr = jax.jit(make_video_train_step(model, opt, betas),
                             donate_argnums=(0,))
                st = fresh_state()
                t0 = time.perf_counter()
                st, m = tr(st, batch, jax.random.PRNGKey(2))
                jax.block_until_ready(m["loss"])
                print(f"train[{prec}] compile {time.perf_counter()-t0:.0f}s  "
                      f"loss {float(m['loss']):.2f}", flush=True)
                t0 = time.perf_counter()
                for i in range(iters):
                    st, m = tr(st, batch, jax.random.fold_in(jax.random.PRNGKey(3), i))
                jax.block_until_ready(m["loss"])
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"video train (b={b} f={frames}, {prec}): {ms:7.2f} ms "
                      f"({fps_den/ms*1e3:,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()

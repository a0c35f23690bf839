"""Attribution probe: where does the video TRAIN step's time go?

Times the fused video train step (spatial kernel pairs + XLA temporal)
against a variant with the temporal blocks stubbed to identity — the
difference is the XLA temporal fwd+bwd share, i.e. the ceiling on what
fusing the temporal blocks into kernels can save.

Run solo:  python scripts/probe_video_train_split.py
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dropout", default="prng")
    args = ap.parse_args()

    from diffpose_tpu.data.video import synthetic_video_dataset
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.models.video import SpatioTemporalDiff
    from diffpose_tpu.train import TrainState, make_optimizer
    import diffpose_tpu.ops.pallas_video_train as pvt

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    model = SpatioTemporalDiff(basis=basis, frames=args.frames)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    opt = make_optimizer(lr=2e-5, steps_per_epoch=1)
    ds = synthetic_video_dataset(num_windows=args.b, frames=args.frames, seed=0)
    batch = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
    }
    x0 = jnp.zeros((2, args.frames, 17, 5))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0,
                        jnp.zeros((2,)))["params"]
    kw = dict(block_b_fwd=64, block_b_bwd=32, group=17,
              precision="bf16x3", dropout=args.dropout,
              vmem_limit_bytes=100 * 2**20)

    def bench(name, step):
        state = TrainState.create(params, opt.init(params),
                                  ema_params=ema_register(params))
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(1))
        np.asarray(m["loss"])
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.2f} ms/step", flush=True)
        return dt

    with jax.default_matmul_precision("BF16_BF16_F32_X3"):
        full = jax.jit(pvt.make_pallas_video_train_step(
            model, opt, betas, **kw))
        t_full = bench("full (spatial kernels + XLA temporal)", full)

        orig = pvt._temporal_block_train
        pvt._temporal_block_train = lambda p, x, heads, rate, key: x
        try:
            stub = jax.jit(pvt.make_pallas_video_train_step(
                model, opt, betas, **kw))
            t_stub = bench("temporal stubbed to identity", stub)
        finally:
            pvt._temporal_block_train = orig
    print(f"temporal fwd+bwd share: {(t_full - t_stub) * 1e3:.2f} ms "
          f"({100 * (t_full - t_stub) / t_full:.0f}% of the step)")


if __name__ == "__main__":
    main()

"""End-to-end eval-pipeline parity vs the reference torch implementation.

Uses a single-kernel GMM dataset (weight 1 → the kernel draw is
deterministic) so the whole pipeline — lift, root-center, uvxyz concat,
2-step DDIM (η=0), hypothesis mean, root-center, MPJPE — is comparable
bit-for-bit-ish between the reference torch models and our JAX eval step
running converted weights.
"""

import numpy as np
import pytest
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from diffpose_tpu.data import BatchLoader, make_synthetic_dataset
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.models.convert import torch_state_to_params
from diffpose_tpu.train import TrainState, make_eval_step
from tests.oracle import load_reference_module

BASIS = cheb_basis_from_edges(17, H36M_EDGES)
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51)
SEQ = (0, 12)


def _reference_models(torch):
    chebconv = load_reference_module("models.ChebConv")
    gcndiff = load_reference_module("models.gcndiff")
    gcnpose = load_reference_module("models.gcnpose")

    mc = SimpleNamespace(hid_dim=96, emd_dim=96, coords_dim=[5, 5], num_layer=5,
                         n_head=4, dropout=0.25, n_pts=17)
    edges = torch.tensor(list(H36M_EDGES), dtype=torch.long)
    adj = chebconv.adj_mx_from_edges(17, edges, sparse=False)
    diff = gcndiff.GCNdiff(adj, SimpleNamespace(model=mc)).eval()
    mc2 = SimpleNamespace(**{**vars(mc), "coords_dim": [2, 3]})
    pose = gcnpose.GCNpose(adj, SimpleNamespace(model=mc2)).eval()
    return diff, pose


def _reference_eval(torch, diff, pose, input_2d, targets_3d):
    """The reference test_hyber math (runners/diffpose_frame.py:330-391)."""
    mask = torch.ones(1, 1, 17, dtype=torch.bool)
    with torch.no_grad():
        x2d = torch.from_numpy(input_2d)
        xyz = pose(x2d, mask)
        xyz = xyz - xyz[:, :1, :]
        x = torch.cat([x2d, xyz], dim=2)

        betas = torch.from_numpy(BETAS).float()
        ab = torch.cumprod(1 - torch.cat([torch.zeros(1), betas]), dim=0)
        seq_next = [-1] + list(SEQ[:-1])
        for i, j in zip(reversed(SEQ), reversed(seq_next)):
            at, at_next = ab[i + 1], ab[j + 1]
            t = torch.full((x.shape[0],), float(i))
            et = diff(x, mask, t, 0)
            x0 = (x - et * (1 - at).sqrt()) / at.sqrt()
            x = at_next.sqrt() * x0 + (1 - at_next).sqrt() * et
        pred = x[..., 2:]
        pred = pred - pred[:, :1, :]
        tgt = torch.from_numpy(targets_3d)
        tgt = tgt - tgt[:, :1, :]
        p1 = torch.mean(torch.norm(pred - tgt, dim=-1), dim=-1)
    return pred.numpy(), p1.numpy()


def test_full_eval_pipeline_matches_reference():
    import torch

    torch.manual_seed(7)
    ref_diff, ref_pose = _reference_models(torch)

    params_diff = torch_state_to_params(
        {k: v.numpy() for k, v in ref_diff.state_dict().items()}, 5, True
    )
    params_pose = torch_state_to_params(
        {k: v.numpy() for k, v in ref_pose.state_dict().items()}, 5, False
    )

    ds = make_synthetic_dataset(num_frames=32, n_kernels=1, seed=9)
    # weight-1 single kernel → deterministic 2D input on both sides
    assert np.allclose(ds.poses_2d_gmm[..., 0], 1.0)
    loader = BatchLoader(ds, batch_size=32, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    input_2d = ds.poses_2d_gmm[:, :, 0, 1:3].astype(np.float32)

    want_pred, want_p1 = _reference_eval(
        torch, ref_diff, ref_pose, input_2d, ds.poses_3d
    )

    diff = GCNDiff(basis=BASIS)
    pose = GCNPose(basis=BASIS)
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, params_diff), opt_state=()
    )
    eval_fn = jax.jit(make_eval_step(
        diff, pose, BETAS, SEQ, test_times=1, mask=jnp.ones((1, 1, 17))
    ))
    p1, p2, pred = eval_fn(
        state, jax.tree_util.tree_map(jnp.asarray, params_pose),
        batch, jax.random.PRNGKey(0),
    )

    np.testing.assert_allclose(np.asarray(pred), want_pred, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1), want_p1, atol=2e-5)
    assert np.isfinite(np.asarray(p2)).all()

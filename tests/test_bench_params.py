"""bench.py trained-checkpoint auto-detection (VERDICT r2 item 6).

When ``ckpt/`` holds reference-ABI checkpoints (state-list format,
``runners/diffpose_frame.py:248-255``), the headline switches to the
converted trained weights; otherwise it random-inits."""

import sys

import jax
import numpy as np
import pytest


sys.path.insert(0, "/root/repo")


def _models():
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
    from diffpose_tpu.models import GCNDiff, GCNPose

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    return GCNDiff(basis=basis), GCNPose(basis=basis)


def test_random_init_without_ckpt(tmp_path):
    import bench

    diff, pose = _models()
    pd, pp = bench.load_eval_params(diff, pose, ckpt_dir=str(tmp_path))
    assert "temb_dense_0" in pd and "temb_dense_0" not in pp


def test_ckpt_autodetect_loads_trained_weights(tmp_path):
    torch = pytest.importorskip("torch")
    from types import SimpleNamespace

    from tests.oracle import load_reference_module

    import bench

    chebconv = load_reference_module("models.ChebConv")
    ref_diff_mod = load_reference_module("models.gcndiff")
    ref_pose_mod = load_reference_module("models.gcnpose")
    from diffpose_tpu.graph import H36M_EDGES

    torch.manual_seed(3)
    adj = chebconv.adj_mx_from_edges(
        17, torch.tensor(list(H36M_EDGES), dtype=torch.long), sparse=False)
    mc = SimpleNamespace(hid_dim=96, emd_dim=96, coords_dim=[5, 5],
                         num_layer=5, n_head=4, dropout=0.25, n_pts=17)
    rd = ref_diff_mod.GCNdiff(adj, SimpleNamespace(model=mc))
    mc2 = SimpleNamespace(**{**vars(mc), "coords_dim": [2, 3]})
    rp = ref_pose_mod.GCNpose(adj, SimpleNamespace(model=mc2))
    torch.save([rd.state_dict(), None, 0, 0, None],
               str(tmp_path / "diffpose_uvxyz_cpn.pth"))
    torch.save([rp.state_dict(), None, 0, 0, None],
               str(tmp_path / "gcn_xyz_cpn.pth"))

    diff, pose = _models()
    pd, pp = bench.load_eval_params(diff, pose, ckpt_dir=str(tmp_path))
    # converted trees have the init trees' structure (jit-compatible swap)
    pd0, pp0 = bench.load_eval_params(diff, pose, ckpt_dir=str(tmp_path / "x"))
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pd0)
    assert jax.tree_util.tree_structure(pp) == jax.tree_util.tree_structure(pp0)
    # and really carry the torch values
    np.testing.assert_allclose(
        np.asarray(pd["gconv_input"]["w"]),
        rd.gconv_input.weight.detach().numpy()[:, 0], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(pp["gconv_input"]["w"]),
        rp.gconv_input.weight.detach().numpy()[:, 0], atol=1e-7)

"""Flax → reference-ABI checkpoint EXPORT (models/convert.py).

Models trained here must load into the reference implementation
unchanged: strict ``load_state_dict`` on the reference modules
(``runners/diffpose_frame.py:126-132`` loads ``states[0]`` into
DataParallel-wrapped models), plus forward parity of the loaded torch
model against the exporting Flax model, and a .pth round-trip through
the 5-element state-list ABI (``:248-255``)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.models.convert import (
    igcn_variables_to_torch_state,
    load_torch_states,
    params_to_torch_state,
    save_torch_states,
    torch_igcn_to_variables,
    torch_state_to_params,
)
from tests.oracle import load_reference_module


@pytest.fixture(scope="module")
def basis():
    return cheb_basis_from_edges(17, H36M_EDGES, order=2)


def _ref_cfg(coords):
    model = SimpleNamespace(
        hid_dim=96, emd_dim=96, coords_dim=list(coords), num_layer=5,
        n_head=4, dropout=0.25, n_pts=17,
    )
    return SimpleNamespace(model=model)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")


def test_export_import_roundtrip(basis):
    """export → import reproduces the exact param tree (diff + pose)."""
    model = GCNDiff(basis=basis)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)),
        jnp.zeros((2,)))["params"]
    sd = params_to_torch_state(params, with_temb=True)
    assert all(k.startswith("module.") for k in sd)
    back = torch_state_to_params(sd, with_temb=True)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)

    pose = GCNPose(basis=basis)
    pparams = pose.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 2)))["params"]
    sd = params_to_torch_state(pparams, with_temb=False)
    back = torch_state_to_params(sd, with_temb=False)
    _tree_equal(jax.tree_util.tree_map(np.asarray, pparams), back)


def test_export_loads_strict_into_reference_and_matches(basis):
    """The exported state dict passes the reference modules' STRICT
    load_state_dict (key/shape ABI) and the loaded torch forward matches
    the exporting Flax forward."""
    gcndiff = load_reference_module("models.gcndiff")
    gcnpose = load_reference_module("models.gcnpose")
    chebconv = load_reference_module("models.ChebConv")
    import torch

    edges = torch.tensor(list(H36M_EDGES), dtype=torch.long)
    ref_adj = chebconv.adj_mx_from_edges(17, edges, sparse=False)
    rng = np.random.default_rng(0)

    # --- denoiser ---
    model = GCNDiff(basis=basis)
    params = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((2, 17, 5)),
        jnp.zeros((2,)))["params"]
    sd = params_to_torch_state(params, with_temb=True, prefix="")
    ref = gcndiff.GCNdiff(ref_adj, _ref_cfg((5, 5)))
    ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})  # strict
    ref.eval()

    x = rng.normal(size=(4, 17, 5)).astype(np.float32)
    t = np.array([0.0, 12.0, 24.0, 50.0], dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x),
                   torch.ones(1, 1, 17, dtype=torch.bool),
                   torch.from_numpy(t), 0).numpy()
    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.ones((1, 1, 17)))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    # --- lifter (reference declares unused temb.dense → synthesized) ---
    pose = GCNPose(basis=basis)
    pparams = pose.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((2, 17, 2)))["params"]
    sd = params_to_torch_state(pparams, with_temb=False, prefix="")
    refp = gcnpose.GCNpose(ref_adj, _ref_cfg((2, 3)))
    refp.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items()})
    refp.eval()
    x2 = rng.normal(size=(4, 17, 2)).astype(np.float32)
    with torch.no_grad():
        want = refp(torch.from_numpy(x2),
                    torch.ones(1, 1, 17, dtype=torch.bool)).numpy()
    got = pose.apply({"params": pparams}, jnp.asarray(x2), jnp.ones((1, 1, 17)))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_igcn_export_roundtrip(basis):
    from diffpose_tpu.models.igcn import IGCN

    model = IGCN(basis=basis, max_iterations=3, min_iterations=1)
    variables = model.init(
        {"params": jax.random.PRNGKey(4)}, jnp.zeros((2, 17, 5)),
        jnp.zeros((2,)))
    sd = igcn_variables_to_torch_state(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})
    assert "module.batch_norm.running_mean" in sd
    back = torch_igcn_to_variables(sd)
    _tree_equal(jax.tree_util.tree_map(np.asarray, dict(variables["params"])),
                back["params"])
    _tree_equal({k: np.asarray(v) for k, v in variables["batch_stats"].items()},
                back["batch_stats"])


def test_save_load_state_list_abi(basis, tmp_path):
    """.pth round-trip through the reference 5-element list ABI, with EMA."""
    model = GCNDiff(basis=basis)
    params = model.init(
        {"params": jax.random.PRNGKey(5)}, jnp.zeros((2, 17, 5)),
        jnp.zeros((2,)))["params"]
    sd = params_to_torch_state(params, with_temb=True)
    ema = {k: v * 0.5 for k, v in sd.items()}
    path = str(tmp_path / "export.pth")
    save_torch_states(path, sd, epoch=7, step=123, ema_state=ema)

    model_state, _, epoch, step, ema_state = load_torch_states(path)
    assert (epoch, step) == (7, 123)
    back = torch_state_to_params(model_state, with_temb=True)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)
    back_ema = torch_state_to_params(ema_state, with_temb=True)
    half = jax.tree_util.tree_map(lambda v: np.asarray(v) * 0.5, params)
    _tree_equal(half, back_ema)


def test_export_script_from_orbax_checkpoint(tmp_path):
    """End-to-end: train a tiny runner with Orbax checkpoints → export
    the .pth via scripts/export_reference_ckpt.py → re-ingest and match
    the live params.  (Tiny dims ≠ reference config, so only the
    round-trip is asserted — the strict reference load is covered above
    at production dims.)"""
    import importlib.util
    import os

    from diffpose_tpu.config import (
        Config, ModelConfig, OptimConfig, TestingConfig, TrainingConfig)
    from diffpose_tpu.data import make_synthetic_dataset
    from diffpose_tpu.train import DiffposeRunner

    cfg = Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        training=TrainingConfig(batch_size=16, n_epochs=1),
        testing=TestingConfig(test_times=1, test_timesteps=2,
                              test_num_diffusion_timesteps=12),
        optim=OptimConfig(lr=1e-3),
    )
    runner = DiffposeRunner(cfg, seed=5, log_dir=str(tmp_path))
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(make_synthetic_dataset(num_frames=32, seed=1),
                    make_synthetic_dataset(num_frames=16, seed=2))
    runner.train()
    if runner.checkpointer is not None:
        runner.checkpointer.close()

    spec = importlib.util.spec_from_file_location(
        "export_ckpt", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "export_reference_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "export.pth")
    rc = mod.main([str(tmp_path), out, "--hid_dim", "32", "--layers", "2"])
    assert rc == 0 and os.path.getsize(out) > 0

    model_state, _, _, _, ema_state = load_torch_states(out)
    back = torch_state_to_params(model_state, num_layers=2, with_temb=True)
    live = jax.tree_util.tree_map(np.asarray, runner.state.params)
    _tree_equal(live, back)
    assert ema_state is not None  # EMA shadow exported in slot 4

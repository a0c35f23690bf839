"""PyTorch-checkpoint ↔ Flax-params conversion (both directions).

The reference persists ``[model_state, optimizer_state, epoch, step, ema_state]``
lists via ``torch.save`` (``runners/diffpose_frame.py:248-255``) with
``DataParallel``'s ``module.`` name prefixes.  This module maps those state
dicts onto the parameter tree of :class:`~diffpose_tpu.models.GCNDiff` /
:class:`~diffpose_tpu.models.GCNPose` so pretrained reference weights can be
ingested for parity evaluation and warm starts — and maps back
(:func:`params_to_torch_state` / :func:`save_torch_states`), so models
trained HERE load into the reference implementation unchanged
(strict ``load_state_dict`` on its ``DataParallel``-wrapped modules).

Core conversion works on ``{name: np.ndarray}`` so the library itself never
needs torch; :func:`load_torch_states` / :func:`save_torch_states` import
torch lazily for ``.pth`` IO.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _strip_prefix(state: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v)
    return out


def _set(tree: dict, path: tuple, value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_cheb(tree, dst, w, b):
    # torch ChebConv weight [K+1, 1, in, out] → [K+1, in, out]; bias [1,1,out] → [out]
    _set(tree, dst + ("w",), w[:, 0])
    if b is not None:
        _set(tree, dst + ("b",), b.reshape(-1))


def _convert_linear(tree, dst, w, b):
    # torch Linear weight [out, in] → kernel [in, out]
    _set(tree, dst + ("kernel",), w.T)
    _set(tree, dst + ("bias",), b)


ATTN_NAMES = ("q", "k", "v", "out")


def torch_state_to_params(
    state: Mapping[str, np.ndarray], num_layers: int = 5, with_temb: bool = True
) -> dict:
    """Convert a GCNdiff/GCNpose/IGCN torch ``state_dict`` to a Flax param tree.

    ``with_temb=True`` for the diffusion denoiser (timestep projections per
    block); ``False`` for the lifter, whose ``temb.dense.*`` parameters
    exist in the reference but are unused (``models/gcnpose.py:95-113``) and
    are dropped here.
    """
    sd = _strip_prefix(state)
    tree: dict = {}

    _convert_cheb(tree, ("gconv_input",), sd["gconv_input.weight"], sd.get("gconv_input.bias"))
    _convert_cheb(tree, ("gconv_output",), sd["gconv_output.weight"], sd.get("gconv_output.bias"))

    if with_temb:
        _convert_linear(tree, ("temb_dense_0",), sd["temb.dense.0.weight"], sd["temb.dense.0.bias"])
        _convert_linear(tree, ("temb_dense_1",), sd["temb.dense.1.weight"], sd["temb.dense.1.bias"])

    for i in range(num_layers):
        a = f"atten_layers.{i}"
        for j, name in enumerate(ATTN_NAMES):
            _convert_linear(
                tree,
                (f"atten_{i}", "attn", name),
                sd[f"{a}.self_attn.linears.{j}.weight"],
                sd[f"{a}.self_attn.linears.{j}.bias"],
            )
        for j, norm in enumerate(("norm1", "norm2")):
            _set(tree, (f"atten_{i}", norm, "scale"), sd[f"{a}.sublayer.{j}.norm.a_2"])
            _set(tree, (f"atten_{i}", norm, "bias"), sd[f"{a}.sublayer.{j}.norm.b_2"])
        _set(tree, (f"atten_{i}", "gnet", "a_hat"), sd[f"{a}.feed_forward.A_hat"])
        for conv, fc in (("gconv1", "fc1"), ("gconv2", "fc2")):
            _convert_linear(
                tree,
                (f"atten_{i}", "gnet", fc),
                sd[f"{a}.feed_forward.{conv}.fc.weight"],
                sd[f"{a}.feed_forward.{conv}.fc.bias"],
            )

        g = f"gconv_layers.{i}"
        for conv in ("gconv1", "gconv2"):
            _convert_cheb(
                tree,
                (f"res_{i}", conv, "gconv"),
                sd[f"{g}.{conv}.gconv.weight"],
                sd.get(f"{g}.{conv}.gconv.bias"),
            )
        if with_temb:
            _convert_linear(
                tree, (f"res_{i}", "temb_proj"), sd[f"{g}.temb_proj.weight"], sd[f"{g}.temb_proj.bias"]
            )

    return tree


def torch_igcn_to_variables(
    state: Mapping[str, np.ndarray], num_layers: int = 5
) -> dict:
    """Convert a reference ``models.igcn.IGCN`` state dict to Flax variables.

    The IGCN backbone shares GCNdiff's parameter layout (same attention
    ``linears.{0..3}`` naming via ``MemoryEfficientMultiHeadedAttention``,
    ``eatten.py:88``) plus a stabilizing ``batch_norm`` (BatchNorm1d,
    ``igcn.py:95``) whose learnable affine maps to the ``bn_scale``/
    ``bn_bias`` params and whose running buffers map to the
    ``batch_stats`` collection.  Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = _strip_prefix(state)
    params = torch_state_to_params(sd, num_layers=num_layers, with_temb=True)
    params["bn_scale"] = np.asarray(sd["batch_norm.weight"])
    params["bn_bias"] = np.asarray(sd["batch_norm.bias"])
    batch_stats = {
        "bn_mean": np.asarray(sd["batch_norm.running_mean"]),
        "bn_var": np.asarray(sd["batch_norm.running_var"]),
    }
    return {"params": params, "batch_stats": batch_stats}


def _get(tree: Mapping, path: tuple) -> np.ndarray:
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def params_to_torch_state(
    params: Mapping, num_layers: int = 5, with_temb: bool = True,
    prefix: str = "module.", hid_dim: int = 96,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_state_to_params`: a Flax GCNDiff/GCNPose
    param tree → the reference torch ``state_dict`` naming.

    ``prefix="module."`` matches how the reference saves and loads (its
    models are ``DataParallel``-wrapped at ``load_state_dict`` time,
    ``runners/diffpose_frame.py:126-132``); pass ``""`` for a bare
    module.  ``with_temb=False`` (the lifter): the reference GCNpose
    still DECLARES ``temb.dense.{0,1}`` (``models/gcnpose.py:94-97``,
    unused in forward), so zero tensors of the right shapes are
    synthesized to satisfy its strict load.
    """
    sd: Dict[str, np.ndarray] = {}
    emd_dim = hid_dim * 4

    def put_cheb(src: tuple, dst: str):
        w = _get(params, src + ("w",))
        sd[f"{dst}.weight"] = w[:, None]              # [K+1, in, out] → [K+1, 1, in, out]
        b = _get(params, src + ("b",))
        sd[f"{dst}.bias"] = b.reshape(1, 1, -1)

    def put_linear(src: tuple, dst: str):
        sd[f"{dst}.weight"] = _get(params, src + ("kernel",)).T
        sd[f"{dst}.bias"] = _get(params, src + ("bias",))

    put_cheb(("gconv_input",), "gconv_input")
    put_cheb(("gconv_output",), "gconv_output")

    if with_temb:
        put_linear(("temb_dense_0",), "temb.dense.0")
        put_linear(("temb_dense_1",), "temb.dense.1")
    else:
        sd["temb.dense.0.weight"] = np.zeros((emd_dim, hid_dim), np.float32)
        sd["temb.dense.0.bias"] = np.zeros((emd_dim,), np.float32)
        sd["temb.dense.1.weight"] = np.zeros((emd_dim, emd_dim), np.float32)
        sd["temb.dense.1.bias"] = np.zeros((emd_dim,), np.float32)

    for i in range(num_layers):
        a = f"atten_layers.{i}"
        for j, name in enumerate(ATTN_NAMES):
            put_linear((f"atten_{i}", "attn", name), f"{a}.self_attn.linears.{j}")
        for j, norm in enumerate(("norm1", "norm2")):
            sd[f"{a}.sublayer.{j}.norm.a_2"] = _get(params, (f"atten_{i}", norm, "scale"))
            sd[f"{a}.sublayer.{j}.norm.b_2"] = _get(params, (f"atten_{i}", norm, "bias"))
        sd[f"{a}.feed_forward.A_hat"] = _get(params, (f"atten_{i}", "gnet", "a_hat"))
        for conv, fc in (("gconv1", "fc1"), ("gconv2", "fc2")):
            put_linear((f"atten_{i}", "gnet", fc), f"{a}.feed_forward.{conv}.fc")

        g = f"gconv_layers.{i}"
        for conv in ("gconv1", "gconv2"):
            put_cheb((f"res_{i}", conv, "gconv"), f"{g}.{conv}.gconv")
        if with_temb:
            put_linear((f"res_{i}", "temb_proj"), f"{g}.temb_proj")

    return {prefix + k: v for k, v in sd.items()}


def igcn_variables_to_torch_state(
    variables: Mapping, num_layers: int = 5, prefix: str = "module.",
    hid_dim: int = 96,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`torch_igcn_to_variables`: Flax IGCN variables
    (``{"params", "batch_stats"}``) → the reference IGCN state dict,
    including the BatchNorm affine + running buffers (``igcn.py:95``)."""
    params = variables["params"]
    sd = params_to_torch_state(
        params, num_layers=num_layers, with_temb=True, prefix="",
        hid_dim=hid_dim)
    sd["batch_norm.weight"] = _get(params, ("bn_scale",))
    sd["batch_norm.bias"] = _get(params, ("bn_bias",))
    bs = variables["batch_stats"]
    sd["batch_norm.running_mean"] = np.asarray(bs["bn_mean"])
    sd["batch_norm.running_var"] = np.asarray(bs["bn_var"])
    sd["batch_norm.num_batches_tracked"] = np.asarray(0, np.int64)
    return {prefix + k: v for k, v in sd.items()}


def save_torch_states(
    path: str, model_state: Mapping[str, np.ndarray], *,
    optimizer_state=None, epoch: int = 0, step: int = 0, ema_state=None,
):
    """Write the reference 5-element checkpoint ABI
    (``[model, optim, epoch, step, ema]``, ``runners/diffpose_frame.py:
    248-255``) so checkpoints produced here load in the reference code.
    Lazy torch import; numpy values become CPU tensors."""
    import torch

    as_t = lambda d: ({k: torch.as_tensor(np.asarray(v)) for k, v in d.items()}
                      if d is not None else None)
    torch.save([as_t(model_state), optimizer_state, epoch, step,
                as_t(ema_state)], path)


def load_torch_states(path: str):
    """Load a reference ``ckpt.pth`` state list (lazy torch import).

    Returns ``(model_state, optim_state, epoch, step, ema_state_or_None)``
    as host numpy, following the reference checkpoint ABI
    (``runners/diffpose_frame.py:248-255``).
    """
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    def to_np(d):
        return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v for k, v in d.items()}

    model_state = to_np(states[0])
    optim_state = states[1] if len(states) > 1 else None
    epoch = states[2] if len(states) > 2 else 0
    step = states[3] if len(states) > 3 else 0
    ema_state = to_np(states[4]) if len(states) > 4 and states[4] is not None else None
    return model_state, optim_state, epoch, step, ema_state

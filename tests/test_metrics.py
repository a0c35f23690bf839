import numpy as np
import jax.numpy as jnp

from diffpose_tpu import metrics
from tests.oracle import load_reference_module


def test_mpjpe_matches_reference_oracle(rng):
    loss = load_reference_module("common.loss")
    import torch

    pred = rng.normal(size=(8, 17, 3)).astype(np.float32)
    tgt = rng.normal(size=(8, 17, 3)).astype(np.float32)
    want = loss.mpjpe(torch.from_numpy(pred), torch.from_numpy(tgt)).item()
    got = float(metrics.mpjpe(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_p_mpjpe_matches_reference_oracle(rng):
    loss = load_reference_module("common.loss")

    pred = rng.normal(size=(6, 17, 3)).astype(np.float64)
    tgt = rng.normal(size=(6, 17, 3)).astype(np.float64)
    want = float(loss.p_mpjpe(pred.copy(), tgt.copy()))
    got = float(metrics.p_mpjpe(jnp.asarray(pred, jnp.float32), jnp.asarray(tgt, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_procrustes_recovers_similarity_transform(rng):
    # Target = scale·pred·R + t  →  aligned error should be ~0.
    from scipy.spatial.transform import Rotation

    pred = rng.normal(size=(4, 17, 3))
    r = Rotation.random(random_state=0).as_matrix()
    tgt = 1.7 * pred @ r.T + rng.normal(size=(4, 1, 3))
    err = np.asarray(metrics.p_mpjpe_per_sample(jnp.asarray(pred, jnp.float32), jnp.asarray(tgt, jnp.float32)))
    assert err.max() < 1e-4


def test_procrustes_reflection_fix(rng):
    # Mirrored target: alignment must not use a reflection; error stays > 0
    # but finite and matches the reference.
    loss = load_reference_module("common.loss")
    pred = rng.normal(size=(3, 17, 3)).astype(np.float64)
    tgt = pred.copy()
    tgt[..., 0] *= -1
    want = float(loss.p_mpjpe(pred.copy(), tgt.copy()))
    got = float(metrics.p_mpjpe(jnp.asarray(pred, jnp.float32), jnp.asarray(tgt, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got > 1e-3


def test_n_mpjpe_matches_reference_oracle(rng):
    loss = load_reference_module("common.loss")
    import torch

    pred = rng.normal(size=(2, 4, 17, 3)).astype(np.float32)
    tgt = rng.normal(size=(2, 4, 17, 3)).astype(np.float32)
    want = loss.n_mpjpe(torch.from_numpy(pred), torch.from_numpy(tgt)).item()
    got = float(metrics.n_mpjpe(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_action_accounting_single_action_batches():
    error_sum = metrics.define_error_list(metrics.H36M_ACTIONS)
    p1 = np.array([0.04, 0.06])
    p2 = np.array([0.03, 0.05])
    metrics.accumulate_action_errors(error_sum, p1, p2, ["Walking 1", "Walking 1"])
    p1_avg, p2_avg = error_sum["Walking"]["p1"].avg, error_sum["Walking"]["p2"].avg
    np.testing.assert_allclose(p1_avg, 0.05)
    np.testing.assert_allclose(p2_avg, 0.04)
    # Across-action average counts only populated actions after the fact —
    # here every other action is zero, matching the reference's convention
    # that all 15 actions appear in a full eval.
    m1, m2 = metrics.summarize_action_errors(error_sum)
    np.testing.assert_allclose(m1, 0.05 * 1000 / 15)


def test_action_accounting_mixed_batch_reference_compat():
    error_sum = metrics.define_error_list(["Eating", "Walking"])
    p1 = np.array([0.02, 0.04])
    p2 = np.array([0.01, 0.03])
    metrics.accumulate_action_errors(error_sum, p1, p2, ["Eating", "Walking 1"])
    np.testing.assert_allclose(error_sum["Eating"]["p1"].avg, 0.02)
    np.testing.assert_allclose(error_sum["Walking"]["p1"].avg, 0.04)
    # reference quirk: p2 gets the batch mean for both actions
    np.testing.assert_allclose(error_sum["Eating"]["p2"].avg, 0.02)
    np.testing.assert_allclose(error_sum["Walking"]["p2"].avg, 0.02)

    fixed = metrics.define_error_list(["Eating", "Walking"])
    metrics.accumulate_action_errors(
        fixed, p1, p2, ["Eating", "Walking 1"], reference_compat=False
    )
    np.testing.assert_allclose(fixed["Eating"]["p2"].avg, 0.01)
    np.testing.assert_allclose(fixed["Walking"]["p2"].avg, 0.03)


def test_table_output_format(capsys):
    error_sum = metrics.define_error_list(["Eating"])
    error_sum["Eating"]["p1"].update(0.0497, 1)
    error_sum["Eating"]["p2"].update(0.0391, 1)
    metrics.summarize_action_errors(error_sum, print_table=True)
    out = capsys.readouterr().out
    assert "===Action=== ==p#1 mm== =p#2 mm=" in out
    assert "Eating        49.70      39.10" in out
    assert "Average       49.70      39.10" in out


def test_procrustes_quat_matches_svd():
    """The quaternion (QUEST) Procrustes — the default, branch-free path
    that fuses into device programs — matches the literal SVD reference
    algorithm on realistic data (docs/PERF.md round 4)."""
    import numpy as np
    import jax.numpy as jnp

    from diffpose_tpu.metrics import p_mpjpe_per_sample, procrustes_align

    rng = np.random.default_rng(7)
    tgt = jnp.asarray(rng.normal(size=(512, 17, 3)).astype(np.float32)) * 0.3
    # realistic structure: rotated+scaled target with noise, plus a
    # mirrored variant (exercises the proper-rotation constraint)
    th = 0.9
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    pred = jnp.asarray(
        (np.asarray(tgt) @ rot.T) * 1.4
        + 0.03 * rng.normal(size=tgt.shape).astype(np.float32))
    mirrored = pred * jnp.asarray([1.0, -1.0, 1.0])

    def p2(p, method):
        al = procrustes_align(p, tgt, method=method)
        return np.asarray(jnp.mean(jnp.linalg.norm(al - tgt, axis=-1), axis=-1))

    # clean rotation: exact agreement; mirrored: the proper-rotation
    # constraint engages — aligned points agree to f32 working precision
    # and the METRIC (what parity is measured in) to ≪ the 0.5 mm budget
    a_svd = np.asarray(procrustes_align(pred, tgt, method="svd"))
    a_q = np.asarray(procrustes_align(pred, tgt, method="quat"))
    np.testing.assert_allclose(a_q, a_svd, atol=2e-5)
    a_svd = np.asarray(procrustes_align(mirrored, tgt, method="svd"))
    a_q = np.asarray(procrustes_align(mirrored, tgt, method="quat"))
    np.testing.assert_allclose(a_q, a_svd, atol=2e-3)
    assert np.abs(p2(mirrored, "svd") - p2(mirrored, "quat")).max() * 1000 < 0.05

    # fully random clouds: metric-level agreement well inside the budget
    p = jnp.asarray(rng.normal(size=(512, 17, 3)).astype(np.float32)) * 0.3
    d_mm = np.abs(p2(p, "svd") - p2(p, "quat")) * 1000.0
    assert d_mm.max() < 0.05, d_mm.max()
    # the aligned result is a proper similarity transform: alignment of
    # target onto itself is exact
    self_p2 = np.asarray(p_mpjpe_per_sample(tgt, tgt)) * 1000.0
    assert self_p2.max() < 1e-3

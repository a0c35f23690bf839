import numpy as np

from diffpose_tpu.geometry import (
    camera_to_world,
    image_coordinates,
    normalize_screen_coordinates,
    project_to_2d,
    project_to_2d_linear,
    qinverse,
    qrot,
    world_to_camera,
)


def _quat_to_matrix(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_qrot_matches_rotation_matrix(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    v = rng.normal(size=(5, 3))
    got = qrot(np.broadcast_to(q, (5, 4)), v)
    want = v @ _quat_to_matrix(q).T
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_qinverse_roundtrip(rng):
    q = rng.normal(size=(7, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(7, 3))
    np.testing.assert_allclose(qrot(qinverse(q), qrot(q, v)), v, atol=1e-12)


def test_world_camera_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    x = rng.normal(size=(10, 3))
    cam = world_to_camera(x, q, t)
    back = camera_to_world(cam, q, t)
    np.testing.assert_allclose(back, x, atol=1e-10)


def test_screen_coordinate_roundtrip(rng):
    x = rng.uniform(0, 1000, size=(6, 2))
    n = normalize_screen_coordinates(x, w=1000, h=1002)
    np.testing.assert_allclose(image_coordinates(n, w=1000, h=1002), x, atol=1e-9)
    # [0, w] maps to [-1, 1] on u.
    corners = normalize_screen_coordinates(np.array([[0.0, 0.0], [1000.0, 0.0]]), 1000, 1002)
    np.testing.assert_allclose(corners[:, 0], [-1.0, 1.0], atol=1e-12)


def test_projection_distortion_free_matches_linear(rng):
    # With zero distortion coefficients the full model equals the pinhole one.
    cam = np.zeros((4, 9), dtype=np.float32)
    cam[:, :2] = rng.uniform(1.0, 3.0, size=(4, 2))
    cam[:, 2:4] = rng.uniform(-0.1, 0.1, size=(4, 2))
    pts = rng.normal(size=(4, 17, 3)).astype(np.float32)
    pts[..., 2] += 5.0
    full = np.asarray(project_to_2d(pts, cam))
    lin = np.asarray(project_to_2d_linear(pts, cam))
    np.testing.assert_allclose(full, lin, atol=1e-6)


def test_projection_matches_reference_oracle(rng):
    from tests.oracle import load_reference_module

    ref_cam = load_reference_module("common.camera")
    import torch

    cam = rng.uniform(-0.2, 0.2, size=(3, 9)).astype(np.float32)
    cam[:, :2] = rng.uniform(1.0, 3.0, size=(3, 2))
    pts = rng.normal(size=(3, 17, 3)).astype(np.float32)
    pts[..., 2] += 4.0
    ref = ref_cam.project_to_2d(torch.from_numpy(pts), torch.from_numpy(cam)).numpy()
    ours = np.asarray(project_to_2d(pts, cam))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

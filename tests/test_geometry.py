"""Geometry core unit tests: round-trips, torch-parity for the math that
feeds checkpoint parity (project/unproject, ortho6d, ray samples)."""
import numpy as np
import jax.numpy as jnp
import pytest

from parq_tpu.geometry import (Camera, Obb3D, Pose, depth_planes, grid_2d,
                               inverse_sigmoid, pad_obbs_np, ray_points_snippet,
                               rot_to_6d, rotation_matrix_from_ortho6d, roty)


def random_rotation(rng, shape=()):
    """Uniform-ish random rotations via QR."""
    A = rng.randn(*shape, 3, 3)
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q = Q * np.sign(det)[..., None, None]
    return Q


def test_pose_roundtrip(rng):
    R = random_rotation(rng, (4,))
    t = rng.randn(4, 3)
    p = Pose.from_Rt(R, t)
    np.testing.assert_allclose(p.R, R, atol=1e-6)
    np.testing.assert_allclose(p.t, t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p.matrix)[..., :3, :3], R, atol=1e-6)

    # inverse ∘ self == identity
    comp = p.compose(p.inverse())
    np.testing.assert_allclose(comp.R, np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(comp.t, np.zeros((4, 3)), atol=1e-5)


def test_pose_transform_matches_matrix(rng):
    R = random_rotation(rng, (2,))
    t = rng.randn(2, 3)
    p = Pose.from_Rt(R, t)
    pts = rng.randn(2, 7, 3)
    out = p.transform(jnp.asarray(pts))
    expect = np.einsum("bij,bnj->bni", R, pts) + t[:, None]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_pose_compose_semantics(rng):
    # T_B2C.compose(T_A2B) acts like applying A2B then B2C
    Ra, ta = random_rotation(rng), rng.randn(3)
    Rb, tb = random_rotation(rng), rng.randn(3)
    A2B = Pose.from_Rt(Ra, ta)
    B2C = Pose.from_Rt(Rb, tb)
    A2C = B2C @ A2B
    pts = rng.randn(5, 3)
    np.testing.assert_allclose(
        A2C.transform(jnp.asarray(pts)),
        B2C.transform(A2B.transform(jnp.asarray(pts))), atol=1e-5)


def test_camera_project_unproject(rng):
    cam = Camera.from_params(320.0, 240.0, 200.0, 210.0, 160.0, 120.0)
    cam = Camera(jnp.broadcast_to(cam.data, (2, 6)))
    uv = jnp.asarray(rng.rand(2, 10, 2) * np.array([319, 239]))
    rays = cam.unproject(uv)
    assert rays.shape == (2, 10, 3)
    np.testing.assert_allclose(rays[..., 2], 1.0)
    # project back at depth 2
    p2d, valid = cam.project(rays * 2.0)
    np.testing.assert_allclose(p2d, uv, atol=1e-4)
    assert bool(jnp.all(valid))


def test_camera_project_validity():
    cam = Camera.from_params(320.0, 240.0, 200.0, 200.0, 160.0, 120.0)
    cam = Camera(cam.data[None])
    pts = jnp.asarray([[[0.0, 0.0, 2.0],     # center, valid
                        [0.0, 0.0, -1.0],    # behind camera
                        [100.0, 0.0, 0.5]]]) # out of image
    _, valid = cam.project(pts)
    assert valid.tolist() == [[True, False, False]]


def test_camera_scale_matches_reference_formula():
    cam = Camera.from_params(1296.0, 968.0, 1170.0, 1170.0, 647.0, 483.0)
    s = 0.25
    scaled = cam.scale(s)
    np.testing.assert_allclose(scaled.size, np.array([1296, 968]) * s)
    np.testing.assert_allclose(scaled.f, np.array([1170, 1170]) * s)
    np.testing.assert_allclose(scaled.c,
                               (np.array([647, 483]) + 0.5) * s - 0.5)


def test_obb_corners_and_padding(rng):
    bb3 = np.array([[-1.0, 1.0, -2.0, 2.0, 0.0, 3.0]])
    T = Pose.identity((1,))
    obb = Obb3D.from_parts(jnp.asarray(bb3), T.data, jnp.asarray([4.0]))
    corners = np.asarray(obb.corners_object)[0]
    # reference ordering: first corner is (xmin, ymin, zmin)
    np.testing.assert_allclose(corners[0], [-1, -2, 0])
    np.testing.assert_allclose(corners[1], [1, -2, 0])
    np.testing.assert_allclose(corners[2], [1, 2, 0])
    np.testing.assert_allclose(corners[6], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(obb.bb3_size)[0], [2, 4, 3])

    padded = obb.pad_to(5)
    assert padded.data.shape == (5, 19)
    mask = np.asarray(padded.valid_mask())
    assert mask.tolist() == [True, False, False, False, False]

    # numpy-side builder agrees
    arr = pad_obbs_np(bb3, np.asarray(T.data), np.array([4.0]), max_box=5)
    np.testing.assert_allclose(arr, np.asarray(padded.data))


def test_ortho6d_roundtrip(rng):
    R = random_rotation(rng, (16,))
    six = rot_to_6d(jnp.asarray(R))
    R2 = rotation_matrix_from_ortho6d(six)
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_ortho6d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    raw = rng.randn(8, 6).astype(np.float32)

    # torch oracle re-derived from ref utils/ortho6d_transforms.py semantics
    def torch_ortho6d(o):
        x_raw, y_raw = o[:, 0:3], o[:, 3:6]
        x = x_raw / x_raw.norm(dim=1, keepdim=True).clamp(min=1e-8)
        z = torch.cross(x, y_raw, dim=1)
        z = z / z.norm(dim=1, keepdim=True).clamp(min=1e-8)
        y = torch.cross(z, x, dim=1)
        return torch.stack([x, y, z], dim=2)

    expect = torch_ortho6d(torch.from_numpy(raw)).numpy()
    got = np.asarray(rotation_matrix_from_ortho6d(jnp.asarray(raw)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_depth_planes_log_spacing():
    d = np.asarray(depth_planes(64, 0.25, 5.25))
    assert d.shape == (64,)
    np.testing.assert_allclose(d[0], 0.25, rtol=1e-6)
    np.testing.assert_allclose(d[-1], 5.25, rtol=1e-6)
    # log-spaced: ratios constant
    r = d[1:] / d[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-5)


def test_grid_2d():
    g = np.asarray(grid_2d(4, 3))
    assert g.shape == (3, 4, 2)
    np.testing.assert_allclose(g[0, :, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(g[:, 0, 1], [0, 1, 2])


def test_inverse_sigmoid_clamps():
    x = jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0])
    out = np.asarray(inverse_sigmoid(x))
    # ref clamps x and 1−x independently: at x=0 → log(1e-3/1)
    expect = np.log([1e-3, 1e-3, 1.0, 1e3, 1e3])
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_ray_points_snippet_shapes_and_geometry(rng):
    B, T, H, W, N = 2, 3, 6, 8, 4
    cam = Camera.from_params(float(W), float(H), 10.0, 10.0, W / 2, H / 2)
    cam = Camera(jnp.broadcast_to(cam.data, (B, T, 6)))
    # identity everything: points should equal camera-frame ray samples
    I = Pose.identity((B, T))
    T_local_world = Pose.identity((B, 1))
    pix = grid_2d(W, H)
    pts = ray_points_snippet(pix, cam, I, I, T_local_world, N, 0.5, 2.0)
    assert pts.shape == (B, T, H, W, N, 3)
    # center pixel ray: x == y == 0 scaled by depth
    cx, cy = W // 2, H // 2
    center = np.asarray(pts[0, 0, cy, cx])
    np.testing.assert_allclose(center[:, 0], 0.0, atol=1e-5)
    d = np.asarray(depth_planes(N, 0.5, 2.0))
    np.testing.assert_allclose(center[:, 2], d, atol=1e-5)


def test_roty():
    R = np.asarray(roty(np.pi / 2))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(R @ np.array([0.0, 0, 1]), [1, 0, 0], atol=1e-6)


def test_ray_points_snippet_fused_matches_reference(rng):
    """Fused (direction-rotated) formulation == the reference formulation
    R @ (ray·d) + t at f32 tolerance."""
    import jax.numpy as jnp
    from parq_tpu.geometry import (Camera, Pose, grid_2d, ray_points_snippet,
                                   ray_points_snippet_fused)

    B, T, W, H, n = 2, 3, 8, 6, 16

    def rand_pose(r):
        a, b, c = r.randn(3) * 0.4
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                       [-np.sin(b), 0, np.cos(b)]])
        Rz = np.array([[np.cos(c), -np.sin(c), 0],
                       [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        R = (Rx @ Ry @ Rz).astype(np.float32)
        return np.concatenate([R.reshape(9),
                               (r.randn(3)).astype(np.float32)])

    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(W), float(H), 3.0, 3.0, W / 2, H / 2).data,
        (B, T, 6)))
    Tcp = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng) for _ in range(T)] for _ in range(B)]), jnp.float32))
    Twp = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng) for _ in range(T)] for _ in range(B)]), jnp.float32))
    Tlw = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng)] for _ in range(B)]), jnp.float32))

    grid = grid_2d(W, H)
    a = ray_points_snippet(grid, cam, Tcp, Twp, Tlw, n, 0.25, 5.25)
    b = ray_points_snippet_fused(grid, cam, Tcp, Twp, Tlw, n, 0.25, 5.25)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_ray_dirs_snippet_factorization(rng):
    """rdir · depth_n + t (the channel-major factored form AddRayPE
    consumes) == ray_points_snippet, for every sample index."""
    import jax.numpy as jnp
    from parq_tpu.geometry import (Camera, Pose, depth_planes, grid_2d,
                                   ray_dirs_snippet, ray_points_snippet)

    B, T, W, H, n = 2, 3, 8, 6, 16

    def rand_pose(r):
        a, b, c = r.randn(3) * 0.4
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                       [0, np.sin(a), np.cos(a)]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                       [-np.sin(b), 0, np.cos(b)]])
        Rz = np.array([[np.cos(c), -np.sin(c), 0],
                       [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        R = (Rx @ Ry @ Rz).astype(np.float32)
        return np.concatenate([R.reshape(9),
                               (r.randn(3)).astype(np.float32)])

    cam = Camera(jnp.broadcast_to(
        Camera.from_params(float(W), float(H), 3.0, 3.0, W / 2, H / 2).data,
        (B, T, 6)))
    Tcp = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng) for _ in range(T)] for _ in range(B)]), jnp.float32))
    Twp = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng) for _ in range(T)] for _ in range(B)]), jnp.float32))
    Tlw = Pose(jnp.asarray(np.stack(
        [[rand_pose(rng)] for _ in range(B)]), jnp.float32))

    grid = grid_2d(W, H)
    want = ray_points_snippet(grid, cam, Tcp, Twp, Tlw, n, 0.25, 5.25)
    rdir, t = ray_dirs_snippet(grid, cam, Tcp, Twp, Tlw)
    d = depth_planes(n, 0.25, 5.25)
    got = (rdir[..., None] * d
           + t[:, :, None, :, None])            # (B, T, HW, 3, n)
    got = jnp.moveaxis(got, -1, -2).reshape(B, T, H, W, n, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

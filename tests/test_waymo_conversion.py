"""Round-trip tests for the self-contained Waymo range-image conversion
(openpcseg_tpu/data/waymo_conversion.py; reference delegates this math to
waymo_open_dataset range_image_utils — unavailable here, hence rederived).
"""
import numpy as np

from openpcseg_tpu.data.waymo_conversion import (
    compute_inclinations,
    range_image_to_cartesian,
    range_image_to_points,
)


def rays(h, w, extrinsic):
    """Bin-center ray directions in the sensor frame, row 0 = top beam."""
    incl = compute_inclinations(-0.3, 0.04, h)[::-1]     # reverse: top first
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    az = (np.pi - 2 * np.pi * (np.arange(w) + 0.5) / w)[None, :] - az_corr
    ci, si = np.cos(incl)[:, None], np.sin(incl)[:, None]
    d = np.stack([ci * np.cos(az), ci * np.sin(az),
                  si * np.ones_like(az)], axis=-1)
    return d, incl


def test_roundtrip_identity_extrinsic():
    h, w = 16, 64
    ext = np.eye(4)
    d, incl = rays(h, w, ext)
    rng = np.random.default_rng(0)
    r = rng.uniform(2.0, 60.0, (h, w))
    r[rng.random((h, w)) < 0.3] = 0.0                    # misses
    xyz = range_image_to_cartesian(r, ext, incl)
    expect = d * r[..., None]
    m = r > 0
    np.testing.assert_allclose(xyz[m], expect[m], atol=1e-4)


def test_roundtrip_with_extrinsic():
    h, w = 8, 32
    th = 0.4
    ext = np.eye(4)
    ext[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                            [np.sin(th), np.cos(th), 0],
                            [0, 0, 1]])
    ext[:3, 3] = [1.5, -0.2, 2.1]
    d, incl = rays(h, w, ext)
    r = np.full((h, w), 10.0)
    xyz = range_image_to_cartesian(r, ext, incl)
    # sensor-frame point pushed through the extrinsic
    expect = (d * 10.0) @ ext[:3, :3].T + ext[:3, 3]
    np.testing.assert_allclose(xyz, expect, atol=1e-4)


def test_pixel_pose_roundtrip():
    h, w = 4, 16
    ext = np.eye(4)
    _, incl = rays(h, w, ext)
    r = np.full((h, w), 5.0)
    # frame pose = some rigid transform; pixel poses = the same transform
    # everywhere -> vehicle coords must equal the no-pose result
    th = 0.7
    fp = np.eye(4)
    fp[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                           [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    fp[:3, 3] = [3, 4, 5]
    pp = np.broadcast_to(fp, (h, w, 4, 4)).copy()
    base = range_image_to_cartesian(r, ext, incl)
    got = range_image_to_cartesian(r, ext, incl, pixel_pose=pp,
                                   frame_pose=fp)
    np.testing.assert_allclose(got, base, atol=1e-4)


def test_points_layout_and_mask():
    h, w = 8, 32
    ext = np.eye(4)
    _, incl = rays(h, w, ext)
    ri = np.zeros((h, w, 4), np.float32)
    ri[..., 0] = 20.0
    ri[2, 5, 0] = -1.0                                   # a miss
    ri[..., 1] = 0.5                                     # intensity
    ri[..., 2] = 0.25                                    # elongation
    lab = np.full((h, w), 7, np.int32)
    pts, labels = range_image_to_points(ri, ext, incl, labels_img=lab)
    assert pts.shape == (h * w - 1, 6)
    assert labels.shape == (h * w - 1,)
    np.testing.assert_allclose(pts[:, 0], 20.0)
    np.testing.assert_allclose(pts[:, 1], 0.5)
    np.testing.assert_allclose(
        np.linalg.norm(pts[:, 3:6], axis=1), 20.0, rtol=1e-5)
    assert (labels == 7).all()

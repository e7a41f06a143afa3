"""Fusion range image row override (Waymo fusion view): inclination-binned
rows replace the ring-id column when the sensor has no ring channel.
Reference context: waymo_fusion.py never builds a range image at all (its
fusion view degenerates to voxel); here RPVNet-on-Waymo gets a real one.
"""
import numpy as np

from openpcseg_tpu.data.fusion_view import build_fusion_range_image


def make_points(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 5), np.float32)
    pts[:, :3] = rng.uniform(-40, 40, (n, 3))
    pts[:, 2] = rng.uniform(-3, 6, n)
    pts[:, 3] = rng.random(n)
    pts[:, 4] = rng.integers(0, 64, n)  # fake ring ids
    return pts


def test_default_rows_use_ring_column():
    pts = make_points()
    img, pxpy = build_fusion_range_image(
        pts, h=64, w=512, rng=np.random.default_rng(0))
    assert img.shape == (64, 512, 5)
    assert pxpy.shape == (len(pts), 2)
    assert np.abs(pxpy).max() <= 1.0
    assert (img[..., 0] != 0).sum() > 100  # range channel populated


def test_row_override_changes_binning():
    pts = make_points()
    rng_state = np.random.default_rng(0)
    # inclination-binned rows (what the Waymo view computes)
    depth = np.maximum(np.linalg.norm(pts[:, :3], 2, axis=1), 1e-6)
    pitch = np.arcsin(np.clip(pts[:, 2] / depth, -1, 1))
    fov_up, fov_dn = np.deg2rad(2.4), np.deg2rad(-17.6)
    frac = 1.0 - (pitch - fov_dn) / (fov_up - fov_dn)
    rows = np.floor(frac * 64).astype(np.int32)

    img_r, pxpy_r = build_fusion_range_image(
        pts, h=64, w=512, rng=np.random.default_rng(0), row=rows)
    img_d, _ = build_fusion_range_image(
        pts, h=64, w=512, rng=np.random.default_rng(0))
    # same azimuth handling, different row assignment
    assert img_r.shape == img_d.shape
    assert not np.array_equal(img_r[..., 0], img_d[..., 0])
    # out-of-fov rows are clipped into the image
    occupied_rows = np.unique(np.where((img_r[..., 0] != 0))[0])
    assert occupied_rows.min() >= 0 and occupied_rows.max() <= 63


def test_waymo_fusion_row_binning_matches_fov():
    # a point exactly at the top of the fov lands near row 0, bottom near 63
    from openpcseg_tpu.data.waymo import WaymoFusionDataset
    up = np.deg2rad(WaymoFusionDataset.RANGE_FOV_UP)
    dn = np.deg2rad(WaymoFusionDataset.RANGE_FOV_DOWN)
    r = 30.0
    top = np.array([[r * np.cos(up), 0, r * np.sin(up), 0.5, 0]],
                   np.float32)
    bot = np.array([[r * np.cos(dn), 0, r * np.sin(dn), 0.5, 0]],
                   np.float32)
    depth = np.linalg.norm(top[:, :3], 2, axis=1)
    pitch = np.arcsin(top[:, 2] / depth)
    frac = 1.0 - (pitch - dn) / (up - dn)
    assert int(np.floor(frac * 64)) <= 1
    depthb = np.linalg.norm(bot[:, :3], 2, axis=1)
    pitchb = np.arcsin(bot[:, 2] / depthb)
    fracb = 1.0 - (pitchb - dn) / (up - dn)
    assert int(np.floor(fracb * 64)) >= 62


def test_range_mix_matches_reference_checkerboard():
    """range_mix reproduces the reference colNrowM semantics: e.g. col2row3
    = 2 column x 3 row alternating bands (semantickitti_rv.py col2row3)."""
    import openpcseg_tpu.data.range_view as rv

    h, w = 12, 8
    a_scan = np.zeros((h, w, 3), np.float32)
    b_scan = np.ones((h, w, 3), np.float32)
    a_lab = np.zeros((h, w), np.int32)
    b_lab = np.ones((h, w), np.int32)
    a_msk = np.zeros((h, w), bool)
    b_msk = np.ones((h, w), bool)

    class FixedRng:
        def integers(self, n):
            return rv.MIXTEACHER_V2_STRATEGIES.index((2, 3))
        def random(self):
            return 0.3  # < 0.5 -> complement branch (mix2)

    sm, lm, mm = rv.range_mix(a_scan, a_lab, a_msk,
                              b_scan, b_lab, b_msk, FixedRng())
    # complement of the (2 cols, 3 rows) checkerboard: cell (0,0) takes A
    # in mix1, so complement takes B
    h1, mid = h // 3, w // 2
    assert lm[:h1, :mid].min() == 1          # top-left from B
    assert lm[h1:2*h1, :mid].max() == 0      # middle-left from A
    assert lm[:h1, mid:].max() == 0          # top-right from A
    assert lm[h1:2*h1, mid:].min() == 1      # middle-right from B
    # every cell comes wholly from one source
    assert set(np.unique(lm)) <= {0, 1}

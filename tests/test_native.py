"""Native IO library parity vs the numpy reference paths."""
import numpy as np
import pytest

from openpcseg_tpu import native
from openpcseg_tpu.data.range_view import range_project, pack_scan_tensor
from openpcseg_tpu.data.semantickitti_meta import LEARNING_MAP_LUT


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no toolchain)")
    return lib


def test_scan_and_label_loading(tmp_path, lib, rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    pts.tofile(tmp_path / "s.bin")
    raw = rng.choice([0, 10, 40, 252], 1000).astype(np.uint32)
    raw |= rng.integers(0, 4, 1000).astype(np.uint32) << 16
    raw.tofile(tmp_path / "s.label")

    got = native.load_kitti_scan(str(tmp_path / "s.bin"))
    np.testing.assert_array_equal(got, pts)
    lab = native.load_kitti_labels(str(tmp_path / "s.label"), LEARNING_MAP_LUT)
    expect = LEARNING_MAP_LUT[(raw & 0xFFFF).astype(np.int64)]
    np.testing.assert_array_equal(lab, expect)


def test_range_projection_parity(lib, rng):
    n = 20000
    pts = rng.uniform(-40, 40, (n, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 1, n)
    # ensure distinct depths so z-buffer tie-breaking can't differ
    labels = rng.integers(0, 20, n).astype(np.int32)
    h, w = 32, 512

    out = native.range_project_native(pts, labels, h, w)
    assert out is not None
    scan_n, label_n, mask_n, px_n, py_n = out

    ref = range_project(pts[:, :3], pts[:, 3], labels, h, w)
    scan_r, label_r, mask_r = pack_scan_tensor(ref)

    np.testing.assert_array_equal(px_n, ref["proj_x"])
    np.testing.assert_array_equal(py_n, ref["proj_y"])
    np.testing.assert_array_equal(mask_n, ref["xyz_mask"])
    np.testing.assert_allclose(scan_n, scan_r, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(label_n, label_r)

"""TB event writer + eval tables: roundtrip and content checks."""
import struct

import numpy as np

from openpcseg_tpu.utils.reporting import confusion_table, iou_table
from openpcseg_tpu.utils.tb_writer import TBWriter, _masked_crc


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return out
            (n,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(hdr)
            data = f.read(n)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(data)
            out.append(data)


def _parse_proto(data):
    """Minimal proto walk -> {field: [values]} (nested = raw bytes)."""
    fields = {}
    i = 0
    while i < len(data):
        key = 0
        shift = 0
        while True:
            b = data[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", data[i:i + 8])[0]
            i += 8
        elif wire == 5:
            v = struct.unpack("<f", data[i:i + 4])[0]
            i += 4
        elif wire == 2:
            n = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                n |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = data[i:i + n]
            i += n
        else:
            raise AssertionError(f"wire {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def test_tb_writer_roundtrip(tmp_path):
    w = TBWriter(tmp_path / "tb")
    w.add_scalar("val_miou", 61.25, step=3)
    w.add_scalars({"val/car": 90.5, "val/road": 85.0}, step=3)
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1
    recs = _read_records(files[0])
    assert len(recs) == 3
    # record 0: file_version
    ev0 = _parse_proto(recs[0])
    assert ev0[3][0] == b"brain.Event:2"
    # record 1: step 3, one scalar
    ev1 = _parse_proto(recs[1])
    assert ev1[2][0] == 3
    summ = _parse_proto(ev1[5][0])
    val = _parse_proto(summ[1][0])
    assert val[1][0] == b"val_miou"
    assert abs(val[2][0] - 61.25) < 1e-6
    # record 2: two scalars in one event
    ev2 = _parse_proto(recs[2])
    summ2 = _parse_proto(ev2[5][0])
    tags = {_parse_proto(v)[1][0]: _parse_proto(v)[2][0] for v in summ2[1]}
    assert tags == {
        b"val/car": np.float32(90.5), b"val/road": np.float32(85.0)}


def test_iou_table_contents():
    t = iou_table(55.5, np.asarray([90.0, 21.0]), ["car", "bicycle"])
    assert "Validation iou" in t
    assert "| All" in t and "55.5" in t
    assert "car" in t and "90.0" in t and "bicycle" in t


def test_confusion_table_row_normalized():
    hist = np.asarray([[8, 2], [1, 3]])
    t = confusion_table(hist, ["car", "road"])
    assert "Confusion matrix" in t
    assert "80.0" in t   # 8/10 row-normalized %
    assert "| 10" in t or " 10 " in t  # points column
    assert "75.0" in t   # 3/4

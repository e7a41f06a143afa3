"""Config system tests: YAML load, _BASE_CONFIG_ inheritance, CLI overrides
(reference surface: tools/utils/train/config.py:6-84)."""
import textwrap

import pytest

from openpcseg_tpu.config import (
    CfgDict,
    cfg_from_list,
    cfg_from_yaml_file,
)


def test_attribute_access_and_nesting():
    c = CfgDict({"A": {"B": {"C": 1}}, "L": [{"X": 2}]})
    assert c.A.B.C == 1
    assert c.L[0].X == 2
    c.A.B.D = 5
    assert c["A"]["B"]["D"] == 5
    with pytest.raises(AttributeError):
        _ = c.MISSING


def test_base_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(textwrap.dedent("""
        MODEL:
            NAME: MinkUNet
            cr: 1.0
        OPTIM:
            LR_PER_SAMPLE: 0.02
    """))
    child = tmp_path / "cfgs" / "voxel" / "child.yaml"
    child.parent.mkdir(parents=True)
    child.write_text(textwrap.dedent(f"""
        _BASE_CONFIG_: {base}
        MODEL:
            cr: 0.5
    """))
    cfg = cfg_from_yaml_file(child)
    assert cfg.MODEL.NAME == "MinkUNet"      # inherited
    assert cfg.MODEL.cr == 0.5               # overridden
    assert cfg.OPTIM.LR_PER_SAMPLE == 0.02   # inherited
    assert cfg.TAG == "child"
    assert cfg.EXP_GROUP_PATH == "voxel"     # path below cfgs/


def test_cli_overrides():
    cfg = CfgDict({"MODEL": {"cr": 1.0, "NUM_LAYER": [1, 2]},
                   "OPTIM": {"LR": 0.1}})
    cfg_from_list(["MODEL.cr", "0.25",
                   "OPTIM.LR", "1e-3",
                   "MODEL.NUM_LAYER", "[3,4]",
                   "NEW.KEY", "hello"], cfg)
    assert cfg.MODEL.cr == 0.25
    assert cfg.OPTIM.LR == 1e-3
    assert cfg.MODEL.NUM_LAYER == [3, 4]
    assert cfg.NEW.KEY == "hello"


def test_cli_override_list_type_mismatch():
    cfg = CfgDict({"MODEL": {"NUM_LAYER": [1, 2]}})
    with pytest.raises(ValueError):
        cfg_from_list(["MODEL.NUM_LAYER", "7"], cfg)


def test_all_shipped_configs_parse():
    from pathlib import Path
    root = Path(__file__).resolve().parents[1] / "tools" / "cfgs"
    yamls = sorted(root.rglob("*.yaml"))
    assert len(yamls) >= 25
    import jax.numpy as jnp
    from openpcseg_tpu.data import num_classes_for
    from openpcseg_tpu.engine import SegTask
    for y in yamls:
        cfg = cfg_from_yaml_file(y)
        assert "MODALITY" in cfg and "MODEL" in cfg and "OPTIM" in cfg
        assert cfg.MODEL.NAME  # registry key present
        nc = num_classes_for(cfg.DATA.DATASET)
        SegTask(cfg, nc, batch_per_device=1, iters_per_epoch=10,
                total_epochs=1, compute_dtype=jnp.float32)


def test_all_reference_yamls_load_and_construct():
    """Schema compatibility is enforced, not claimed: every YAML under the
    reference's tools/cfgs must load through cfg_from_yaml_file and
    construct a SegTask (no step run). Reference: /root/reference/tools/cfgs."""
    import glob
    import jax.numpy as jnp
    from openpcseg_tpu.config import cfg_from_yaml_file, CfgDict
    from openpcseg_tpu.data import num_classes_for
    from openpcseg_tpu.engine import SegTask

    ref_cfgs = sorted(glob.glob("/root/reference/tools/cfgs/**/*.yaml",
                                recursive=True))
    if not ref_cfgs:
        import pytest
        pytest.skip("reference checkout not present")
    assert len(ref_cfgs) == 25, ref_cfgs
    for path in ref_cfgs:
        cfgs = cfg_from_yaml_file(path, CfgDict())
        ds = cfgs.DATA.DATASET
        if ds == "nuscenes":  # reference stubs nuscenes (classes exist
            ds = "semantickitti"  # nowhere); remap like its range driver
            cfgs.DATA.DATASET = ds
        nc = num_classes_for(ds)
        task = SegTask(cfgs, nc, batch_per_device=1, iters_per_epoch=10,
                       total_epochs=1, compute_dtype=jnp.float32)
        assert task.model is not None, path

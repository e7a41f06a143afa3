"""Config system: YAML -> attribute-dict with base-file inheritance.

Preserves the reference's config surface (reference:
tools/utils/train/config.py:6-84) so every YAML under the reference's
``tools/cfgs/`` runs unchanged: ``_BASE_CONFIG_`` inheritance, dotted-key CLI
overrides, and an EasyDict-style attribute-access mapping — but implemented
standalone (no easydict dependency).
"""
from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, List

import yaml


class CfgDict(dict):
    """dict with attribute access, recursively converting nested mappings."""

    def __init__(self, d: dict | None = None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    def __setitem__(self, key, value):
        if isinstance(value, dict) and not isinstance(value, CfgDict):
            value = CfgDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                CfgDict(v) if isinstance(v, dict) and not isinstance(v, CfgDict) else v
                for v in value
            )
        super().__setitem__(key, value)

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:  # attribute protocol expects AttributeError
            raise AttributeError(key) from e

    def __deepcopy__(self, memo):
        out = CfgDict()
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out


def merge_new_config(config: CfgDict, new_config: dict) -> CfgDict:
    """Recursive merge with ``_BASE_CONFIG_`` inheritance.

    Mirrors reference tools/utils/train/config.py:50-67: a ``_BASE_CONFIG_``
    key loads the base YAML first, then overlays the rest.
    """
    if "_BASE_CONFIG_" in new_config:
        with open(new_config["_BASE_CONFIG_"], "r") as f:
            base = yaml.safe_load(f)
        config.update(CfgDict(base))

    for key, val in new_config.items():
        if key == "_BASE_CONFIG_":
            continue
        if isinstance(val, dict) and isinstance(config.get(key), dict):
            merge_new_config(config[key], val)
        else:
            config[key] = val
    return config


def cfg_from_yaml_file(cfg_file: str | Path, config: CfgDict | None = None) -> CfgDict:
    """Load a YAML experiment config (reference config.py:70-79)."""
    config = config if config is not None else CfgDict()
    with open(cfg_file, "r") as f:
        new_config = yaml.safe_load(f)
    merge_new_config(config, new_config)
    cfg_file = Path(cfg_file)
    config["TAG"] = cfg_file.stem
    # experiment group path: directory of the cfg below a 'cfgs' root if any
    parts = cfg_file.parent.parts
    if "cfgs" in parts:
        idx = len(parts) - 1 - parts[::-1].index("cfgs")
        config["EXP_GROUP_PATH"] = "/".join(parts[idx + 1:])
    else:
        config["EXP_GROUP_PATH"] = cfg_file.parent.name
    return config


def _parse_value(v: str) -> Any:
    import ast

    try:  # literals incl. scientific notation ("1e-3"), lists, bools
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        pass
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def cfg_from_list(cfg_list: List[str], config: CfgDict) -> None:
    """Apply dotted-key CLI overrides, e.g. ``OPTIM.BATCH_SIZE_PER_GPU 4``
    (reference config.py:15-47)."""
    assert len(cfg_list) % 2 == 0, "override list must be KEY VALUE pairs"
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        keys = full_key.split(".")
        d = config
        for sub in keys[:-1]:
            if sub not in d:
                d[sub] = CfgDict()
            d = d[sub]
        value = _parse_value(v)
        key = keys[-1]
        if key in d and isinstance(d[key], (list, tuple)) and not isinstance(value, (list, tuple)):
            raise ValueError(f"type mismatch for override {full_key}")
        d[key] = value


def log_config_to_file(cfg: CfgDict, pre: str = "cfg", logger=None) -> None:
    """Pretty-print the config tree (reference config.py:6-12)."""
    emit = logger.info if logger is not None else print
    for key, val in cfg.items():
        if isinstance(val, dict):
            emit(f"\n{pre}.{key} = edict()")
            log_config_to_file(val, pre=f"{pre}.{key}", logger=logger)
        else:
            emit(f"{pre}.{key}: {val}")

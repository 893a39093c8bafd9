"""YAML + CLI-dotlist configuration.

Reference analog: threestudio/utils/config.py (OmegaConf ExperimentConfig
with trial-dir layout) — re-implemented on plain dataclasses + PyYAML with
dotted CLI overrides, no OmegaConf dependency.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Any, Dict, List, Optional

import yaml


def _parse_scalar(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_dotlist(cfg: Dict[str, Any], dotlist: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` overrides (the reference's OmegaConf
    from_dotlist, utils/config.py:99-109)."""
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"override '{item}' is not key=value")
        key, value = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"cannot override non-dict node at {p} in {key}")
        node[parts[-1]] = _parse_scalar(value)
    return cfg


def load_config(path: str, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if overrides:
        apply_dotlist(cfg, overrides)
    return cfg


def parse_structured(cls, cfg: Optional[Dict[str, Any]] = None):
    """Instantiate a dataclass from a dict, recursing into dataclass fields
    (reference parse_structured, utils/config.py:121-123)."""
    cfg = cfg or {}
    if not dataclasses.is_dataclass(cls):
        return cfg
    kwargs = {}
    field_map = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in cfg.items():
        if k not in field_map:
            raise ValueError(f"unknown config key '{k}' for {cls.__name__}")
        f = field_map[k]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            kwargs[k] = parse_structured(f.type, v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def make_trial_dir(
    exp_root: str, name: str, tag: str, timestamp: Optional[str] = None
) -> str:
    """outputs/<name>/<tag>@<timestamp> trial layout (ExperimentConfig,
    utils/config.py:46-96)."""
    ts = timestamp or datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    trial = os.path.join(exp_root, name, f"{tag}@{ts}")
    os.makedirs(trial, exist_ok=True)
    return trial

"""YAML config composition: defaults lists, groups, expt presets, overrides."""

from __future__ import annotations

import copy
import os
from typing import Any, Iterable

import yaml

DEFAULT_CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")


class DotDict(dict):
    """Nested dict with attribute access."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as err:
            raise AttributeError(name) from err
        return DotDict(v) if isinstance(v, dict) and not isinstance(v, DotDict) else v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node


def merge_dicts(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def _set_path(cfg: dict, path: str, value: Any) -> None:
    parts = path.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def parse_overrides(args: Iterable[str]) -> tuple[dict[str, Any], dict[str, Any]]:
    """Split CLI args into (group_selections, key_overrides).

    ``pl=conette`` selects a group option; ``dm.bsize=3`` overrides a key;
    ``expt=[a,b]`` selects expt presets (list or single).
    """
    groups: dict[str, Any] = {}
    keys: dict[str, Any] = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"Invalid override {arg!r} (expected key=value)")
        key, raw = arg.split("=", 1)
        value = _parse_value(raw)
        if "." in key:
            keys[key] = value
        else:
            groups[key] = value
    return groups, keys


def _load_yaml(fpath: str) -> dict:
    with open(fpath) as f:
        return yaml.safe_load(f) or {}


def _load_group(conf_dir: str, group: str, option: str) -> dict:
    fpath = os.path.join(conf_dir, group, f"{option}.yaml")
    if not os.path.isfile(fpath):
        avail = []
        gdir = os.path.join(conf_dir, group)
        if os.path.isdir(gdir):
            avail = sorted(f[:-5] for f in os.listdir(gdir) if f.endswith(".yaml"))
        raise FileNotFoundError(
            f"Unknown option {option!r} for config group {group!r}. "
            f"(available: {avail})"
        )
    return _load_yaml(fpath)


def load_config(
    name: str = "train",
    overrides: Iterable[str] = (),
    conf_dir: str | None = None,
) -> DotDict:
    """Compose ``{conf_dir}/{name}.yaml`` with its defaults list, group
    selections, ``expt`` presets (applied last) and dotted overrides."""
    conf_dir = conf_dir or DEFAULT_CONF_DIR
    root = _load_yaml(os.path.join(conf_dir, f"{name}.yaml"))
    defaults = root.pop("defaults", [])

    group_sel, key_over = parse_overrides(overrides)
    # a dotless override is a group selection only when a config group
    # directory with that name exists; otherwise it's a root-level key
    for key in list(group_sel.keys()):
        if key != "expt" and not os.path.isdir(os.path.join(conf_dir, key)):
            key_over[key] = group_sel.pop(key)
    expt_sel = group_sel.pop("expt", None)

    cfg: dict = {}
    for entry in defaults:
        if isinstance(entry, str):
            if entry == "_self_":
                cfg = merge_dicts(cfg, root)
            continue
        (group, option), = entry.items()
        if group == "expt":
            continue  # expt applies last
        option = group_sel.pop(group, option)
        if option in (None, "none"):
            cfg.setdefault(group, {})
            continue
        cfg[group] = merge_dicts(cfg.get(group, {}), _load_group(conf_dir, group, option))
    if "_self_" not in [e for e in defaults if isinstance(e, str)]:
        cfg = merge_dicts(cfg, root)

    # remaining group selections not in the defaults list
    for group, option in group_sel.items():
        cfg[group] = merge_dicts(
            cfg.get(group, {}), _load_group(conf_dir, group, str(option))
        )

    # expt presets (flat overrides onto the composed config), applied last
    if expt_sel is not None:
        presets = expt_sel if isinstance(expt_sel, list) else [expt_sel]
        for preset in presets:
            cfg = merge_dicts(cfg, _load_group(conf_dir, "expt", str(preset)))

    for key, value in key_over.items():
        _set_path(cfg, key, value)
    return DotDict(cfg)

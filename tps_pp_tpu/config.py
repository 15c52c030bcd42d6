"""Python-file config system with ``_base_`` inheritance.

Functional equivalent of ``mmcv.Config.fromfile`` as used by the reference
(``tools/train.py:99``; inheritance + ``{{_base_.var}}`` interpolation example
at reference ``configs/textrecog/nrtr/nrtr_tps++.py:8-20``). Config files are
plain Python executed in an isolated namespace; ``_base_`` lists parent config
paths whose dicts are recursively merged (child wins); ``{{_base_.name}}``
string templates are substituted with values from the merged base namespace.
"""
from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict):
            return ConfigDict({k: ConfigDict._wrap(v)
                               for k, v in value.items()})
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._wrap(v) for v in value)
        return value


_BASE_KEY = "_base_"
_DELETE_KEY = "_delete_"
_INTERP_RE = re.compile(r"\{\{\s*_base_\.([\w.]+)\s*\}\}")


def _strip_delete(value):
    """Remove ``_delete_`` markers from subtrees copied wholesale (the
    merge only pops them at levels it visits; a leaked literal key would
    pollute built modules via **kwargs)."""
    if isinstance(value, dict):
        return {k: _strip_delete(v) for k, v in value.items()
                if k != _DELETE_KEY}
    if isinstance(value, (list, tuple)):
        return type(value)(_strip_delete(v) for v in value)
    return value


def _merge_dict(base: Dict, child: Dict) -> Dict:
    """Recursive merge; ``_delete_=True`` in child replaces instead of merging."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if isinstance(v, dict) and v.pop(_DELETE_KEY, False):
            out[k] = _strip_delete(copy.deepcopy(v))
        elif isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_dict(out[k], v)
        else:
            out[k] = _strip_delete(copy.deepcopy(v))
    return out


def _interp_value(value, base_ns: Dict):
    if isinstance(value, str):
        m = _INTERP_RE.fullmatch(value.strip())
        if m:  # whole-string template -> substitute the raw object
            obj = base_ns
            for part in m.group(1).split("."):
                obj = obj[part]
            return copy.deepcopy(obj)
        return _INTERP_RE.sub(
            lambda m: str(_lookup(base_ns, m.group(1))), value)
    if isinstance(value, dict):
        return {k: _interp_value(v, base_ns) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return type(value)(_interp_value(v, base_ns) for v in value)
    return value


def _lookup(ns: Dict, dotted: str):
    obj = ns
    for part in dotted.split("."):
        obj = obj[part]
    return obj


_BARE_INTERP_RE = re.compile(
    r"(?<!['\"])(\{\{\s*_base_\.[\w.]+\s*\}\})(?!['\"])")


def _exec_file(path: str) -> Dict[str, Any]:
    with open(path) as f:
        src = f.read()
    # mmcv allows the template *bare* at statement level
    # (``train_list = {{_base_.train_list}}``, e.g. reference
    # configs/textdet/dbnet/dbnet_r18_fpnc_1200e_icdar2015.py:8-13); quote it
    # so the file parses, then _interp_value resolves the whole-string form.
    src = _BARE_INTERP_RE.sub(r"'\1'", src)
    ns: Dict[str, Any] = {"__file__": os.path.abspath(path)}
    exec(compile(src, path, "exec"), ns)
    # keep callables (classes/functions are legal config values, like
    # Registry.build's class type= support); drop only modules/dunders
    return {
        k: v for k, v in ns.items()
        if not k.startswith("__") and not isinstance(v, type(os))
    }


def load_config(path: str) -> ConfigDict:
    """Load a config file, resolving ``_base_`` chains and interpolation."""
    path = os.path.abspath(path)
    ns = _exec_file(path)
    bases: List[str] = ns.pop(_BASE_KEY, [])
    if isinstance(bases, str):
        bases = [bases]
    base_ns: Dict[str, Any] = {}
    for rel in bases:
        parent = load_config(os.path.join(os.path.dirname(path), rel))
        dup = set(base_ns) & set(parent)
        if dup:
            # mmcv raises here too: silently deep-merging two unrelated
            # bases builds chimera configs (type from one base, stray
            # fields from another)
            raise KeyError(
                f'duplicate keys {sorted(dup)} among _base_ files of '
                f'{path} (mmcv: "Duplicate key is not allowed among '
                'bases")')
        base_ns = _merge_dict(base_ns, parent)
    ns = _interp_value(ns, base_ns)
    merged = _merge_dict(base_ns, ns)
    return ConfigDict._wrap(merged)


def merge_cli_options(cfg: ConfigDict, options: Dict[str, Any]) -> ConfigDict:
    """Apply ``--cfg-options a.b.c=v`` style overrides (reference
    ``tools/train.py:64-73``)."""
    for dotted, value in options.items():
        parts = dotted.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node:
                node[p] = ConfigDict()
            node = node[p]
        node[parts[-1]] = value
    return cfg

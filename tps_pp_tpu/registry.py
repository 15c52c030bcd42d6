"""Component registry: config-dict -> object factory.

The reference framework builds every component from ``dict(type='Name', **kw)``
via mmcv's ``Registry.build`` (see reference ``mmocr/models/builder.py:10-153``).
We keep the same ``type=`` naming convention so reference configs translate
mechanically, but the implementation is a ~60-line registry with no metaclass
machinery. Like the reference (``builder.py:19-24``), several registries are
aliases of ``MODELS`` so a module registered once is buildable from any of the
model-ish config keys.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


# config keys that are reference-API noise, dropped without warning
_SILENT_DROP_KEYS = frozenset({
    'init_cfg', 'pretrained', 'train_cfg', 'test_cfg', 'use_result',
    'attn_mode', 'backend', 'enc_gru', 'dec_gru', 'with_padding',
})


class Registry:
    """Maps string names to callables (classes or factory functions)."""

    def __init__(self, name: str, parent: Optional["Registry"] = None):
        self.name = name
        self._registry: Dict[str, Callable] = {}
        self._parent = parent

    def __contains__(self, key: str) -> bool:
        return key in self._registry or (
            self._parent is not None and key in self._parent)

    def __repr__(self):
        return f"Registry(name={self.name}, items={sorted(self._registry)})"

    def keys(self):
        keys = set(self._registry)
        if self._parent is not None:
            keys |= set(self._parent.keys())
        return sorted(keys)

    def get(self, key: str) -> Callable:
        if key in self._registry:
            return self._registry[key]
        if self._parent is not None and key in self._parent:
            return self._parent.get(key)
        raise KeyError(
            f"'{key}' is not registered in '{self.name}' "
            f"(available: {self.keys()})")

    def register_module(self, name: Optional[str] = None, module=None):
        """Use as ``@REG.register_module()`` or ``REG.register_module(module=C)``."""
        if module is not None:
            self._register(module, name)
            return module

        def _decorator(cls):
            self._register(cls, name)
            return cls

        return _decorator

    def _register(self, module: Callable, name: Optional[str]):
        key = name or module.__name__
        if key in self._registry and self._registry[key] is not module:
            raise KeyError(f"'{key}' already registered in '{self.name}'")
        self._registry[key] = module

    def build(self, cfg: Any, **default_kwargs):
        """Instantiate from ``dict(type='Name', **kwargs)``.

        ``default_kwargs`` fill in keys absent from cfg (used e.g. to inject
        ``num_classes`` into decoders the way the reference recognizer does at
        ``encode_decode_recognizer.py:58-72``).
        """
        if cfg is None:
            return None
        if not isinstance(cfg, dict):
            return cfg  # already-built object passes through
        cfg = dict(cfg)
        if "type" not in cfg:
            raise KeyError(
                f"config dict for registry '{self.name}' has no 'type' key: "
                f"{sorted(cfg)[:8]}")
        type_name = cfg.pop("type")
        if not isinstance(type_name, str):
            # allow passing classes directly in configs
            cls = type_name
        else:
            cls = self.get(type_name)
        import dataclasses
        if dataclasses.is_dataclass(cls):
            params = {f.name for f in dataclasses.fields(cls)}
            accepts_var_kw = False
        else:
            try:
                sig = inspect.signature(cls).parameters
                params = set(sig)
                accepts_var_kw = any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    for p in sig.values())
            except (TypeError, ValueError):
                params, accepts_var_kw = set(), True
        for k, v in default_kwargs.items():
            if accepts_var_kw or k in params:
                cfg.setdefault(k, v)
        if not accepts_var_kw:
            # drop config keys the target doesn't take (reference configs
            # carry init_cfg/pretrained/etc. everywhere) — warn so genuine
            # misconfigurations stay visible
            dropped = [k for k in cfg if k not in params]
            for k in dropped:
                if k not in _SILENT_DROP_KEYS:
                    import logging
                    logging.getLogger(__name__).warning(
                        'building %s: dropping unsupported config key %r',
                        getattr(cls, '__name__', cls), k)
                cfg.pop(k)
        try:
            return cls(**cfg)
        except TypeError as e:
            raise TypeError(f"building {type_name} from {self.name}: {e}") from e


# Model-side registries. Aliasing mirrors the reference's
# LOSSES = DETECTORS = HEADS = NECKS = FUSERS = BACKBONES pattern
# (reference mmocr/models/builder.py:19-24) in spirit: one shared namespace
# for nn modules, separate namespaces for data components.
MODELS = Registry("models")
BACKBONES = MODELS
RECTIFIERS = MODELS   # reference registers TPS_PP as a BACKBONE (tps_pp.py:499)
PREPROCESSOR = MODELS
ENCODERS = MODELS
DECODERS = MODELS
FUSERS = MODELS
HEADS = MODELS
NECKS = MODELS
RECOGNIZERS = MODELS
LOSSES = MODELS

CONVERTORS = Registry("convertors")
DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")
LOADERS = Registry("loaders")
PARSERS = Registry("parsers")


def build_from_cfg(cfg, registry: Registry, **default_kwargs):
    return registry.build(cfg, **default_kwargs)

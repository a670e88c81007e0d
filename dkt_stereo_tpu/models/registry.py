"""Name → (model cls, config cls, loss fn) registry (meta_arch/__init__.py:7-21)."""

from __future__ import annotations

MODELS: dict[str, tuple] = {}


def register_model(name: str, model_cls, config_cls, loss_fn):
    MODELS[name] = (model_cls, config_cls, loss_fn)
    return model_cls


def get_model(name: str):
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; registered: {sorted(MODELS)}")
    return MODELS[name]

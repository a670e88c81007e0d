"""Config handling: reference-JSON-compatible model configs + CLI merge.

The reference merges ``configs/<model>/<v>.json`` into the argparse namespace
with a flat union that crashes on duplicate keys (tools/ft_dkt.py:347-350);
we reproduce the strict-disjoint check but with a clear error message."""

from __future__ import annotations

import argparse
import json


def load_model_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def merge_config(args: argparse.Namespace, config: dict, allow: tuple = ()) -> argparse.Namespace:
    """``allow`` names keys a CLI deliberately overrides (e.g. the eval CLI
    hard-overrides a config's ``mixed_precision`` to reproduce the
    reference's AMP-off eval protocol) — excluded from the clash check."""
    clash = (set(vars(args)) & set(config)) - set(allow)
    if clash:
        raise ValueError(
            f"config keys clash with CLI flags (the reference raises TypeError "
            f"here too): {sorted(clash)}"
        )
    merged = {**vars(args), **{k: v for k, v in config.items() if k not in vars(args)}}
    return argparse.Namespace(**merged)

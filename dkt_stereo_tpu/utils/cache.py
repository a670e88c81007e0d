"""Persistent XLA/Mosaic compile cache shared by every CLI surface.

The axon tunnel pays minutes of compile for the Pallas training/inference
graphs; the reference never has this problem because torch eager has no
compile step.  A persistent on-disk cache (repo-local ``.jax_cache``,
gitignored) makes any SECOND invocation of the same graph load a serialized
executable in seconds — which is what makes the multi-invocation recipes
(run_scripts/*: stage-1 -> interrupt -> --auto_resume -> stage-2) and the
driver's cold ``bench.py`` run affordable.  ``scripts/prewarm_cache.py``
populates it whenever kernels change.
"""

from __future__ import annotations

import os
import pathlib


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``$DKT_JAX_CACHE_DIR`` or
    the repo-local ``.jax_cache``; idempotent, returns the directory used."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "DKT_JAX_CACHE_DIR",
            str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir

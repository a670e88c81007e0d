"""ctypes bindings for the native host library (native/stereo_host.cpp).

Auto-builds ``libstereo_host.so`` with make on first import when a toolchain
is present; every entry point has a pure-Python fallback so the framework
works without the native library (``HAVE_NATIVE`` reports which path is
active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstereo_host.so")

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        # memoized failure: without this, every native call (one per PFM
        # decode on the data path) would re-spawn a `make` subprocess with a
        # 120 s timeout on machines where the build cannot succeed
        return None
    _load_failed = True  # cleared below on success
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.pfm_query.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
    lib.pfm_query.restype = ctypes.c_int
    lib.pfm_read.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.pfm_read.restype = ctypes.c_int
    lib.pfm_write.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.pfm_write.restype = ctypes.c_int
    lib.corr_pyramid_lookup_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.corr_pyramid_lookup_cpu.restype = None
    lib.replicate_pad_u8.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ] + [ctypes.c_int] * 7
    lib.replicate_pad_u8.restype = None
    _lib = lib
    _load_failed = False
    return lib


HAVE_NATIVE = _load() is not None


def pfm_read_native(path: str) -> np.ndarray:
    """Native PFM decode; falls back to the Python reader."""
    lib = _load()
    if lib is None:
        from dkt_stereo_tpu.data.readers import readPFM

        return np.ascontiguousarray(readPFM(path)).astype(np.float32)
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.pfm_query(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"pfm_query({path}) failed: {rc}")
    shape = (h.value, w.value) if c.value == 1 else (h.value, w.value, 3)
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read(path.encode(), out.reshape(-1), h.value, w.value, c.value)
    if rc != 0:
        raise IOError(f"pfm_read({path}) failed: {rc}")
    return out


def pfm_write_native(path: str, arr: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        from dkt_stereo_tpu.data.readers import writePFM

        writePFM(path, arr)
        return
    arr = np.ascontiguousarray(arr, np.float32)
    rc = lib.pfm_write(path.encode(), arr, arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(f"pfm_write({path}) failed: {rc}")


def corr_lookup_native(pyramid, coords, radius=4, num_threads=0) -> np.ndarray:
    """CPU oracle: pyramid level i (B,H,W1,W2_i) f32, coords (B,H,W1,1).
    Returns (B,H,W1,L*(2r+1)) — identical semantics to the Pallas kernel."""
    lib = _load()
    B, H, W1, _ = pyramid[0].shape
    G = B * H
    L = len(pyramid)
    taps = 2 * radius + 1
    vols = [np.ascontiguousarray(v, np.float32).reshape(G, W1, -1) for v in pyramid]
    coords2 = np.ascontiguousarray(coords, np.float32).reshape(G, W1)
    if lib is None:
        from dkt_stereo_tpu.ops.corr import corr_lookup
        import jax.numpy as jnp

        return np.asarray(
            corr_lookup([jnp.asarray(v) for v in pyramid], jnp.asarray(coords), radius)
        )
    out = np.empty((G, W1, L * taps), np.float32)
    ptrs = (ctypes.c_void_p * L)(*[v.ctypes.data_as(ctypes.c_void_p).value for v in vols])
    w2s = np.asarray([v.shape[-1] for v in vols], np.int32)
    lib.corr_pyramid_lookup_cpu(ptrs, w2s, L, coords2, out, G, W1, radius, num_threads)
    return out.reshape(B, H, W1, L * taps)


def replicate_pad_native(img: np.ndarray, pt: int, pb: int, pl: int, pr: int) -> np.ndarray:
    """uint8 HWC replicate pad (InputPadder host path)."""
    lib = _load()
    if lib is None:
        return np.pad(img, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    img = np.ascontiguousarray(img, np.uint8)
    H, W, C = img.shape
    out = np.empty((H + pt + pb, W + pl + pr, C), np.uint8)
    lib.replicate_pad_u8(img, out, H, W, C, pt, pb, pl, pr)
    return out

"""ctypes bindings for the native C++ decode library (native/fastload.cpp).

Accelerates the Cityscapes hot path: batched npy decode + resize + normalize
+ collate runs in C++ threads (no GIL), replacing per-sample Python/PIL work.
Auto-builds with `make -C native` on first use if a toolchain is available;
falls back silently to the Python path otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing as t

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastload.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False
# per-thread reusable decode buffers — a fresh np.empty per call would fault
# in hundreds of MB of pages per image at loader rates
_tls = threading.local()


def _scratch(max_elems: int) -> np.ndarray:
    buf = getattr(_tls, "buf", None)
    if buf is None or buf.size < max_elems:
        buf = np.empty(max_elems, np.float32)
        _tls.buf = buf
    return buf


def _load_lib() -> t.Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build_attempted:
            _build_attempted = True
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastload_read_npy.restype = ctypes.c_int
        lib.fastload_read_npy.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fastload_read_png.restype = ctypes.c_int
        lib.fastload_read_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fastload_load_batch.restype = ctypes.c_int
        lib.fastload_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load_lib() is not None


def read_npy(path: str, max_elems: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode an npy file to float32 via the native parser."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    out = _scratch(max_elems)
    shape = np.zeros(8, np.int64)
    ndim = lib.fastload_read_npy(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems,
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if ndim < 0:
        raise RuntimeError(f"native npy decode failed: {path}")
    shp = tuple(int(s) for s in shape[:ndim])
    n = int(np.prod(shp))
    return out[:n].reshape(shp).copy()


def read_png(path: str, max_elems: int = 64 * 1024 * 1024) -> np.ndarray:
    """Decode a PNG (8-bit rgb/gray or 16-bit gray) to float32 HWC via the
    native zlib-based decoder. 16-bit values come back in 0..65535."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native fastload unavailable")
    out = _scratch(max_elems)
    shape = np.zeros(4, np.int64)
    ch = lib.fastload_read_png(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems,
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if ch < 0:
        raise RuntimeError(f"native png decode failed: {path}")
    h, w, c, _depth = (int(s) for s in shape)
    arr = out[: h * w * c].reshape(h, w, c).copy()
    return arr[..., 0] if c == 1 else arr


def load_cityscapes_batch(
    img_paths: t.Sequence[str],
    mask_paths: t.Sequence[str],
    depth_paths: t.Sequence[str],
    out_h: int,
    out_w: int,
    ignore_value: int = -1,
    remap_to: int = 18,
    depth_div: float = 1.0,
    num_threads: int = 8,
) -> t.Optional[t.Dict[str, np.ndarray]]:
    """Batched decode+resize+normalize; None if the native lib is missing."""
    lib = _load_lib()
    if lib is None:
        return None
    b = len(img_paths)

    def carr(paths: t.Sequence[str]):
        arr = (ctypes.c_char_p * b)()
        arr[:] = [p.encode() for p in paths]
        return arr

    imgs = np.empty((b, out_h, out_w, 3), np.float32)
    masks = np.empty((b, out_h, out_w), np.int32)
    depths = np.empty((b, out_h, out_w), np.float32)
    rc = lib.fastload_load_batch(
        carr(img_paths),
        carr(mask_paths),
        carr(depth_paths),
        b,
        out_h,
        out_w,
        ignore_value,
        remap_to,
        ctypes.c_float(depth_div),
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if rc != 0:
        if rc - 1 >= len(img_paths):
            # batch+1 sentinel: worker-thread spawn failed (bad_alloc /
            # thread-limit), no sample at fault
            raise RuntimeError(
                "native batch load failed: could not spawn worker threads "
                "(memory or thread-limit pressure)"
            )
        raise RuntimeError(
            f"native batch load failed at sample {rc - 1}: "
            f"{img_paths[rc - 1]}"
        )
    return {"img": imgs, "mask": masks, "depth": depths[..., None]}

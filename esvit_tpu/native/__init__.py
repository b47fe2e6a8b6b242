"""ctypes bindings for the native host data-path library (datapath.cpp).

The library is built on first use with a bare ``g++ -O3 -shared`` (no
pybind11 on this image; the C ABI + ctypes keeps the binding dependency-
free). Every entry point degrades gracefully: if the toolchain or libjpeg
is missing, ``available()`` returns False and callers keep the pure
PIL/Python path (loader.py, datasets.py check this).

Role parity: the reference feeds its GPUs through torch DataLoader worker
processes + PIL (/root/reference/datasets/build.py:72-79,
/root/reference/datasets/tsv_file.py). Here the host side is in-process
threads; ctypes releases the GIL for the duration of each call, so
``multicrop_batch`` (decode + 10 fused crop-resizes per image) scales
across the loader's thread pool without worker processes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "datapath.cpp")
_SO = os.path.join(_DIR, "_datapath.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_build_err: Optional[str] = None

DP_OK = 0
DP_ERR_JPEG = 1
DP_ERR_COLORSPACE = 2
DP_ERR_BOUNDS = 3
DP_ERR_ARG = 4


def _build() -> Optional[str]:
    """Compile datapath.cpp -> _datapath.so. Returns an error string or None."""
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
           _SRC, "-ljpeg", "-o", _SO + ".tmp"]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ launch failed: {e}"
    if p.returncode != 0:
        return f"g++ failed: {p.stderr[-2000:]}"
    os.replace(_SO + ".tmp", _SO)
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried, _build_err
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("ESVIT_NO_NATIVE"):
            _build_err = "disabled via ESVIT_NO_NATIVE"
            return None
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
            if stale:
                _build_err = _build()
                if _build_err is not None:
                    return None
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_err = f"dlopen failed: {e}"
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.dp_version.restype = ctypes.c_int
        lib.dp_lineidx_parse.restype = ctypes.c_int64
        lib.dp_lineidx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                         i64p, ctypes.c_int64]
        lib.dp_b64_decode.restype = ctypes.c_int64
        lib.dp_b64_decode.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.dp_jpeg_dims.restype = ctypes.c_int
        lib.dp_jpeg_dims.argtypes = [u8p, ctypes.c_int64, i32p, i32p]
        lib.dp_jpeg_decode.restype = ctypes.c_int
        lib.dp_jpeg_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32,
                                       u8p, ctypes.c_int64, i32p, i32p]
        lib.dp_crop_resize.restype = ctypes.c_int
        lib.dp_crop_resize.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                       ctypes.c_double, ctypes.c_double,
                                       ctypes.c_double, ctypes.c_double,
                                       u8p, ctypes.c_int32, ctypes.c_int32]
        lib.dp_multicrop_batch.restype = ctypes.c_int
        lib.dp_multicrop_batch.argtypes = [
            ctypes.POINTER(u8p), i64p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), i32p, ctypes.POINTER(u8p),
            i64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_err


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# lineidx / base64
# ---------------------------------------------------------------------------

def lineidx_parse(data: bytes) -> np.ndarray:
    """Parse a .lineidx blob into an int64 offsets array."""
    lib = _load()
    assert lib is not None
    cap = data.count(b"\n") + 2
    out = np.empty(cap, np.int64)
    n = lib.dp_lineidx_parse(data, len(data),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                             cap)
    if n < 0:
        raise ValueError(f"lineidx parse failed (code {n})")
    return out[:n].copy()


def b64_decode(data: bytes) -> bytes:
    lib = _load()
    assert lib is not None
    src = np.frombuffer(data, np.uint8)
    out = np.empty(len(data) * 3 // 4 + 4, np.uint8)
    n = lib.dp_b64_decode(_u8p(src), len(data), _u8p(out))
    if n < 0:
        raise ValueError("invalid base64")
    return out[:n].tobytes()


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------

def jpeg_dims(data: bytes) -> Optional[tuple[int, int]]:
    """(width, height) from the header, or None if not decodable here."""
    lib = _load()
    assert lib is not None
    src = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.dp_jpeg_dims(_u8p(src), len(data), ctypes.byref(w),
                          ctypes.byref(h))
    return (w.value, h.value) if rc == DP_OK else None


def jpeg_decode(data: bytes, scale_denom: int = 1) -> Optional[np.ndarray]:
    """Decode to (H, W, 3) RGB uint8, or None on failure (caller falls back
    to PIL). scale_denom in {1,2,4,8} = libjpeg DCT-domain downscale."""
    lib = _load()
    assert lib is not None
    dims = jpeg_dims(data)
    if dims is None:
        return None
    w0, h0 = dims
    w = -(-w0 // scale_denom)
    h = -(-h0 // scale_denom)
    out = np.empty((h, w, 3), np.uint8)
    src = np.frombuffer(data, np.uint8)
    ww = ctypes.c_int32()
    hh = ctypes.c_int32()
    rc = lib.dp_jpeg_decode(_u8p(src), len(data), scale_denom, _u8p(out),
                            out.nbytes, ctypes.byref(ww), ctypes.byref(hh))
    if rc != DP_OK:
        return None
    assert (ww.value, hh.value) == (w, h), (ww.value, hh.value, w, h)
    return out


def crop_resize(img: np.ndarray, box: tuple[float, float, float, float],
                size: tuple[int, int]) -> np.ndarray:
    """PIL-parity bicubic crop+resize. box = (y0, x0, y1, x1) float pixels;
    size = (oh, ow). img: (H, W, 3) uint8 C-contiguous."""
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    oh, ow = size
    out = np.empty((oh, ow, 3), np.uint8)
    rc = lib.dp_crop_resize(_u8p(img), img.shape[0], img.shape[1],
                            float(box[0]), float(box[1]), float(box[2]),
                            float(box[3]), _u8p(out), oh, ow)
    if rc != DP_OK:
        raise ValueError(f"crop_resize failed (code {rc})")
    return out


# ---------------------------------------------------------------------------
# Multi-crop batch
# ---------------------------------------------------------------------------

def decode_multicrop(data: bytes, boxes: np.ndarray, sizes: Sequence[int],
                     *, allow_scaled: bool = True) -> Optional[list]:
    """One image -> list of (S, S, 3) uint8 views, or None on failure.
    boxes: (n_views, 4) float64 (top, left, h, w) at full resolution."""
    outs = [np.empty((1, s, s, 3), np.uint8) for s in sizes]
    status = multicrop_batch([data], np.asarray(boxes, np.float64)[None],
                             list(sizes), outs, [0],
                             allow_scaled=allow_scaled, nthreads=1)
    if status[0] != DP_OK:
        return None
    return [o[0] for o in outs]


def multicrop_batch(jpegs: Sequence[bytes], boxes: np.ndarray,
                    view_sizes: Sequence[int], view_outs: Sequence[np.ndarray],
                    img_rows: Sequence[int], *, allow_scaled: bool = True,
                    nthreads: int = 1) -> np.ndarray:
    """Decode each JPEG once and write every crop+resize view straight into
    the view-major batch tensors.

    jpegs: n_imgs byte strings. boxes: (n_imgs, n_views, 4) float64
    (top, left, h, w) at full resolution. view_outs[v]: (rows, S_v, S_v, 3)
    uint8 C-contiguous; image i's view v lands at row img_rows[i].
    Returns per-image status (0 = ok); non-zero rows are untouched and the
    caller should fill them via the PIL path.
    """
    lib = _load()
    assert lib is not None
    n = len(jpegs)
    v = len(view_sizes)
    boxes = np.ascontiguousarray(boxes, np.float64)
    assert boxes.shape == (n, v, 4), boxes.shape
    srcs = [np.frombuffer(j, np.uint8) for j in jpegs]
    jp = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_u8p(s) for s in srcs])
    jl = np.array([len(j) for j in jpegs], np.int64)
    vs = np.array(view_sizes, np.int32)
    rows = np.array(img_rows, np.int64)
    assert len(view_outs) == v and len(rows) == n
    for k, o in enumerate(view_outs):
        assert o.dtype == np.uint8 and o.flags.c_contiguous
        assert o.shape[1:] == (view_sizes[k], view_sizes[k], 3), o.shape
    op = (ctypes.POINTER(ctypes.c_uint8) * v)(*[_u8p(o) for o in view_outs])
    status = np.empty(n, np.int32)
    rc = lib.dp_multicrop_batch(
        jp, jl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        vs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), op,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), v,
        1 if allow_scaled else 0, max(1, nthreads),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != DP_OK:
        raise ValueError(f"multicrop_batch failed (code {rc})")
    return status

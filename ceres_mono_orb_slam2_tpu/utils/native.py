"""ctypes bindings for the native C++ runtime components.

The reference's runtime around the math is native C++ (vocabulary loader
TemplatedVocabulary.h:1338-1423, cv::imread data path main.cc:85-96); this
module provides the same split for the TPU build: JAX/XLA owns the compute
path, while startup-gating host I/O (ORBvoc parse, image decode, prefetch)
runs in `libceres_native.so`, compiled on demand from the sources in
``ceres_mono_orb_slam2_tpu/native/``.

Everything here degrades gracefully: if g++ or zlib is unavailable the
callers fall back to the pure-Python implementations (PIL decode, Python
ORBvoc parser), asserting identical outputs in tests.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SOURCES = ["orbvoc_io.cc", "dataloader.cc"]

# None = not tried yet; False = tried and failed (don't retry per call —
# imread_gray runs once per frame); object = loaded library.
_lib = None
_lib_lock = threading.Lock()
_build_error: Optional[str] = None


def _build_library(force: bool = False) -> Optional[str]:
    """Compile the shared library into a source-hash-keyed cache path.

    Hash-keyed output makes staleness impossible (git does not preserve
    mtimes, so mtime comparison against a checked-in binary is meaningless);
    an edited source simply maps to a different .so path. Returns the .so
    path or None on failure (recording the error for diagnostics)."""
    global _build_error
    srcs = [os.path.join(_NATIVE_DIR, s) for s in _SOURCES]
    if not all(os.path.exists(s) for s in srcs):
        _build_error = "native sources not found"
        return None
    h = hashlib.sha256()
    for s in srcs:
        with open(s, "rb") as f:
            h.update(f.read())
    cache = os.path.join(tempfile.gettempdir(), "ceres_native_cache")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"libceres_native_{h.hexdigest()[:16]}.so")
    if os.path.exists(so_path) and not force:
        return so_path
    tmp = so_path + f".build{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp,
           *srcs, "-lz", "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:  # g++ missing / hung
        _build_error = str(e)
        return None
    if proc.returncode != 0:
        _build_error = proc.stderr[-2000:]
        return None
    os.replace(tmp, so_path)  # atomic vs concurrent builders
    return so_path


def get_lib():
    """Load (building if needed) the native library; None if unavailable.
    A load failure is cached — callers fall back to pure Python without
    re-attempting the build/dlopen on every frame."""
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        lib = None
        for attempt in range(2):
            so_path = _build_library(force=attempt > 0)
            if so_path is None:
                break
            try:
                lib = ctypes.CDLL(so_path)
                break
            except OSError as e:
                # a cached .so from another arch/glibc: rebuild once fresh
                global _build_error
                _build_error = str(e)
                lib = None
        if lib is None:
            _lib = False
            return None
        c = ctypes
        lib.orbvoc_count.restype = c.c_long
        lib.orbvoc_count.argtypes = [c.c_char_p]
        lib.orbvoc_parse.restype = c.c_long
        lib.orbvoc_parse.argtypes = [
            c.c_char_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
            c.c_long, c.POINTER(c.c_int), c.POINTER(c.c_int)]
        lib.orbvoc_dump.restype = c.c_int
        lib.orbvoc_dump.argtypes = [
            c.c_char_p, c.c_int, c.c_int, c.c_void_p, c.c_void_p, c.c_int,
            c.c_void_p, c.c_void_p, c.c_long]
        lib.img_decode_file.restype = c.c_int
        lib.img_decode_file.argtypes = [
            c.c_char_p, c.c_void_p, c.POINTER(c.c_int), c.POINTER(c.c_int),
            c.c_long]
        lib.img_probe_file.restype = c.c_int
        lib.img_probe_file.argtypes = [c.c_char_p, c.POINTER(c.c_int),
                                       c.POINTER(c.c_int)]
        lib.loader_create.restype = c.c_void_p
        lib.loader_create.argtypes = [c.POINTER(c.c_char_p), c.c_long, c.c_int]
        lib.loader_next.restype = c.c_int
        lib.loader_next.argtypes = [c.c_void_p, c.c_void_p, c.POINTER(c.c_int),
                                    c.POINTER(c.c_int), c.c_long]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> Optional[str]:
    return _build_error


# ---------------- ORBvoc text I/O ----------------

def parse_orbvoc_raw(path: str):
    """Native parse → (k, levels, parents i32 (n,), leafs bool (n,),
    descs u8 (n,32), weights f32 (n,)) or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.orbvoc_count(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    parents = np.empty(n, np.int32)
    leafs = np.empty(n, np.uint8)
    descs = np.empty((n, 32), np.uint8)
    weights = np.empty(n, np.float32)
    k = ctypes.c_int()
    levels = ctypes.c_int()
    got = lib.orbvoc_parse(
        path.encode(), parents.ctypes.data, leafs.ctypes.data,
        descs.ctypes.data, weights.ctypes.data, n,
        ctypes.byref(k), ctypes.byref(levels))
    if got < 0:
        raise IOError(f"native ORBvoc parse failed for {path}")
    return (int(k.value), int(levels.value), parents[:got],
            leafs[:got].astype(bool), descs[:got], weights[:got])


def dump_orbvoc_native(path: str, k: int, levels: int, node_desc: np.ndarray,
                       children: np.ndarray, word_id: np.ndarray,
                       word_weight: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    node_desc = np.ascontiguousarray(node_desc, np.uint8)
    children = np.ascontiguousarray(children, np.int32)
    word_id = np.ascontiguousarray(word_id, np.int32)
    word_weight = np.ascontiguousarray(word_weight, np.float32)
    ret = lib.orbvoc_dump(
        path.encode(), int(k), int(levels), node_desc.ctypes.data,
        children.ctypes.data, int(children.shape[1]), word_id.ctypes.data,
        word_weight.ctypes.data, int(len(node_desc)))
    return ret == 0


# ---------------- image decode / prefetch ----------------

def imread_gray(path: str) -> Optional[np.ndarray]:
    """Native decode to float32 grayscale; None → caller falls back (PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.img_probe_file(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    # belt-and-braces dim guard: a corrupt header must fall back to PIL,
    # not raise/allocate absurdly here
    if not (0 < w.value <= 65535 and 0 < h.value <= 65535
            and w.value * h.value <= (1 << 28)):
        return None
    out = np.empty((h.value, w.value), np.float32)
    ret = lib.img_decode_file(path.encode(), out.ctypes.data,
                              ctypes.byref(w), ctypes.byref(h), out.size)
    if ret != 0:
        return None  # unsupported variant (palette/interlaced) → fallback
    return out


class PrefetchLoader:
    """Iterate images of a sequence with a native C++ worker thread decoding
    ahead of the consumer (the reference decodes on the tracking thread;
    prefetch hides decode latency behind the tracker's device round-trips).

    Frames the native decoder cannot handle fall back to PIL inline.
    """

    def __init__(self, paths: List[str], capacity: int = 4):
        self.paths = list(paths)
        self._i = 0
        self._handle = None
        lib = get_lib()
        if lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = lib.loader_create(arr, len(self.paths), capacity)
            # probe max dims for the receive buffer
            mw = mh = 0
            w = ctypes.c_int()
            h = ctypes.c_int()
            for p in self.paths[:8]:
                if lib.img_probe_file(p.encode(), ctypes.byref(w),
                                      ctypes.byref(h)) == 0:
                    mw, mh = max(mw, w.value), max(mh, h.value)
            self._buf = np.empty((max(mh, 1) * 2, max(mw, 1) * 2), np.float32)

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self.paths):
            raise StopIteration
        path = self.paths[self._i]
        self._i += 1
        lib = get_lib()
        if self._handle is not None:
            w = ctypes.c_int()
            h = ctypes.c_int()
            ret = lib.loader_next(self._handle, self._buf.ctypes.data,
                                  ctypes.byref(w), ctypes.byref(h),
                                  self._buf.size)
            if ret == 0:
                # the native side writes a CONTIGUOUS h*w block
                flat = self._buf.reshape(-1)[: h.value * w.value]
                return flat.reshape(h.value, w.value).copy()
            if ret == 1:
                raise StopIteration
            # decode error for this frame: fall through to PIL
        from ceres_mono_orb_slam2_tpu.utils.datasets import _imread_gray_pil
        return _imread_gray_pil(path)

    def close(self):
        if self._handle is not None:
            lib = get_lib()
            if lib is not None:
                lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

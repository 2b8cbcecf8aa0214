"""Binary event-log fast path (native writer + pure-Python fallback).

The reference logs per-step channels through tensorboard event files
(unicycle_move_to_pose.py:1288-1311); our JSONL `MetricsLogger` is the
readable equivalent, but at batched-rollout scale (10^5-10^6 records)
the Python json/write loop dominates host time.  `FastLogWriter` is the
production path: a C++ writer (native/fastlog.cpp, built on demand with
g++ into a cached .so, driven via ctypes) with a bulk `write_rows` entry
so one call logs a whole (T, d) rollout channel.  When no compiler or
prebuilt library is available it transparently degrades to a pure-Python
writer emitting the IDENTICAL format, so `read_fastlog` never cares.

Format (little-endian, see fastlog.cpp): 8-byte magic "FLOG0001";
tagdef = u8 1, u16 id, u16 len, name; record = u8 2, u16 id, i64 step,
u32 n, n*f32.
"""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import struct
import subprocess
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

MAGIC = b"FLOG0001"
_KIND_TAGDEF = 1
_KIND_RECORD = 2

_NATIVE_SRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "native", "fastlog.cpp")
_lib_cache: Optional[object] = None
_lib_tried = False


def _candidate_lib_paths():
    src_dir = osp.dirname(_NATIVE_SRC)
    yield osp.join(src_dir, "libfastlog.so")
    cache = os.environ.get("BAYESIAN_CBF_TPU_CACHE",
                           osp.join(tempfile.gettempdir(),
                                    "bayesian_cbf_tpu_native"))
    yield osp.join(cache, "libfastlog.so")


def _load_or_build_lib():
    """Return the ctypes lib, building it with g++ on first use; None if
    neither a prebuilt .so nor a compiler is available."""
    global _lib_cache, _lib_tried
    if _lib_tried:
        return _lib_cache
    _lib_tried = True
    if os.environ.get("BAYESIAN_CBF_TPU_NO_NATIVE"):
        return None
    paths = list(_candidate_lib_paths())
    try:
        src_mtime = osp.getmtime(_NATIVE_SRC)
    except OSError:
        # source not shipped (trimmed install): any prebuilt .so is fresh
        src_mtime = float("-inf")
    for p in paths:
        if osp.exists(p) and osp.getmtime(p) >= src_mtime:
            try:
                _lib_cache = _bind(ctypes.CDLL(p))
                return _lib_cache
            except OSError:
                pass
    # build into the first writable candidate dir
    for p in paths:
        d = osp.dirname(p)
        try:
            os.makedirs(d, exist_ok=True)
            tmp = p + ".build.%d" % os.getpid()
            subprocess.run(["g++", "-O2", "-shared", "-fPIC",
                            "-o", tmp, _NATIVE_SRC],
                           check=True, capture_output=True, timeout=120)
            os.replace(tmp, p)
            _lib_cache = _bind(ctypes.CDLL(p))
            return _lib_cache
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _bind(lib):
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [ctypes.c_char_p]
    lib.fl_tag.restype = ctypes.c_int
    lib.fl_tag.argtypes = [ctypes.c_void_p, ctypes.c_uint16, ctypes.c_char_p]
    lib.fl_write.restype = ctypes.c_int
    lib.fl_write.argtypes = [ctypes.c_void_p, ctypes.c_uint16,
                             ctypes.c_int64, ctypes.c_void_p,
                             ctypes.c_uint32]
    lib.fl_write_rows.restype = ctypes.c_int
    lib.fl_write_rows.argtypes = [ctypes.c_void_p, ctypes.c_uint16,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_uint32]
    lib.fl_flush.restype = ctypes.c_int
    lib.fl_flush.argtypes = [ctypes.c_void_p]
    lib.fl_close.restype = None
    lib.fl_close.argtypes = [ctypes.c_void_p]
    return lib


class FastLogWriter:
    """Tagged float32 record writer.  `native` reports which path is live."""

    def __init__(self, path: str, force_python: bool = False):
        self.path = path
        self._tags: Dict[str, int] = {}
        self._lib = None if force_python else _load_or_build_lib()
        self._h = None
        self._fh = None
        if self._lib is not None:
            self._h = self._lib.fl_open(path.encode())
            if not self._h:
                self._lib = None
        if self._h is None:
            self._fh = open(path, "wb")
            self._fh.write(MAGIC)
        self.native = self._h is not None  # which path this file was
        # written through (stable across close())

    def _tag_id(self, tag: str) -> int:
        tid = self._tags.get(tag)
        if tid is None:
            tid = len(self._tags)
            if tid > 0xFFFF:
                raise ValueError("too many distinct tags")
            self._tags[tag] = tid
            name = tag.encode()
            if self._h is not None:
                self._lib.fl_tag(self._h, tid, name)
            else:
                self._fh.write(struct.pack("<BHH", _KIND_TAGDEF, tid,
                                           len(name)) + name)
        return tid

    def write(self, tag: str, step: int, value) -> None:
        a = np.ascontiguousarray(np.atleast_1d(np.asarray(value)),
                                 dtype=np.float32)
        tid = self._tag_id(tag)
        if self._h is not None:
            self._lib.fl_write(self._h, tid, int(step),
                               a.ctypes.data_as(ctypes.c_void_p), a.size)
        else:
            self._fh.write(struct.pack("<BHqI", _KIND_RECORD, tid,
                                       int(step), a.size) + a.tobytes())

    def write_rows(self, tag: str, values, step0: int = 0,
                   stride: int = 1) -> None:
        """Log a whole (T,) or (T, d) channel: row t gets step step0+t*stride.
        This is the bulk path — one ctypes call for the full rollout."""
        a = np.asarray(values)
        if a.ndim == 1:
            a = a[:, None]
        if a.ndim != 2:
            a = a.reshape(a.shape[0], -1)
        a = np.ascontiguousarray(a, dtype=np.float32)
        tid = self._tag_id(tag)
        if self._h is not None:
            self._lib.fl_write_rows(self._h, tid, int(step0), int(stride),
                                    a.ctypes.data_as(ctypes.c_void_p),
                                    a.shape[0], a.shape[1])
        else:
            kind_hdr = struct.pack("<BH", _KIND_RECORD, tid)
            n = a.shape[1]
            fh = self._fh
            for r in range(a.shape[0]):
                fh.write(kind_hdr + struct.pack("<qI", step0 + r * stride, n)
                         + a[r].tobytes())

    def flush(self) -> None:
        if self._h is not None:
            self._lib.fl_flush(self._h)
        else:
            self._fh.flush()

    def close(self) -> None:
        if self._h is not None:
            self._lib.fl_close(self._h)
            self._h = None
        elif self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_fastlog(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Parse a fastlog file -> {tag: (steps (N,) int64, values (N, d) f32)}.

    Ragged tags (n varying across records) are returned as (steps, list).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if blob[:8] != MAGIC:
        raise ValueError("not a fastlog file: %s" % path)
    names: Dict[int, str] = {}
    steps: Dict[int, list] = {}
    vals: Dict[int, list] = {}
    off, end = 8, len(blob)
    while off < end:
        kind = blob[off]
        off += 1
        if kind == _KIND_TAGDEF:
            tid, nlen = struct.unpack_from("<HH", blob, off)
            off += 4
            names[tid] = blob[off:off + nlen].decode()
            off += nlen
            steps.setdefault(tid, [])
            vals.setdefault(tid, [])
        elif kind == _KIND_RECORD:
            tid, step, n = struct.unpack_from("<HqI", blob, off)
            off += 14
            vals.setdefault(tid, []).append(
                np.frombuffer(blob, dtype="<f4", count=n, offset=off).copy())
            steps.setdefault(tid, []).append(step)
            off += 4 * n
        else:
            raise ValueError("corrupt fastlog record kind %d at %d"
                             % (kind, off - 1))
    out: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for tid, name in names.items():
        ss = np.asarray(steps.get(tid, []), dtype=np.int64)
        vv = vals.get(tid, [])
        sizes = {v.size for v in vv}
        if len(sizes) <= 1:
            arr = (np.stack(vv) if vv
                   else np.zeros((0, 0), dtype=np.float32))
            out[name] = (ss, arr)
        else:
            out[name] = (ss, vv)
    return out

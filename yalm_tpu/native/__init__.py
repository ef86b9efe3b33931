"""ctypes bindings for the native host library (libyalm_native.so).

Builds with `make -C yalm_tpu/native`. Every consumer has a pure-Python
fallback, so the library is an accelerator, not a hard dependency: `loaded()`
reports whether native paths are active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "libyalm_native.so")
_lib: ctypes.CDLL | None = None


def _try_load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    lib.yn_open.argtypes = [ctypes.c_char_p]
    lib.yn_open.restype = ctypes.c_void_p
    lib.yn_error.argtypes = [ctypes.c_void_p]
    lib.yn_error.restype = ctypes.c_char_p
    lib.yn_close.argtypes = [ctypes.c_void_p]
    lib.yn_n_tensors.argtypes = [ctypes.c_void_p]
    lib.yn_n_tensors.restype = ctypes.c_int
    lib.yn_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.yn_tensor_info.restype = ctypes.c_int
    lib.yn_n_metadata.argtypes = [ctypes.c_void_p]
    lib.yn_n_metadata.restype = ctypes.c_int
    lib.yn_metadata.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_char_p),
                                ctypes.POINTER(ctypes.c_char_p)]
    lib.yn_metadata.restype = ctypes.c_int

    lib.yt_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.yt_create.restype = ctypes.c_void_p
    lib.yt_free.argtypes = [ctypes.c_void_p]
    lib.yt_byte_fallback_start.argtypes = [ctypes.c_void_p]
    lib.yt_byte_fallback_start.restype = ctypes.c_int32
    lib.yt_n_vocab.argtypes = [ctypes.c_void_p]
    lib.yt_n_vocab.restype = ctypes.c_int32
    lib.yt_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.yt_encode.restype = ctypes.c_int64
    try:
        lib.yt_set_bpe.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_char_p]
        lib.yt_set_bpe.restype = ctypes.c_int32
        lib.yt_encode_bpe.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.yt_encode_bpe.restype = ctypes.c_int64
    except AttributeError:
        pass  # stale .so without the BPE entry points: greedy still works

    _lib = lib
    return lib


def build(force: bool = False) -> bool:
    """Compile libyalm_native.so in place. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _HERE, "-s"], check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def loaded() -> bool:
    return _try_load() is not None


class NativeCheckpoint:
    """Native mmap'd checkpoint: zero-copy numpy views into the mapping."""

    def __init__(self, path: str):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("libyalm_native.so not built (run make -C yalm_tpu/native)")
        self._lib = lib
        self._h = lib.yn_open(path.encode())
        err = lib.yn_error(self._h)
        if err:
            msg = err.decode()
            lib.yn_close(self._h)
            self._h = None
            raise IOError(f"{path}: {msg}")

    def close(self):
        if self._h:
            self._lib.yn_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def metadata(self) -> dict[str, str]:
        out = {}
        k, v = ctypes.c_char_p(), ctypes.c_char_p()
        for i in range(self._lib.yn_n_metadata(self._h)):
            self._lib.yn_metadata(self._h, i, ctypes.byref(k), ctypes.byref(v))
            out[k.value.decode()] = v.value.decode()
        return out

    def tensors(self) -> dict[str, np.ndarray]:
        from ..codec.format import np_dtype_for
        out = {}
        name, dtype = ctypes.c_char_p(), ctypes.c_char_p()
        shape_p = ctypes.POINTER(ctypes.c_int64)()
        ndim = ctypes.c_int()
        data = ctypes.c_void_p()
        nbytes = ctypes.c_int64()
        for i in range(self._lib.yn_n_tensors(self._h)):
            self._lib.yn_tensor_info(self._h, i, ctypes.byref(name), ctypes.byref(dtype),
                                     ctypes.byref(shape_p), ctypes.byref(ndim),
                                     ctypes.byref(data), ctypes.byref(nbytes))
            shape = tuple(shape_p[j] for j in range(ndim.value))
            np_dtype = np_dtype_for(dtype.value.decode())
            buf = (ctypes.c_char * nbytes.value).from_address(data.value)
            arr = np.frombuffer(buf, dtype=np_dtype).reshape(shape)
            out[name.value.decode()] = arr
        return out


class NativeTrie:
    """Native trie encoder over a packed NUL-delimited vocab blob."""

    def __init__(self, blob: bytes):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("libyalm_native.so not built")
        self._lib = lib
        self._blob = blob  # keep alive (yt_create copies, but be safe)
        self._h = lib.yt_create(blob, len(blob))

    def __del__(self):
        try:
            if self._h:
                self._lib.yt_free(self._h)
        except Exception:
            pass

    @property
    def byte_fallback_start(self) -> int:
        return self._lib.yt_byte_fallback_start(self._h)

    @property
    def n_vocab(self) -> int:
        return self._lib.yt_n_vocab(self._h)

    def encode(self, data: bytes) -> list[int]:
        cap = max(len(data) * 2, 16)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.yt_encode(self._h, data, len(data), out, cap)
        if n < 0:
            raise RuntimeError("yt_encode capacity overflow")
        return list(out[:n])

    def set_bpe(self, merges, added, pretok: str) -> bool:
        """Install merge ranks for exact-BPE encode. merges: (M, 2) int32;
        added: (A,) int32; pretok: 'metaspace[:scheme]'|'bytelevel[:prefix]'.
        Returns False when the loaded .so predates the BPE entry points."""
        if not hasattr(self._lib, "yt_set_bpe"):
            return False
        m = np.ascontiguousarray(merges, np.int32)
        a = np.ascontiguousarray(added if added is not None else [], np.int32)
        self._m_keep, self._a_keep = m, a  # keep buffers alive
        rc = self._lib.yt_set_bpe(
            self._h, m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(m), a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(a), pretok.encode())
        return rc == 0

    def encode_bpe(self, data: bytes) -> list[int]:
        cap = max(len(data) * 2, 16)
        out = (ctypes.c_int32 * cap)()
        n = self._lib.yt_encode_bpe(self._h, data, len(data), out, cap)
        if n == -2:
            raise RuntimeError("yt_encode_bpe before set_bpe")
        if n < 0:
            raise RuntimeError("yt_encode_bpe capacity overflow")
        return list(out[:n])

"""`.yalm` checkpoint codec (pure Python, numpy + mmap, zero-copy reads).

The `.yalm` container IS a safetensors file: a u64 little-endian header size,
a JSON header mapping tensor names to {dtype, shape, data_offsets} plus a
"__metadata__" dict of normalized config strings, followed by raw
little-endian tensor bytes (written by the reference's convert.py:247-248 via
safetensors save_file, parsed by the reference's mmap loader at
src/codec.cpp:116-199). This module re-implements both directions without a
torch/safetensors dependency so the runtime can synthesize and read
checkpoints standalone; fp8/bf16 use ml_dtypes so every array is a plain
numpy array that hands off to JAX zero-copy.
"""

from __future__ import annotations

import json
import mmap
import os
from dataclasses import dataclass, field

import ml_dtypes
import numpy as np

# safetensors dtype tag <-> numpy dtype (reference tags: src/codec.cpp:11-31)
_DTYPE_TO_NP = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "F8_E5M2": np.dtype(ml_dtypes.float8_e5m2),
    "F8_E4M3": np.dtype(ml_dtypes.float8_e4m3fn),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}
_NP_TO_DTYPE = {v: k for k, v in _DTYPE_TO_NP.items()}

# Short dtype names used in checkpoint metadata ("dtype" key).
DTYPE_STR_TO_TAG = {"fp32": "F32", "fp16": "F16", "bf16": "BF16", "fp8": "F8_E5M2",
                    "int8": "I8"}


def np_dtype_for(tag: str) -> np.dtype:
    return _DTYPE_TO_NP[tag]


def tag_for_np_dtype(dtype: np.dtype) -> str:
    try:
        return _NP_TO_DTYPE[np.dtype(dtype)]
    except KeyError:
        raise ValueError(f"unsupported tensor dtype {dtype}") from None


@dataclass
class YalmFile:
    """A parsed `.yalm` checkpoint: metadata plus zero-copy tensor views."""

    path: str
    metadata: dict[str, str]
    tensors: dict[str, np.ndarray]
    # Held to keep the mapping alive as long as tensor views exist.
    _mmap: mmap.mmap | None = field(default=None, repr=False)
    _native: object | None = field(default=None, repr=False)

    def close(self) -> None:
        # Views into the map become invalid after close; callers must copy
        # anything they need first (device puts copy implicitly). If live
        # views still exist the close is deferred to GC — mmap refuses to
        # unmap exported buffers, which is exactly the safety we want.
        self.tensors = {}
        if self._mmap is not None:
            try:
                self._mmap.close()
            except BufferError:
                pass
            self._mmap = None
        self._native = None  # NativeCheckpoint unmaps on GC


def read_yalm(path: str, *, native: bool | None = None) -> YalmFile:
    """mmap a `.yalm`/safetensors file and return zero-copy tensor views.

    Equivalent of the reference's YALMData::from_file (src/codec.cpp:116-199):
    the file is mapped read-only and every tensor is a numpy view directly
    into the mapping — no bytes are copied until a consumer (e.g.
    jax.device_put) reads them.

    `native`: True forces the C++ reader (yalm_tpu/native), False forces pure
    Python, None auto-selects native when the library is built.
    """
    if native is not False:
        try:
            from .. import native as nat
            if nat.loaded():
                nc = nat.NativeCheckpoint(path)
                return YalmFile(path=path, metadata=nc.metadata(),
                                tensors=nc.tensors(), _native=nc)
        except ImportError:
            pass
        if native is True:
            raise RuntimeError("native codec requested but libyalm_native.so not built")
    size = os.path.getsize(path)
    if size < 8:
        raise ValueError(f"{path}: too small to be a .yalm file")
    with open(path, "rb") as f:
        mapped = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    mapped.madvise(mmap.MADV_SEQUENTIAL)

    header_size = int.from_bytes(mapped[:8], "little")
    if header_size > size - 8:
        mapped.close()
        raise ValueError(f"{path}: bad header size {header_size}")
    header = json.loads(mapped[8 : 8 + header_size].decode("utf-8"))

    data_start = 8 + header_size
    buf = memoryview(mapped)[data_start:]

    metadata: dict[str, str] = {}
    tensors: dict[str, np.ndarray] = {}
    for name, val in header.items():
        if name == "__metadata__":
            metadata = dict(val)
            continue
        dtype = np_dtype_for(val["dtype"])
        shape = tuple(int(d) for d in val["shape"])
        start, end = val["data_offsets"]
        nbytes = int(np.prod(shape, dtype=np.int64)) * dtype.itemsize if shape else dtype.itemsize
        if end - start != nbytes:
            raise ValueError(f"{path}: tensor {name}: offsets {start}:{end} != {nbytes} bytes")
        arr = np.frombuffer(buf[start:end], dtype=dtype).reshape(shape)
        tensors[name] = arr
    return YalmFile(path=path, metadata=metadata, tensors=tensors, _mmap=mapped)


def write_yalm(path: str, tensors: dict[str, np.ndarray], metadata: dict[str, str]) -> None:
    """Write a safetensors-format `.yalm` file.

    Layout matches what the reference's converter emits via save_file
    (convert.py:248): u64 header length, JSON header with "__metadata__",
    then contiguous little-endian tensor data. The header is padded with
    spaces so tensor data starts 8-byte aligned.
    """
    entries: dict[str, dict] = {"__metadata__": {k: str(v) for k, v in metadata.items()}}
    offset = 0
    order: list[tuple[str, np.ndarray]] = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        nbytes = arr.nbytes
        entries[name] = {
            "dtype": tag_for_np_dtype(arr.dtype),
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        order.append((name, arr))
        offset += nbytes

    header = json.dumps(entries, separators=(",", ":")).encode("utf-8")
    pad = (-(8 + len(header))) % 8
    header += b" " * pad

    with open(path, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        for _, arr in order:
            f.write(arr.tobytes())

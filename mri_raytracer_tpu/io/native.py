"""ctypes bindings for the native IO runtime (``runtime/libmri_io.so``).

Provides GIL-free parallel case loading (gzip inflate + NIfTI parse +
z-score, all in C++ worker threads) for the device-pool refresh path, plus a
native BC4 decoder. Falls back transparently to the pure-Python
implementations when the library is absent or unbuilt — every entry point
here has a tested Python equivalent (``data/nifti.py``, ``data/codecs.py``).
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    pathlib.Path(__file__).resolve().parents[2] / "runtime" / "libmri_io.so",
]


class _LoadJob(ctypes.Structure):
    _fields_ = [
        ("src", ctypes.c_void_p),
        ("src_len", ctypes.c_longlong),
        ("out", ctypes.c_void_p),
        ("out_cap", ctypes.c_longlong),
        ("dims", ctypes.c_void_p),
        ("do_zscore", ctypes.c_int),
        ("status", ctypes.c_int),
    ]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.mri_gunzip.restype = ctypes.c_longlong
            lib.mri_nifti_to_f32.restype = ctypes.c_longlong
            lib.mri_bc4_decode.restype = ctypes.c_int
            lib.mri_load_batch.restype = ctypes.c_int
            return lib
    return None


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


def gunzip(data: bytes, max_out: int) -> bytes:
    if _LIB is None:
        import gzip

        return gzip.decompress(data)
    out = np.empty(max_out, np.uint8)
    n = _LIB.mri_gunzip(data, len(data), out.ctypes.data_as(ctypes.c_void_p),
                        max_out)
    if n < 0:
        raise ValueError("native gunzip failed")
    return out[:n].tobytes()


def decode_bc4(data: bytes, width: int, height: int, depth: int = 1) -> np.ndarray:
    if _LIB is None:
        from mri_raytracer_tpu.data.codecs import decode_bc4 as py

        return py(data, width, height, depth)
    bw, bh = (width + 3) // 4, (height + 3) // 4
    out = np.zeros((depth, bh * 4, bw * 4), np.uint8)
    rc = _LIB.mri_bc4_decode(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p),
                             bw * 4, bh * 4, depth)
    if rc != 0:
        raise ValueError("native BC4 decode failed")
    return out[:, :height, :width]


def load_nifti_batch(paths: Sequence[pathlib.Path], zscore: bool = True,
                     max_voxels: int = 256 ** 3, n_threads: int = 4,
                     ) -> List[Optional[Tuple[np.ndarray, Tuple[int, ...]]]]:
    """Parallel NIfTI loads -> list of (float32 volume (X,Y,Z), dims) or None.

    All inflate/parse/normalize work runs in C++ threads (no GIL); Python
    only mmaps the compressed bytes and reshapes the outputs.
    """
    if _LIB is None:
        from mri_raytracer_tpu.data import nifti
        from mri_raytracer_tpu.data.brats import zscore_nonzero

        res = []
        for p in paths:
            arr = nifti.load(p).data.astype(np.float32)
            if zscore:
                arr = zscore_nonzero(arr)
            res.append((arr, arr.shape))
        return res

    # Bounded-chunk processing: the max_voxels staging buffers (~108 MB each
    # at the cache's 300^3 setting) and the compressed raws are reused /
    # released per chunk, so peak RSS is ~2*n_threads buffers + the final
    # right-sized volumes instead of one buffer per file in the batch.
    n = len(paths)
    chunk = max(2 * n_threads, 1)
    n_buf = min(chunk, n)
    outs = [np.empty(max_voxels, np.float32) for _ in range(n_buf)]
    dims = [np.zeros(3, np.int32) for _ in range(n_buf)]
    scratch_per = max_voxels * 8 + 4096
    scratch = np.empty(n_threads * scratch_per, np.uint8)
    results: List[Optional[Tuple[np.ndarray, Tuple[int, ...]]]] = []
    for c0 in range(0, n, chunk):
        sub = paths[c0:c0 + chunk]
        m = len(sub)
        jobs = (_LoadJob * m)()
        keep = []  # keep byte buffers alive for this chunk
        for i, p in enumerate(sub):
            raw = pathlib.Path(p).read_bytes()
            buf = ctypes.create_string_buffer(raw, len(raw))
            keep.append(buf)
            jobs[i].src = ctypes.cast(buf, ctypes.c_void_p)
            jobs[i].src_len = len(raw)
            jobs[i].out = outs[i].ctypes.data_as(ctypes.c_void_p)
            jobs[i].out_cap = max_voxels
            jobs[i].dims = dims[i].ctypes.data_as(ctypes.c_void_p)
            jobs[i].do_zscore = 1 if zscore else 0
            jobs[i].status = 1
        _LIB.mri_load_batch(jobs, m, n_threads,
                            scratch.ctypes.data_as(ctypes.c_void_p),
                            scratch_per)
        for i in range(m):
            if jobs[i].status != 0:
                results.append(None)
                continue
            d = tuple(int(x) for x in dims[i])
            count = int(np.prod(d))
            vol = outs[i][:count].reshape(d, order="F").copy()
            results.append((vol, d))
    return results

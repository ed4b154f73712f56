"""Indexed random access into webdataset tar shards — native C++ reader.

Capability parity: the reference's vendored `wids` (llava/wids/wids.py:226
`IndexedTarSamples` + mmap tar `wids_mmtar.py`, and `VILAWebDataset`
grouping, llava/data/simple_vila_webdataset.py:195): random access to
samples in .tar shards, samples grouped by basename stem, with an LRU shard
cache.

The hot path is native: `native/tario.cpp` mmaps each shard once, parses the
tar index in C++, and serves zero-copy pointers; Python binds it via ctypes
(auto-compiled with g++ on first use). A pure-Python `tarfile` fallback
keeps everything working where no compiler exists.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    """Compile libtario.so on demand; return None if impossible."""
    global _LIB, _LIB_FAILED
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_FAILED:
            return None
        src = os.path.abspath(os.path.join(_NATIVE_DIR, "tario.cpp"))
        so = os.path.abspath(os.path.join(_NATIVE_DIR, "libtario.so"))
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.tario_open.restype = ctypes.c_void_p
            lib.tario_open.argtypes = [ctypes.c_char_p]
            lib.tario_close.argtypes = [ctypes.c_void_p]
            lib.tario_count.restype = ctypes.c_int64
            lib.tario_count.argtypes = [ctypes.c_void_p]
            lib.tario_name.restype = ctypes.c_char_p
            lib.tario_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.tario_size.restype = ctypes.c_int64
            lib.tario_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.tario_read.restype = ctypes.c_int64
            lib.tario_read.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            _LIB = lib
            return lib
        except Exception:
            _LIB_FAILED = True
            return None


class IndexedTar:
    """Random access to one tar shard: names, sizes, bytes by index."""

    def __init__(self, path: str, force_python: bool = False) -> None:
        self.path = path
        self._handle = None
        self._py_index: Optional[List[Tuple[str, int, int]]] = None
        lib = None if force_python else _build_and_load()
        if lib is not None:
            handle = lib.tario_open(path.encode())
            if handle:
                self._lib = lib
                self._handle = ctypes.c_void_p(handle)
        if self._handle is None:
            self._build_py_index()

    # -- python fallback ------------------------------------------------
    def _build_py_index(self) -> None:
        import tarfile

        index = []
        with tarfile.open(self.path, "r:") as tf:
            for m in tf:
                if m.isreg():
                    index.append((m.name, m.offset_data, m.size))
        self._py_index = index

    # -- api -------------------------------------------------------------
    def __len__(self) -> int:
        if self._handle is not None:
            return int(self._lib.tario_count(self._handle))
        return len(self._py_index)

    def name(self, i: int) -> str:
        if self._handle is not None:
            return self._lib.tario_name(self._handle, i).decode()
        return self._py_index[i][0]

    def read(self, i: int) -> bytes:
        if self._handle is not None:
            n = int(self._lib.tario_size(self._handle, i))
            buf = (ctypes.c_uint8 * n)()
            got = self._lib.tario_read(self._handle, i, buf, n)
            return bytes(buf[:got])
        name, off, size = self._py_index[i]
        with open(self.path, "rb") as f:
            f.seek(off)
            return f.read(size)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.tario_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass

    @property
    def is_native(self) -> bool:
        return self._handle is not None


def group_samples(names: List[str]) -> "OrderedDict[str, Dict[str, int]]":
    """Group member indices by sample key (basename up to first dot) —
    webdataset convention (wids.py sample grouping)."""
    groups: "OrderedDict[str, Dict[str, int]]" = OrderedDict()
    for i, n in enumerate(names):
        base = os.path.basename(n)
        if not base or base.startswith("."):
            continue
        stem, _, ext = base.partition(".")
        groups.setdefault(stem, {})[ext] = i
    return groups


class ShardedTarDataset:
    """Multi-shard indexed dataset with an LRU shard cache.

    Samples are dicts {ext: bytes}. Mirrors `VILAWebDataset`'s flat indexing
    over shards (simple_vila_webdataset.py:195) with wids' LRU shard cache.
    """

    def __init__(self, shard_paths: List[str], cache_size: int = 8) -> None:
        self.shard_paths = list(shard_paths)
        self.cache_size = cache_size
        self._cache: "OrderedDict[str, Tuple[IndexedTar, OrderedDict]]" = (
            OrderedDict()
        )
        # Build the per-shard sample counts once (index pass).
        self._spans: List[Tuple[int, int]] = []  # (start, count) per shard
        total = 0
        self._keys: List[List[str]] = []
        for p in self.shard_paths:
            tar, groups = self._open(p)
            keys = list(groups.keys())
            self._keys.append(keys)
            self._spans.append((total, len(keys)))
            total += len(keys)
        self._total = total

    def _open(self, path: str) -> Tuple[IndexedTar, "OrderedDict"]:
        if path in self._cache:
            self._cache.move_to_end(path)
            return self._cache[path]
        tar = IndexedTar(path)
        names = [tar.name(i) for i in range(len(tar))]
        groups = group_samples(names)
        self._cache[path] = (tar, groups)
        while len(self._cache) > self.cache_size:
            _, (old, _g) = self._cache.popitem(last=False)
            old.close()
        return self._cache[path]

    def __len__(self) -> int:
        return self._total

    def __getitem__(self, idx: int) -> Dict[str, bytes]:
        if idx < 0:
            idx += self._total
        for shard_i, (start, count) in enumerate(self._spans):
            if start <= idx < start + count:
                path = self.shard_paths[shard_i]
                tar, groups = self._open(path)
                key = self._keys[shard_i][idx - start]
                members = groups[key]
                out = {"__key__": key.encode()}
                for ext, i in members.items():
                    out[ext] = tar.read(i)
                return out
        raise IndexError(idx)

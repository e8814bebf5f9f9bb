"""ctypes bindings to the C++ native layer (libfastgraph.so).

The native layer covers the host-side data plumbing that the reference
implements in C++ (edge-list parsing + string interning,
/root/reference/src/proNet.cpp:41-236, and alias-table construction,
proNet.cpp:544-620) -- the pieces that are too slow in pure Python at
Youtube-links scale (SURVEY.md section 7.3 "hard parts").

Falls back gracefully: ``available()`` returns False when the shared
library has not been built; pure-python paths are used instead.
Build with: ``make -C smore_tpu/native`` (done automatically on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libfastgraph.so")
_lib = None
_lock = threading.Lock()
_build_attempted = False


def _try_build(force: bool = False) -> None:
    global _build_attempted
    if _build_attempted and not force:
        return
    _build_attempted = True
    src = os.path.join(_HERE, "fastgraph.cpp")
    if not os.path.exists(src):
        return
    tmp = _SO + f".build.{os.getpid()}"
    try:
        # Build to a temp path then rename: os.replace gives the .so a new
        # inode, so a retry dlopen() after a failed bind sees the fresh
        # library instead of the stale in-process mapping.
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", tmp, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, _SO)
    except subprocess.CalledProcessError as e:
        import sys

        print(
            "smore_tpu: native fastgraph build failed; using pure-Python "
            f"fallbacks.\n{e.stderr.decode(errors='replace')[-2000:]}",
            file=sys.stderr,
        )
    except Exception:
        pass
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(lib: ctypes.CDLL) -> None:
    """Declare the full symbol table; raises AttributeError if the .so is
    from an older source revision and lacks newer entry points."""
    lib.fg_load_edgelist.restype = ctypes.c_void_p
    lib.fg_load_edgelist.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.fg_n_vertices.restype = ctypes.c_longlong
    lib.fg_n_vertices.argtypes = [ctypes.c_void_p]
    lib.fg_n_edges.restype = ctypes.c_longlong
    lib.fg_n_edges.argtypes = [ctypes.c_void_p]
    lib.fg_names_size.restype = ctypes.c_longlong
    lib.fg_names_size.argtypes = [ctypes.c_void_p]
    lib.fg_export.restype = None
    lib.fg_export.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64),   # indptr (N+1)
        np.ctypeslib.ndpointer(np.int32),   # indices (E)
        np.ctypeslib.ndpointer(np.float64), # weights (E)
        np.ctypeslib.ndpointer(np.float64), # out_degree (N)
        np.ctypeslib.ndpointer(np.float64), # in_degree (N)
        ctypes.c_char_p,                    # names buffer
    ]
    lib.fg_free.restype = None
    lib.fg_free.argtypes = [ctypes.c_void_p]

    lib.fg_build_alias.restype = None
    lib.fg_build_alias.argtypes = [
        np.ctypeslib.ndpointer(np.float64),  # norm_prob, modified in place
        ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.float64),  # prob out
        np.ctypeslib.ndpointer(np.int64),    # alias out
    ]
    lib.fg_build_alias_segmented.restype = None
    lib.fg_build_alias_segmented.argtypes = [
        np.ctypeslib.ndpointer(np.float64),  # weights
        np.ctypeslib.ndpointer(np.int64),    # indptr
        ctypes.c_longlong,                   # n segments
        ctypes.c_double,                     # power
        np.ctypeslib.ndpointer(np.float64),  # prob out
        np.ctypeslib.ndpointer(np.int64),    # alias out (local)
    ]
    lib.fg_save_embeddings.restype = ctypes.c_int
    lib.fg_save_embeddings.argtypes = [
        ctypes.c_char_p,                     # path
        ctypes.c_char_p,                     # names blob
        np.ctypeslib.ndpointer(np.float32),  # table (n, dim)
        ctypes.c_longlong,
        ctypes.c_longlong,
    ]
    lib.fg_warm_start.restype = ctypes.c_longlong
    lib.fg_warm_start.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_longlong,
        ctypes.c_longlong,
        np.ctypeslib.ndpointer(np.float32),  # table, modified in place
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_HERE, "fastgraph.cpp")
        stale = (
            os.path.exists(_SO)
            and os.path.exists(src)
            and os.path.getmtime(_SO) < os.path.getmtime(src)
        )
        if not os.path.exists(_SO) or stale:
            _try_build(force=stale)
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
            _bind(lib)
        except (OSError, AttributeError):
            # A prebuilt .so from an older source revision can lack newer
            # symbols; rebuild once from the current source and retry, else
            # honor the graceful-fallback contract (available() -> False).
            _try_build(force=True)
            try:
                lib = ctypes.CDLL(_SO)
                _bind(lib)
            except (OSError, AttributeError):
                return None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_alias(norm_prob: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vose build over probabilities already scaled to mean 1."""
    lib = _load()
    n = len(norm_prob)
    prob = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    buf = np.ascontiguousarray(norm_prob, dtype=np.float64).copy()
    lib.fg_build_alias(buf, n, prob, alias)
    return prob, alias


def build_alias_segmented(
    weights: np.ndarray, indptr: np.ndarray, power: float
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    n = len(weights)
    prob = np.empty(n, dtype=np.float64)
    alias = np.empty(n, dtype=np.int64)
    lib.fg_build_alias_segmented(
        np.ascontiguousarray(weights, dtype=np.float64),
        np.ascontiguousarray(indptr, dtype=np.int64),
        len(indptr) - 1,
        float(power),
        prob,
        alias,
    )
    return prob, alias


def _names_blob(names) -> bytes:
    return b"\x00".join(s.encode() for s in names) + b"\x00"


def save_embeddings(path: str, names, table: np.ndarray) -> None:
    """Native writer for the interchange format (role of the reference's
    C++ SaveWeights, src/model/LINE.cpp:13-47); same %.6g values as the
    Python fallback in io/embeddings.py."""
    lib = _load()
    t = np.ascontiguousarray(table, dtype=np.float32)
    n, dim = t.shape
    rc = lib.fg_save_embeddings(path.encode(), _names_blob(names), t, n, dim)
    if rc != 0:
        raise OSError(f"fg_save_embeddings failed for {path}")


def warm_start(table: np.ndarray, names, pretrain_path: str) -> np.ndarray:
    """Native LoadPreTrain (proNet.cpp:238-286): overwrite rows by name
    where the line's dim matches; returns a new array."""
    lib = _load()
    t = np.array(table, dtype=np.float32, copy=True, order="C")
    n, dim = t.shape
    matched = lib.fg_warm_start(
        pretrain_path.encode(), _names_blob(names), n, dim, t
    )
    if matched < 0:
        raise OSError(f"cannot open pretrain file {pretrain_path}")
    return t


def load_edge_list(files: List[str], undirected: bool):
    """Parse edge-list files with the native tokenizer + interner."""
    from smore_tpu.graph.graph import Graph

    lib = _load()
    handle = lib.fg_load_edgelist(
        "\n".join(files).encode(), 1 if undirected else 0, 0
    )
    if not handle:
        raise RuntimeError("no input files")
    try:
        n = lib.fg_n_vertices(handle)
        e = lib.fg_n_edges(handle)
        nb = lib.fg_names_size(handle)
        indptr = np.empty(n + 1, dtype=np.int64)
        indices = np.empty(e, dtype=np.int32)
        weights = np.empty(e, dtype=np.float64)
        out_deg = np.empty(n, dtype=np.float64)
        in_deg = np.empty(n, dtype=np.float64)
        names_buf = ctypes.create_string_buffer(nb)
        lib.fg_export(handle, indptr, indices, weights, out_deg, in_deg, names_buf)
        names = names_buf.raw[: nb - 1].decode().split("\x00") if nb > 1 else []
        name2id = {s: i for i, s in enumerate(names)}
        return Graph(
            indptr=indptr,
            indices=indices,
            weights=weights,
            names=names,
            name2id=name2id,
            out_degree=out_deg,
            in_degree=in_deg,
        )
    finally:
        lib.fg_free(handle)

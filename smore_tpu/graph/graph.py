"""Host-side weighted-graph store: CSR + string interning + loaders.

Covers the reference's L1 layer (graph storage & I/O):
  - edge-list loader incl. directory-of-files input
    (/root/reference/src/proNet.cpp:115-236)
  - string interning (the reference uses a 30M-slot open-address hash,
    /root/reference/src/proNet.h:51-99; here a Python dict or the C++
    native parser in smore_tpu/native)
  - CSR reconstruction (/root/reference/src/proNet.cpp:410-450)
  - field metadata (/root/reference/src/proNet.cpp:330-408)
  - per-vertex dynamic walk metadata (/root/reference/src/proNet.cpp:288-328)
  - pretrain warm-start loader (/root/reference/src/proNet.cpp:238-286)

Design difference from the reference: the store is immutable numpy CSR
(indptr/indices/weights) built in one shot, because the consumers are
batched device-side samplers, not per-sample pointer chasing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _iter_edge_files(path: str) -> List[str]:
    """An input path may be a single file or a directory of files
    (reference: proNet.cpp:124-138 + util.cpp isDirectory)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
    return [path]


@dataclass
class Graph:
    """Immutable weighted directed graph in CSR form.

    Attributes
    ----------
    indptr : (N+1,) int64 -- CSR row offsets (reference Vertex.offset/branch)
    indices : (E,) int32 -- destination vid per edge slot
    weights : (E,) float64 -- edge weight per slot
    names : list of vertex names; ``name2id`` the inverse map
    out_degree : (N,) float64 -- weighted out-degree (sum of outgoing weights)
    in_degree : (N,) float64 -- weighted in-degree (sum of incoming weights)
    """

    indptr: np.ndarray
    indices: np.ndarray
    weights: np.ndarray
    names: List[str]
    name2id: Dict[str, int]
    out_degree: np.ndarray
    in_degree: np.ndarray
    # Optional field metadata (reference LoadFieldMeta): per-vertex field ids.
    fields: Optional[np.ndarray] = None
    n_fields: int = 1
    # Optional per-vertex walk lengths (reference LoadWalkMeta / dynamic_walk).
    walk_steps: Optional[np.ndarray] = None
    field_names: List[str] = field(default_factory=list)

    # ------------------------------------------------------------------ #
    # Basic accessors
    # ------------------------------------------------------------------ #
    @property
    def n_vertices(self) -> int:
        return len(self.indptr) - 1

    @property
    def n_edges(self) -> int:
        return len(self.indices)

    def branch(self, vid: int) -> int:
        return int(self.indptr[vid + 1] - self.indptr[vid])

    def neighbors(self, vid: int) -> np.ndarray:
        return self.indices[self.indptr[vid] : self.indptr[vid + 1]]

    def neighbor_weights(self, vid: int) -> np.ndarray:
        return self.weights[self.indptr[vid] : self.indptr[vid + 1]]

    # ------------------------------------------------------------------ #
    # Construction
    # ------------------------------------------------------------------ #
    @staticmethod
    def from_arrays(
        src: np.ndarray,
        dst: np.ndarray,
        w: np.ndarray,
        names: List[str],
        name2id: Dict[str, int],
    ) -> "Graph":
        """Build CSR from parallel edge arrays (vids already interned)."""
        n = len(names)
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)

        # Aggregate duplicate edges is NOT done (the reference keeps
        # duplicates and they add sampling mass, proNet.cpp:208-215).
        order = np.argsort(src, kind="stable")
        src_s, dst_s, w_s = src[order], dst[order], w[order]
        counts = np.bincount(src_s, minlength=n)
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])

        out_degree = np.bincount(src, weights=w, minlength=n)
        in_degree = np.bincount(dst, weights=w, minlength=n)

        return Graph(
            indptr=indptr,
            indices=dst_s.astype(np.int32),
            weights=w_s,
            names=names,
            name2id=name2id,
            out_degree=out_degree,
            in_degree=in_degree,
        )

    @staticmethod
    def from_edges(
        edges: Sequence[Tuple[str, str, float]], undirected: bool = True
    ) -> "Graph":
        """Build from (src_name, dst_name, weight) tuples."""
        name2id: Dict[str, int] = {}
        names: List[str] = []
        src_l: List[int] = []
        dst_l: List[int] = []
        w_l: List[float] = []

        def intern(s: str) -> int:
            i = name2id.get(s)
            if i is None:
                i = len(names)
                name2id[s] = i
                names.append(s)
            return i

        for a, b, w in edges:
            ia, ib = intern(a), intern(b)
            src_l.append(ia)
            dst_l.append(ib)
            w_l.append(w)
            if undirected:
                src_l.append(ib)
                dst_l.append(ia)
                w_l.append(w)

        return Graph.from_arrays(
            np.array(src_l, dtype=np.int64),
            np.array(dst_l, dtype=np.int64),
            np.array(w_l, dtype=np.float64),
            names,
            name2id,
        )

    @staticmethod
    def load_edge_list(
        path: str, undirected: bool = True, use_native: bool = True
    ) -> "Graph":
        """Load ``src dst [weight]`` text file(s).

        Matches reference semantics (proNet.cpp:115-236): whitespace-split,
        weight defaults to 1.0 if missing, undirected doubles every edge,
        malformed lines are skipped with a warning.
        """
        files = _iter_edge_files(path)
        if use_native:
            try:
                from smore_tpu.native import fastgraph

                if fastgraph.available():
                    return fastgraph.load_edge_list(files, undirected)
            except Exception:
                pass  # fall back to the pure-python loader
        return Graph._load_edge_list_py(files, undirected)

    @staticmethod
    def _load_edge_list_py(files: List[str], undirected: bool) -> "Graph":
        name2id: Dict[str, int] = {}
        names: List[str] = []
        src_l: List[int] = []
        dst_l: List[int] = []
        w_l: List[float] = []

        for fname in files:
            with open(fname, "r") as f:
                for line in f:
                    parts = line.split()
                    if not parts:
                        continue
                    if len(parts) < 2:
                        print(f"[smore-tpu] skipping malformed line: {line!r}")
                        continue
                    a, b = parts[0], parts[1]
                    try:
                        w = float(parts[2]) if len(parts) >= 3 else 1.0
                    except ValueError:
                        print(f"[smore-tpu] skipping malformed line: {line!r}")
                        continue
                    ia = name2id.get(a)
                    if ia is None:
                        ia = len(names)
                        name2id[a] = ia
                        names.append(a)
                    ib = name2id.get(b)
                    if ib is None:
                        ib = len(names)
                        name2id[b] = ib
                        names.append(b)
                    src_l.append(ia)
                    dst_l.append(ib)
                    w_l.append(w)
                    if undirected:
                        src_l.append(ib)
                        dst_l.append(ia)
                        w_l.append(w)

        return Graph.from_arrays(
            np.array(src_l, dtype=np.int64),
            np.array(dst_l, dtype=np.int64),
            np.array(w_l, dtype=np.float64),
            names,
            name2id,
        )

    # ------------------------------------------------------------------ #
    # Metadata loaders
    # ------------------------------------------------------------------ #
    def load_field_meta(self, path: str) -> None:
        """``vertex field`` file -> per-vertex integer field id.

        Reference: proNet::LoadFieldMeta (proNet.cpp:330-408). The
        reference materializes per-(vertex,field) shadow vids
        (``MAX_fvid``); here field-projected tables are handled by index
        arithmetic in the models (vid * n_fields + fid), so we only store
        the field id per vertex.
        """
        fields = np.zeros(self.n_vertices, dtype=np.int32)
        fnames: Dict[str, int] = {}
        for fname in _iter_edge_files(path):
            with open(fname, "r") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 2:
                        continue
                    vid = self.name2id.get(parts[0])
                    if vid is None:
                        continue
                    fid = fnames.setdefault(parts[1], len(fnames))
                    fields[vid] = fid
        self.fields = fields
        self.n_fields = max(1, len(fnames))
        self.field_names = [k for k, _ in sorted(fnames.items(), key=lambda kv: kv[1])]

    def load_walk_meta(self, path: str, default_steps: int = 3) -> None:
        """``vertex steps`` file -> per-vertex walk length
        (reference proNet::LoadWalkMeta, proNet.cpp:288-328; vertices not
        named in the file keep the reference default of 3 steps,
        proNet.cpp:310)."""
        steps = np.full(self.n_vertices, default_steps, dtype=np.int32)
        for fname in _iter_edge_files(path):
            with open(fname, "r") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) < 2:
                        continue
                    vid = self.name2id.get(parts[0])
                    if vid is None:
                        continue
                    try:
                        steps[vid] = int(parts[1])
                    except ValueError:
                        continue
        self.walk_steps = steps

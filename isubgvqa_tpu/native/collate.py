"""Columnar graph store + ctypes driver for the native collate fill.

:class:`PackedGraphStore` keeps every distinct :class:`GraphArrays`
(they are cached per image by ``SceneGraphStore.query``, so object
identity is a stable key) in capacity-doubling contiguous arrays —
node tokens/bboxes ``[total_nodes, 4]``, edge columns
``[total_edges]``, plus ``int64`` offsets.  The C++ kernel
(``csrc/collate.cpp``) then assembles a dense ``GraphBatch`` fill with
straight memcpys; the ctypes call releases the GIL, so the prefetch
thread's collation overlaps Python work elsewhere.

This replaces, host-side, what the reference gets from PyG's
``Batch.from_data_list`` (reference ``datasets/gqa.py:260``) plus
DataLoader worker processes (reference ``datasets/build.py:70-90``).
"""

from __future__ import annotations

import ctypes
import threading
from typing import Optional, Sequence

import numpy as np

from .build import build_and_load

_I64 = ctypes.c_int64
_P = ctypes.c_void_p

_lib_lock = threading.Lock()
_lib: object = False          # False = not loaded yet; None = unavailable


def load_collate_lib() -> Optional[ctypes.CDLL]:
    """Build/load the collate kernel once per process (thread-safe)."""
    global _lib
    if _lib is False:
        with _lib_lock:
            if _lib is False:
                lib = build_and_load("collate")
                if lib is not None:
                    lib.isubgvqa_collate_fill.restype = None
                    lib.isubgvqa_collate_fill.argtypes = (
                        [_P] * 8 + [_P, _P, _I64, _I64, _I64, _I64]
                        + [_P] * 11)
                _lib = lib
    return _lib or None


def _grow(arr: np.ndarray, need: int) -> np.ndarray:
    cap = arr.shape[0]
    if need <= cap:
        return arr
    new_cap = max(need, cap * 2)
    out = np.empty((new_cap,) + arr.shape[1:], arr.dtype)
    out[:cap] = arr
    return out


class PackedGraphStore:
    """Incrementally packed graphs, keyed by GraphArrays identity.

    ``rows()`` maps a batch of graphs to store rows, appending unknown
    graphs first; after the first epoch every graph is a dict hit.
    Thread-safe (one lock around growth and lookup) so concurrent
    prefetch threads can share one store.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._row_of: dict = {}       # id(GraphArrays) -> row
        self._keepalive: list = []    # prevents id() reuse
        self.n_graphs = 0
        self.n_nodes = 0
        self.n_edges = 0
        self.node_tokens = np.empty((256, 4), np.int32)
        self.node_bbox = np.empty((256, 4), np.float32)
        self.edge_src = np.empty((1024,), np.int32)
        self.edge_dst = np.empty((1024,), np.int32)
        self.edge_token = np.empty((1024,), np.int32)
        self.edge_sign = np.empty((1024,), np.float32)
        self.node_off = np.zeros((257,), np.int64)
        self.edge_off = np.zeros((257,), np.int64)

    def _add(self, g) -> int:
        n, e = g.num_nodes, g.num_edges
        self.node_tokens = _grow(self.node_tokens, self.n_nodes + n)
        self.node_bbox = _grow(self.node_bbox, self.n_nodes + n)
        self.edge_src = _grow(self.edge_src, self.n_edges + e)
        self.edge_dst = _grow(self.edge_dst, self.n_edges + e)
        self.edge_token = _grow(self.edge_token, self.n_edges + e)
        self.edge_sign = _grow(self.edge_sign, self.n_edges + e)
        self.node_off = _grow(self.node_off, self.n_graphs + 2)
        self.edge_off = _grow(self.edge_off, self.n_graphs + 2)
        self.node_tokens[self.n_nodes:self.n_nodes + n] = g.node_tokens
        self.node_bbox[self.n_nodes:self.n_nodes + n] = g.node_bbox
        self.edge_src[self.n_edges:self.n_edges + e] = g.edge_src
        self.edge_dst[self.n_edges:self.n_edges + e] = g.edge_dst
        self.edge_token[self.n_edges:self.n_edges + e] = g.edge_token
        self.edge_sign[self.n_edges:self.n_edges + e] = g.edge_sign
        self.n_nodes += n
        self.n_edges += e
        self.n_graphs += 1
        self.node_off[self.n_graphs] = self.n_nodes
        self.edge_off[self.n_graphs] = self.n_edges
        row = self.n_graphs - 1
        self._row_of[id(g)] = row
        self._keepalive.append(g)
        return row

    def rows(self, graphs: Sequence) -> np.ndarray:
        out = np.empty(len(graphs), np.int64)
        row_of = self._row_of
        with self._lock:
            for i, g in enumerate(graphs):
                r = row_of.get(id(g))
                out[i] = self._add(g) if r is None else r
        return out

    def fill_batch(self, lib: ctypes.CDLL, rows: np.ndarray,
                   labels: np.ndarray, b: int, n: int, e: int) -> tuple:
        """Run the C++ fill.  Returns the ten dense batch arrays plus
        the (truncated_nodes, truncated_edges) increments."""
        num_real = len(rows)
        out_nt = np.empty((b, n, 4), np.int32)
        out_nb = np.empty((b, n, 4), np.float32)
        out_nm = np.empty((b, n), np.uint8)
        out_es = np.empty((b, e), np.int32)
        out_ed = np.empty((b, e), np.int32)
        out_et = np.empty((b, e), np.int32)
        out_esg = np.empty((b, e), np.float32)
        out_em = np.empty((b, e), np.uint8)
        out_labels = np.empty((b,), np.int32)
        out_sm = np.empty((b,), np.float32)
        trunc = np.zeros((2,), np.int64)

        def p(a: np.ndarray) -> int:
            return a.ctypes.data

        # snapshot the buffer references under the lock, then call C
        # outside it: growth in another thread swaps in NEW buffers but
        # never moves or mutates data of already-assigned rows, and the
        # snapshot keeps the old buffers alive — so concurrent collate
        # threads overlap their (GIL-released) fills instead of
        # serializing on the store lock.
        with self._lock:
            bufs = (self.node_tokens, self.node_bbox, self.edge_src,
                    self.edge_dst, self.edge_token, self.edge_sign,
                    self.node_off, self.edge_off)
        lib.isubgvqa_collate_fill(
            p(bufs[0]), p(bufs[1]), p(bufs[2]), p(bufs[3]),
            p(bufs[4]), p(bufs[5]), p(bufs[6]), p(bufs[7]),
            p(rows), p(labels), num_real, b, n, e,
            p(out_nt), p(out_nb), p(out_nm),
            p(out_es), p(out_ed), p(out_et), p(out_esg), p(out_em),
            p(out_labels), p(out_sm), p(trunc))
        return (out_nt, out_nb, out_nm.view(bool), out_es, out_ed, out_et,
                out_esg, out_em.view(bool), out_labels, out_sm,
                int(trunc[0]), int(trunc[1]))

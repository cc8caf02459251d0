"""ctypes bindings for the native C++ batch collation kernel.

Builds ``native/libcollate.so`` on first use (g++, cached) and exposes
``native_pad_graphs`` — a drop-in fast path for
:func:`moleculesde_tpu.core.batch.pad_graphs`.  Falls back silently if the
toolchain or library is unavailable; correctness parity is enforced by
tests/test_native_collate.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

from moleculesde_tpu.core.batch import (
    GraphBatch,
    NUM_ATOM_FEATURES,
    NUM_BOND_FEATURES,
)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcollate.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.collate_graphs.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, ctype):
    if a is None:
        return None
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def native_pad_graphs(
    graphs: Sequence[Dict],
    n_max: int,
    e_max: int,
    ext_e_max: Optional[int] = None,
    num_graphs: Optional[int] = None,
    num_tasks: Optional[int] = None,
    with_forces: bool = False,
) -> Optional[GraphBatch]:
    """C++-accelerated collation; returns None if the native lib is missing
    (callers fall back to the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    b = num_graphs if num_graphs is not None else len(graphs)
    if ext_e_max is None:
        ext_e_max = e_max

    # concatenate per-graph arrays (vectorized numpy, cheap)
    atom_list, pos_list, ei_list, ef_list, xi_list, xa_list = [], [], [], [], [], []
    a_off = [0]
    e_off = [0]
    x_off = [0]
    has_pos = False
    for g in graphs:
        af = np.asarray(g["atom_feats"], dtype=np.int32)
        if af.ndim == 1:
            full = np.zeros((af.shape[0], NUM_ATOM_FEATURES), dtype=np.int32)
            full[:, 0] = af
            af = full
        atom_list.append(af)
        a_off.append(a_off[-1] + af.shape[0])
        p = g.get("positions")
        if p is not None:
            has_pos = True
            pos_list.append(np.asarray(p, dtype=np.float32))
        else:
            pos_list.append(np.zeros((af.shape[0], 3), dtype=np.float32))
        ei = _i32(g.get("edge_index", np.zeros((2, 0)))).reshape(2, -1)
        ef = _i32(g.get("edge_feats", np.zeros((ei.shape[1], NUM_BOND_FEATURES))))
        ei_list.append(ei)
        ef_list.append(ef.reshape(-1, NUM_BOND_FEATURES))
        e_off.append(e_off[-1] + ei.shape[1])
        if "ext_edge_index" in g and g["ext_edge_index"] is not None:
            xi = _i32(g["ext_edge_index"]).reshape(2, -1)
            xa = _i32(g.get("ext_edge_attr", np.zeros(xi.shape[1])))
        else:
            xi = ei
            xa = (ef[:, 0] + 1).astype(np.int32) if ef.size else np.zeros(
                (0,), dtype=np.int32)
        xi_list.append(xi)
        xa_list.append(xa)
        x_off.append(x_off[-1] + xi.shape[1])

    # pad offset arrays to B+1 (empty trailing graphs)
    while len(a_off) < b + 1:
        a_off.append(a_off[-1])
        e_off.append(e_off[-1])
        x_off.append(x_off[-1])

    atom_cat = np.concatenate(atom_list) if atom_list else np.zeros((0, 9), np.int32)
    pos_cat = np.concatenate(pos_list) if pos_list else np.zeros((0, 3), np.float32)
    ei_cat = (np.concatenate([e for e in ei_list], axis=1)
              if ei_list else np.zeros((2, 0), np.int32))
    ef_cat = (np.concatenate(ef_list) if ef_list
              else np.zeros((0, NUM_BOND_FEATURES), np.int32))
    xi_cat = (np.concatenate([x for x in xi_list], axis=1)
              if xi_list else np.zeros((2, 0), np.int32))
    xa_cat = np.concatenate(xa_list) if xa_list else np.zeros((0,), np.int32)
    ei_cat = np.ascontiguousarray(ei_cat)
    xi_cat = np.ascontiguousarray(xi_cat)
    a_off = np.asarray(a_off, dtype=np.int64)
    e_off = np.asarray(e_off, dtype=np.int64)
    x_off = np.asarray(x_off, dtype=np.int64)

    out_atom = np.zeros((b * n_max, NUM_ATOM_FEATURES), dtype=np.int32)
    out_nmask = np.zeros((b * n_max,), dtype=np.uint8)
    out_pos = np.zeros((b * n_max, 3), dtype=np.float32)
    out_esrc = np.zeros((b * e_max,), dtype=np.int32)
    out_edst = np.zeros((b * e_max,), dtype=np.int32)
    out_ef = np.zeros((b * e_max, NUM_BOND_FEATURES), dtype=np.int32)
    out_emask = np.zeros((b * e_max,), dtype=np.uint8)
    out_xsrc = np.zeros((b * ext_e_max,), dtype=np.int32)
    out_xdst = np.zeros((b * ext_e_max,), dtype=np.int32)
    out_xattr = np.zeros((b * ext_e_max,), dtype=np.int32)
    out_xmask = np.zeros((b * ext_e_max,), dtype=np.uint8)

    ret = lib.collate_graphs(
        _ptr(atom_cat, ctypes.c_int32),
        _ptr(pos_cat if has_pos else pos_cat, ctypes.c_float),
        _ptr(a_off, ctypes.c_int64),
        _ptr(ei_cat, ctypes.c_int32),
        _ptr(ef_cat, ctypes.c_int32),
        _ptr(e_off, ctypes.c_int64),
        _ptr(xi_cat, ctypes.c_int32),
        _ptr(xa_cat, ctypes.c_int32),
        _ptr(x_off, ctypes.c_int64),
        ctypes.c_int64(b), ctypes.c_int64(n_max), ctypes.c_int64(e_max),
        ctypes.c_int64(ext_e_max),
        ctypes.c_int64(NUM_ATOM_FEATURES), ctypes.c_int64(NUM_BOND_FEATURES),
        ctypes.c_int64(ei_cat.shape[1]), ctypes.c_int64(xi_cat.shape[1]),
        _ptr(out_atom, ctypes.c_int32),
        _ptr(out_nmask, ctypes.c_uint8),
        _ptr(out_pos, ctypes.c_float),
        _ptr(out_esrc, ctypes.c_int32),
        _ptr(out_edst, ctypes.c_int32),
        _ptr(out_ef, ctypes.c_int32),
        _ptr(out_emask, ctypes.c_uint8),
        _ptr(out_xsrc, ctypes.c_int32),
        _ptr(out_xdst, ctypes.c_int32),
        _ptr(out_xattr, ctypes.c_int32),
        _ptr(out_xmask, ctypes.c_uint8),
    )
    if ret != 0:
        return None

    y = None
    if num_tasks is not None:
        y = np.zeros((b, num_tasks), dtype=np.float32)
        for i, g in enumerate(graphs):
            if "y" in g and g["y"] is not None:
                y[i] = np.asarray(g["y"], np.float32).reshape(-1)[:num_tasks]
    forces = None
    if with_forces:
        forces = np.zeros((b * n_max, 3), dtype=np.float32)
        for i, g in enumerate(graphs):
            if "forces" in g and g["forces"] is not None:
                f = np.asarray(g["forces"], np.float32)
                n = min(f.shape[0], n_max)
                forces[i * n_max : i * n_max + n] = f[:n]

    return GraphBatch(
        atom_feats=out_atom,
        node_mask=out_nmask.astype(bool),
        positions=out_pos,
        edge_src=out_esrc, edge_dst=out_edst,
        edge_feats=out_ef, edge_mask=out_emask.astype(bool),
        ext_src=out_xsrc, ext_dst=out_xdst,
        ext_attr=out_xattr, ext_mask=out_xmask.astype(bool),
        y=y, forces=forces, num_graphs=b, n_max=n_max,
    )

"""ctypes bindings for the native I/O runtime (csrc/is3d2_io.cpp).

The shared library is built on demand with g++ into the package build dir
and cached; if no compiler is available we fall back to numpy.loadtxt
transparently (load_table_fast keeps the same semantics).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "is3d2_io.cpp"
_LIB_DIR = Path(__file__).resolve().parent.parent / "_native"
_LIB = _LIB_DIR / "libis3d2io.so"

_lib = None
_build_failed = False


def _build() -> bool:
    _LIB_DIR.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _SRC.exists() or not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.i3d_count_rows.restype = ctypes.c_longlong
        lib.i3d_count_rows.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_longlong)]
        lib.i3d_parse.restype = ctypes.c_longlong
        lib.i3d_parse.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_longlong]
        lib.i3d_write_events.restype = ctypes.c_longlong
        lib.i3d_write_events.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char,
            ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)), ctypes.c_int]
        lib.i3d_write_blocks.restype = ctypes.c_longlong
        lib.i3d_write_blocks.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char,
            ctypes.c_int, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)), ctypes.c_int,
            ctypes.c_longlong, ctypes.c_int]
        lib.i3d_build_alias.restype = ctypes.c_longlong
        lib.i3d_build_alias.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        _lib = lib
    except OSError:
        _build_failed = True
    return _lib


def _build_alias_numpy(r: np.ndarray):
    """Vose alias construction vectorized ACROSS cells (the per-cell
    small/large stack pairing is sequential, but every cell can take its
    next pairing step in lockstep) -- the no-compiler fallback for
    build_alias_tables."""
    C, S = r.shape
    p = np.clip(r, 0.0, None)
    tot = p.sum(axis=1)
    ok = tot > 0.0
    p = p * (S / np.where(ok, tot, 1.0))[:, None]
    p[~ok] = 1.0
    prob = np.ones((C, S), np.float32)
    alias = np.tile(np.arange(S, dtype=np.int32), (C, 1))

    is_small = p < 1.0
    ns = is_small.sum(axis=1).astype(np.int64)
    order = np.argsort(~is_small, axis=1, kind="stable")
    small = order.astype(np.int32)            # small[c, :ns[c]]
    large = order[:, ::-1].astype(np.int32)   # large[c, :S-ns[c]]
    nl = (S - ns).copy()
    for _ in range(2 * S):
        act = (ns > 0) & (nl > 0)
        if not act.any():
            break
        c = np.flatnonzero(act)
        s = small[c, ns[c] - 1]
        l = large[c, nl[c] - 1]
        ns[c] -= 1
        nl[c] -= 1
        prob[c, s] = p[c, s]
        alias[c, s] = l
        p[c, l] = (p[c, l] + p[c, s]) - 1.0
        back = p[c, l] < 1.0
        cs, ls = c[back], l[back]
        small[cs, ns[cs]] = ls
        ns[cs] += 1
        cl, ll = c[~back], l[~back]
        large[cl, nl[cl]] = ll
        nl[cl] += 1
    # stack leftovers keep their init (prob 1, alias self)
    return prob, alias


def build_alias_tables(rates: np.ndarray):
    """Walker alias tables (prob f32, alias i32), both (C, S), from the
    per-(cell, species) mean-yield matrix.  Native threaded builder
    (csrc/is3d2_io.cpp i3d_build_alias) with a vectorized numpy fallback."""
    r = np.ascontiguousarray(rates, dtype=np.float64)
    C, S = r.shape
    lib = _get_lib()
    if lib is None:
        return _build_alias_numpy(r)
    prob = np.empty((C, S), np.float32)
    alias = np.empty((C, S), np.int32)
    n = lib.i3d_build_alias(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), C, S,
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        alias.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), 0)
    if n != C * S:
        return _build_alias_numpy(r)
    return prob, alias


def write_events_fast(path_pattern: str, header: str, sep: str,
                      precision: int, include_counter: bool,
                      offsets: np.ndarray, mcid: np.ndarray,
                      cols: list[np.ndarray], event_base: int = 0) -> bool:
    """Write per-event particle-list text files with the threaded native
    writer.  Rows must be pre-sorted by event; ``offsets`` has n_events+1
    entries; local event e writes file id ``event_base + e + 1`` (streaming
    chunk exports pass their chunk's first event id).  Returns False (caller
    falls back to the Python writer) when the native library is
    unavailable."""
    lib = _get_lib()
    if lib is None:
        return False
    n_events = len(offsets) - 1
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    mcid = np.ascontiguousarray(mcid, dtype=np.int64)
    cols = [np.ascontiguousarray(c, dtype=np.float64) for c in cols]
    col_ptrs = (ctypes.POINTER(ctypes.c_double) * len(cols))(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for c in cols])
    n = lib.i3d_write_events(
        path_pattern.encode(), header.encode(), sep.encode(),
        precision, int(include_counter), int(event_base), n_events,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        mcid.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        col_ptrs, len(cols))
    if n < 0:
        raise OSError(f"native particle-list write failed for {path_pattern}")
    return True


def write_blocks_fast(path_pattern: str, file_ids, header: str, sep: str,
                      precision: int, offsets: np.ndarray,
                      cols: list[np.ndarray], blank_every: int = 0,
                      blank_tail: int = 1) -> bool:
    """Write per-id block-table text files (the op-1 continuous writers)
    with the threaded native writer: file i = rows
    [offsets[i], offsets[i+1]) of the shared float columns, a blank line
    after every ``blank_every`` rows (``blank_tail``: after the final block
    too), empty ``header`` = no header line.  Returns False (caller falls
    back to the Python writer) when the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return False
    file_ids = np.ascontiguousarray(file_ids, dtype=np.int64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    cols = [np.ascontiguousarray(c, dtype=np.float64) for c in cols]
    col_ptrs = (ctypes.POINTER(ctypes.c_double) * len(cols))(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for c in cols])
    n = lib.i3d_write_blocks(
        path_pattern.encode(), header.encode(), sep.encode(),
        precision, len(file_ids),
        file_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        col_ptrs, len(cols), blank_every, blank_tail)
    if n < 0:
        raise OSError(f"native block-table write failed for {path_pattern}")
    return True


def load_table_fast(path: str | Path) -> np.ndarray:
    """Parse a whitespace-separated numeric table -> (rows, cols) f64 array.

    Uses the threaded native parser when available, numpy.loadtxt otherwise.
    """
    lib = _get_lib()
    path = str(path)
    if lib is None:
        return np.loadtxt(path, dtype=np.float64, ndmin=2)

    n_cols = ctypes.c_longlong(0)
    n_rows = lib.i3d_count_rows(path.encode(), ctypes.byref(n_cols))
    if n_rows <= 0 or n_cols.value <= 0:
        return np.loadtxt(path, dtype=np.float64, ndmin=2)

    capacity = n_rows * n_cols.value
    out = np.empty(capacity, dtype=np.float64)
    n = lib.i3d_parse(path.encode(),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      capacity)
    if n != capacity:
        # ragged or unexpected token count -> robust fallback
        return np.loadtxt(path, dtype=np.float64, ndmin=2)
    return out.reshape(n_rows, n_cols.value)

"""ctypes bindings for the native host data-plane (native/fastpdb.cpp).

Auto-builds the shared library on first use when a toolchain is present;
every entry point has a pure-Python fallback, so the native tier is a
transparent accelerator (parity enforced by tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastpdb.so"))
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.info("native build unavailable (%s); using Python fallback", e)
        return False


def get_lib():
    """The loaded library, or None (pure-Python fallback)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("DDP_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("could not load native lib: %s", e)
        return None

    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_char_p = ctypes.c_char_p
    c_ubyte_p = ctypes.POINTER(ctypes.c_ubyte)

    lib.fastpdb_parse.restype = ctypes.c_int
    lib.fastpdb_parse.argtypes = [
        c_char_p, ctypes.c_int64, ctypes.c_int,
        c_float_p, c_char_p, c_char_p, c_char_p, c_char_p,
        c_int_p, c_char_p, c_ubyte_p, c_float_p, c_float_p, c_int_p,
    ]
    lib.fastsdf_parse.restype = ctypes.c_int
    lib.fastsdf_parse.argtypes = [
        c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        c_float_p, c_char_p, c_int_p, c_int_p, c_int_p,
    ]
    lib.pairwise_min_dist.restype = None
    lib.pairwise_min_dist.argtypes = [
        c_float_p, ctypes.c_int, c_float_p, ctypes.c_int, c_float_p,
    ]
    lib.count_within.restype = ctypes.c_int
    lib.count_within.argtypes = [
        c_float_p, c_float_p, ctypes.c_int, c_float_p, c_float_p, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def parse_pdb_arrays(text: str, max_atoms: int = 200_000):
    """Native PDB parse -> dict of flat arrays, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    coords = np.zeros((max_atoms, 3), np.float32)
    name = np.zeros(max_atoms * 4, np.uint8)
    element = np.zeros(max_atoms * 2, np.uint8)
    chain = np.zeros(max_atoms, np.uint8)
    resname = np.zeros(max_atoms * 3, np.uint8)
    resseq = np.zeros(max_atoms, np.int32)
    icode = np.zeros(max_atoms, np.uint8)
    het = np.zeros(max_atoms, np.uint8)
    occ = np.zeros(max_atoms, np.float32)
    bfac = np.zeros(max_atoms, np.float32)
    serial = np.zeros(max_atoms, np.int32)
    n = lib.fastpdb_parse(
        raw, len(raw), max_atoms, _fp(coords),
        name.ctypes.data_as(ctypes.c_char_p),
        element.ctypes.data_as(ctypes.c_char_p),
        chain.ctypes.data_as(ctypes.c_char_p),
        resname.ctypes.data_as(ctypes.c_char_p),
        _ip(resseq),
        icode.ctypes.data_as(ctypes.c_char_p),
        het.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        _fp(occ), _fp(bfac), _ip(serial),
    )
    if n < 0:
        return None
    return {
        "n": n,
        "coords": coords[:n],
        "name": name[: 4 * n].reshape(n, 4),
        "element": element[: 2 * n].reshape(n, 2),
        "chain": chain[:n],
        "resname": resname[: 3 * n].reshape(n, 3),
        "resseq": resseq[:n],
        "icode": icode[:n],
        "het": het[:n],
        "occ": occ[:n],
        "bfac": bfac[:n],
        "serial": serial[:n],
    }


def parse_sdf_arrays(text: str, max_atoms: int = 4096, max_bonds: int = 8192):
    """Native SDF parse -> (coords, symbols, bonds, charges) or None."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode()
    coords = np.zeros((max_atoms, 3), np.float32)
    symbol = np.zeros(max_atoms * 4, np.uint8)
    bonds = np.zeros((max_bonds, 3), np.int32)
    nb = np.zeros(1, np.int32)
    charges = np.zeros(max_atoms, np.int32)
    na = lib.fastsdf_parse(
        raw, len(raw), max_atoms, max_bonds,
        _fp(coords), symbol.ctypes.data_as(ctypes.c_char_p),
        _ip(bonds), _ip(nb), _ip(charges),
    )
    if na < 0:
        return None
    symbols = [
        bytes(symbol[4 * i : 4 * i + 4]).rstrip(b"\x00").decode() for i in range(na)
    ]
    return coords[:na], symbols, bonds[: int(nb[0])], charges[:na]


def min_dist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-row minimum distance from a [Na,3] to b [Nb,3]."""
    lib = get_lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    if lib is None or len(a) == 0 or len(b) == 0:
        d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
        return d.min(axis=1) if d.size else np.zeros(len(a), np.float32)
    out = np.zeros(len(a), np.float32)
    lib.pairwise_min_dist(_fp(a), len(a), _fp(b), len(b), _fp(out))
    return out


def clash_count(a, ra, b, rb) -> int:
    """Count pairs with |a_i - b_j| < ra_i + rb_j."""
    lib = get_lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    ra = np.ascontiguousarray(ra, np.float32)
    rb = np.ascontiguousarray(rb, np.float32)
    if lib is None:
        d = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
        return int((d < ra[:, None] + rb[None, :]).sum())
    return int(lib.count_within(_fp(a), _fp(ra), len(a), _fp(b), _fp(rb), len(b)))

"""Build + load the native BAM reader shared library.

Compiled lazily on first use with g++ (cached beside the source, keyed by a
source hash); consumers fall back to the pure-Python reader when no
toolchain is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bam_reader.cpp")
_SRC_COV = os.path.join(_DIR, "coverage_kernel.cpp")
_SRC_PACK = os.path.join(_DIR, "pack_kernel.cpp")
_SRC_RANS = os.path.join(_DIR, "rans_kernel.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


class DnBamData(ctypes.Structure):
    _fields_ = [
        ("n_reads", ctypes.c_int64),
        ("tid", ctypes.POINTER(ctypes.c_int32)),
        ("pos", ctypes.POINTER(ctypes.c_int32)),
        ("flag", ctypes.POINTER(ctypes.c_uint16)),
        ("rnext", ctypes.POINTER(ctypes.c_int32)),
        ("nh", ctypes.POINTER(ctypes.c_int32)),
        ("cigar_ops", ctypes.POINTER(ctypes.c_int8)),
        ("cigar_lens", ctypes.POINTER(ctypes.c_int32)),
        ("cigar_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("qnames", ctypes.POINTER(ctypes.c_char)),
        ("qname_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("pair_hash", ctypes.POINTER(ctypes.c_uint64)),
        ("mate_code", ctypes.POINTER(ctypes.c_int8)),
        ("n_refs", ctypes.c_int32),
        ("ref_names", ctypes.POINTER(ctypes.c_char)),
        ("ref_names_bytes", ctypes.c_int64),
        ("ref_lens", ctypes.POINTER(ctypes.c_int32)),
        ("error", ctypes.c_char_p),
    ]


def _so_path() -> str:
    h = hashlib.sha256()
    for src in (_SRC, _SRC_COV, _SRC_PACK, _SRC_RANS):
        with open(src, "rb") as f:
            h.update(f.read())
    return os.path.join(_DIR, f"libdnbam_{h.hexdigest()[:12]}.so")


def get_fn(name: str):
    """The named configured symbol from the native library, or None when
    the library is unavailable (single shared gate for the host-kernel
    wrappers in data/encode.py and data/buckets.py)."""
    lib = load_library()
    return getattr(lib, name, None) if lib is not None else None


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the native library; None on failure."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = _so_path()

        def build() -> bool:
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread", _SRC, _SRC_COV, _SRC_PACK,
                   _SRC_RANS, "-o", so + ".tmp", "-lz"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(so + ".tmp", so)
                # drop stale builds of older source revisions
                for f in os.listdir(_DIR):
                    if (f.startswith("libdnbam_") and f.endswith(".so")
                            and os.path.join(_DIR, f) != so):
                        try:
                            os.remove(os.path.join(_DIR, f))
                        except OSError:
                            pass
                return True
            except Exception:
                return False

        if not os.path.isfile(so) and not build():
            _FAILED = True
            return None
        try:
            try:
                lib = ctypes.CDLL(so)
            except OSError:
                # another process (different source revision) may have
                # cleaned our .so between the isfile check and the load —
                # rebuild once rather than permanently losing the fast path
                if not build():
                    raise
                lib = ctypes.CDLL(so)
            lib.dn_read_bam.restype = ctypes.c_int
            lib.dn_read_bam.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(DnBamData)]
            lib.dn_free_bam.restype = None
            lib.dn_free_bam.argtypes = [ctypes.POINTER(DnBamData)]
            lib.dn_parse_records.restype = ctypes.c_int
            lib.dn_parse_records.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(DnBamData), ctypes.c_int]
            i8 = ctypes.POINTER(ctypes.c_int8)
            i32 = ctypes.POINTER(ctypes.c_int32)
            i64 = ctypes.POINTER(ctypes.c_int64)
            u64 = ctypes.POINTER(ctypes.c_uint64)
            lib.dn_chrom_coverage.restype = ctypes.c_int
            lib.dn_chrom_coverage.argtypes = [
                ctypes.c_int64, i32, i8, i32, i64, i32, i32, u64,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int64, i64, i64, i32,
                ctypes.c_int64, i64, i64, i64,
                ctypes.c_int64, i64, i64,
                i64, i64, i64, i64,
                ctypes.c_int,
            ]
            f32 = ctypes.POINTER(ctypes.c_float)
            f64 = ctypes.POINTER(ctypes.c_double)
            i16 = ctypes.POINTER(ctypes.c_int16)
            u8 = ctypes.POINTER(ctypes.c_uint8)
            lib.dn_f32_int16able.restype = ctypes.c_int
            lib.dn_f32_int16able.argtypes = [f32, ctypes.c_int64]
            lib.dn_f64_int16able.restype = ctypes.c_int
            lib.dn_f64_int16able.argtypes = [f64, ctypes.c_int64]
            lib.dn_int16able_many.restype = ctypes.c_int
            lib.dn_int16able_many.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), i64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int]
            lib.dn_pack_i16.restype = None
            lib.dn_pack_i16.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), i64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                i16, ctypes.c_int]
            lib.dn_nib_encode.restype = ctypes.c_int64
            lib.dn_nib_encode.argtypes = [
                i16, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i16, u8, i64, i32, ctypes.c_int64, ctypes.c_int]
            lib.dn_rans_uncompress.restype = ctypes.c_int64
            lib.dn_rans_uncompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, u8, ctypes.c_int64]
            lib.dn_itf8_scan.restype = ctypes.c_int64
            lib.dn_itf8_scan.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, i32, ctypes.c_int64]
            lib.dn_pair_hash.restype = None
            lib.dn_pair_hash.argtypes = [
                ctypes.c_char_p, i64, i64, ctypes.c_int64, u64, i8]
            _LIB = lib
        except OSError:
            _FAILED = True
    return _LIB

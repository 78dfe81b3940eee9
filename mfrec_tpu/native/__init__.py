'''
Native (C++) host-runtime helpers, loaded via ctypes.

Built on demand with g++ (no pip deps); every entry point has a numpy
fallback so the package works without a compiler.  See
``csrc/mfrec_native.cpp`` for what each helper replaces in the reference.
'''
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, 'csrc', 'mfrec_native.cpp')
_SO = os.path.join(_HERE, '_mfrec_native.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    '''Load (building if needed) the native library; None if unavailable.'''
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.mn_count_rows.restype = ctypes.c_long
            lib.mn_count_rows.argtypes = [ctypes.c_char_p]
            lib.mn_parse_ratings.restype = ctypes.c_long
            lib.mn_parse_ratings.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.int32, flags='C'),
                np.ctypeslib.ndpointer(np.int32, flags='C'),
                np.ctypeslib.ndpointer(np.float32, flags='C'),
                ctypes.c_long]
            lib.mn_counting_sort.restype = ctypes.c_int
            lib.mn_counting_sort.argtypes = [
                np.ctypeslib.ndpointer(np.int32, flags='C'),
                ctypes.c_long, ctypes.c_long,
                np.ctypeslib.ndpointer(np.int64, flags='C')]
            lib.mn_csr_pointers.restype = None
            lib.mn_csr_pointers.argtypes = [
                np.ctypeslib.ndpointer(np.int32, flags='C'),
                ctypes.c_long, ctypes.c_long,
                np.ctypeslib.ndpointer(np.int64, flags='C')]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    return get_lib() is not None


def parse_ratings(path):
    '''Fast text parse of `user item rating [ts]` rows.
    Returns (users, items, vals) or None if the native lib is unavailable.'''
    lib = get_lib()
    if lib is None:
        return None
    n = lib.mn_count_rows(path.encode())
    if n < 0:
        raise IOError('cannot read %s' % path)
    users = np.empty(n, np.int32)
    items = np.empty(n, np.int32)
    vals = np.empty(n, np.float32)
    got = lib.mn_parse_ratings(path.encode(), users, items, vals, n)
    if got < 0:
        raise IOError('parse failure on %s' % path)
    return users[:got], items[:got], vals[:got]


def counting_sort(keys, nkeys):
    '''Stable sort permutation by int32 key; numpy fallback.'''
    keys = np.ascontiguousarray(keys, np.int32)
    lib = get_lib()
    if lib is None:
        return np.argsort(keys, kind='stable').astype(np.int64)
    perm = np.empty(keys.shape[0], np.int64)
    rc = lib.mn_counting_sort(keys, keys.shape[0], int(nkeys), perm)
    if rc != 0:
        # counts allocation failed (huge nkeys / OOM): perm is
        # uninitialized garbage — never consume it
        return np.argsort(keys, kind='stable').astype(np.int64)
    return perm


def csr_pointers(keys, nrows):
    '''Row pointers (bincount + cumsum); numpy fallback.'''
    keys = np.ascontiguousarray(keys, np.int32)
    lib = get_lib()
    if lib is None:
        counts = np.bincount(keys, minlength=nrows)
        ptr = np.zeros(nrows + 1, np.int64)
        np.cumsum(counts, out=ptr[1:])
        return ptr
    ptr = np.empty(nrows + 1, np.int64)
    lib.mn_csr_pointers(keys, keys.shape[0], int(nrows), ptr)
    return ptr

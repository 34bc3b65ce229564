"""Native (C++) host-side ingestion kernels with lazy build + ctypes binding.

The TPU compute path is JAX/Pallas; the host RUNTIME around it — dataset
ingestion in particular — is plain CPU work, and its hot loops (per-pixel
Newton RPC inversion, UTM conversion; SURVEY.md §3.4) live here as a small
C++ library compiled on first use with the system g++.  Everything degrades
gracefully: if g++ is missing, the build fails, or BRDFNERF_NO_NATIVE=1 is
set, callers (geo/rpc.py, geo/geodesy.py) silently keep their float64
NumPy implementations, which remain the source of truth for parity tests.

The shared object is cached next to this file (falling back to a
user-cache dir when the package is read-only) and rebuilt whenever the
.cpp source hash changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "rpc_kernels.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_ABI = 2
# the thread-pooled ingestion loader hits load_library concurrently on
# first use; without the lock, racers either each launch their own g++
# build or observe _TRIED before the winner's _LIB lands (and silently
# take the slow NumPy path for their whole image)
_LOCK = threading.Lock()


def _cpu_tag() -> str:
    """Identity of the CPU the .so was built for: -march=native code must
    never be dlopen'd on a different microarchitecture (SIGILL), so the
    cache name carries a hash of the host's ISA feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha256(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.machine().encode()).hexdigest()[:8]


def _cache_paths():
    """Candidate output paths for the built .so, in preference order."""
    tag = hashlib.sha256(open(_SRC, "rb").read()).hexdigest()[:16]
    name = f"rpc_kernels_{tag}_{_cpu_tag()}_abi{_ABI}.so"
    yield os.path.join(os.path.dirname(__file__), name)
    cache = os.environ.get("XDG_CACHE_HOME",
                           os.path.join(os.path.expanduser("~"), ".cache"))
    yield os.path.join(cache, "brdfnerf_tpu", name)


def _prune_stale(current: str) -> None:
    """Remove superseded rpc_kernels_*.so siblings (old source hash or
    ABI) so build artifacts don't accumulate across edits.  Siblings built
    for a DIFFERENT CPU tag are kept: the per-microarchitecture cache
    naming exists so hosts sharing a cache dir (NFS $HOME) can coexist,
    and pruning them would force both sides to rebuild on every start."""
    import glob
    tag = f"_{_cpu_tag()}_"
    for p in glob.glob(os.path.join(os.path.dirname(current),
                                    "rpc_kernels_*.so")):
        if os.path.abspath(p) != os.path.abspath(current) and tag in p:
            try:
                os.remove(p)
            except OSError:
                pass


def _build(out_path: str) -> bool:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # compile to a temp name then atomically rename: concurrent test
    # workers must never dlopen a half-written .so
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(out_path))
    os.close(fd)
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           "-o", tmp, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            # -march=native can fail on exotic hosts; retry portable
            # (keeps -fopenmp — the kernels' parallelism does not depend
            # on the ISA tuning)
            del cmd[2]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=120)
        if r.returncode != 0:
            if os.environ.get("BRDFNERF_DEBUG"):
                print(f"[native] build failed: {r.stderr[-500:]}",
                      file=sys.stderr)
            return False
        os.replace(tmp, out_path)
        _prune_stale(out_path)
        return True
    except Exception:
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rpc_localization_f64.argtypes = [
        dp, dp, dp, dp, dp, ctypes.c_int64, ctypes.c_int, ctypes.c_double,
        dp, dp]
    lib.rpc_localization_f64.restype = None
    lib.rpc_projection_f64.argtypes = [
        dp, dp, dp, dp, dp, ctypes.c_int64, dp, dp]
    lib.rpc_projection_f64.restype = None
    lib.utm_forward_f64.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, ctypes.c_double, dp, dp]
    lib.utm_forward_f64.restype = None
    lib.ncc_masked_sums_f64.argtypes = [
        dp, ctypes.c_int64, ctypes.c_int64, dp, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int, dp]
    lib.ncc_masked_sums_f64.restype = None
    lib.brdfnerf_native_abi_version.argtypes = []
    lib.brdfnerf_native_abi_version.restype = ctypes.c_int
    return lib


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled kernel library, building it on first call; None when
    native is disabled or unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if _TRIED:
            return _LIB
        try:
            if os.environ.get("BRDFNERF_NO_NATIVE") != "1":
                for path in _cache_paths():
                    try:
                        if not os.path.exists(path) and not _build(path):
                            continue
                        lib = _bind(ctypes.CDLL(path))
                        if lib.brdfnerf_native_abi_version() != _ABI:
                            continue
                        _LIB = lib
                        break
                    except OSError:
                        continue
        finally:
            # published LAST: a concurrent fast-path reader that sees
            # _TRIED must also see the final _LIB
            _TRIED = True
    return _LIB


def available() -> bool:
    return load_library() is not None


DEFAULT_MIN_POINTS = 512  # below this, ctypes overhead ~ the work itself


def usable(n_points: int, min_points: int = DEFAULT_MIN_POINTS):
    """This module when the native library is loadable and the call is big
    enough to be worth dispatching, else None.  The ONE gate every
    dispatch site (geo/rpc.py, geo/registration.py, geo/geodesy.py) goes
    through; callers import this module inside a try so a broken package
    still degrades to NumPy."""
    if n_points < min_points:
        return None
    return sys.modules[__name__] if available() else None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _pack_rpc(rpc) -> tuple:
    """(coeffs(80,), offs_scales(10,)) float64 views of an RPCModel."""
    coeffs = np.concatenate([
        np.asarray(rpc.col_num, np.float64),
        np.asarray(rpc.col_den, np.float64),
        np.asarray(rpc.row_num, np.float64),
        np.asarray(rpc.row_den, np.float64)])
    offs = np.array([
        float(rpc.col_offset), float(rpc.col_scale),
        float(rpc.row_offset), float(rpc.row_scale),
        float(rpc.lon_offset), float(rpc.lon_scale),
        float(rpc.lat_offset), float(rpc.lat_scale),
        float(rpc.alt_offset), float(rpc.alt_scale)], np.float64)
    return coeffs, offs


def localization(rpc, col, row, alt, iters: int = 20, tol: float = 1e-12):
    """Native twin of geo/rpc.localization_np (same Newton rule); caller
    guarantees the library is loaded (use `available()`/`usable()`).
    col/row/alt broadcast mutually, like the NumPy twin."""
    lib = load_library()
    shape = np.broadcast_shapes(np.shape(col), np.shape(row), np.shape(alt))
    col = np.ascontiguousarray(np.broadcast_to(
        np.asarray(col, np.float64), shape))
    row = np.ascontiguousarray(np.broadcast_to(
        np.asarray(row, np.float64), shape))
    alt = np.ascontiguousarray(np.broadcast_to(
        np.asarray(alt, np.float64), shape))
    coeffs, offs = _pack_rpc(rpc)
    lon = np.empty_like(col)
    lat = np.empty_like(col)
    lib.rpc_localization_f64(
        _dptr(coeffs), _dptr(offs), _dptr(col.ravel()), _dptr(row.ravel()),
        _dptr(alt.ravel()), col.size, iters, tol,
        _dptr(lon.ravel()), _dptr(lat.ravel()))
    return lon, lat


def projection(rpc, lon, lat, alt):
    """Native twin of geo/rpc.projection_np."""
    lib = load_library()
    shape = np.broadcast_shapes(np.shape(lon), np.shape(lat), np.shape(alt))
    lon = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lon, np.float64), shape))
    lat = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lat, np.float64), shape))
    alt = np.ascontiguousarray(np.broadcast_to(
        np.asarray(alt, np.float64), shape))
    coeffs, offs = _pack_rpc(rpc)
    col = np.empty_like(lon)
    row = np.empty_like(lon)
    lib.rpc_projection_f64(
        _dptr(coeffs), _dptr(offs), _dptr(lon.ravel()), _dptr(lat.ravel()),
        _dptr(alt.ravel()), lon.size, _dptr(col.ravel()), _dptr(row.ravel()))
    return col, row


def ncc_masked_sums(u: np.ndarray, v: np.ndarray, dx0: int, dy0: int,
                    irange: int) -> np.ndarray:
    """(2*irange+1, 2*irange+1, 6) masked sums over the (dy, dx) shift
    window — native core of geo/registration.search_shift.  Row s // side
    is dy = dy0 - irange + ..., matching the Python scan order."""
    lib = load_library()
    u = np.ascontiguousarray(u, np.float64)
    v = np.ascontiguousarray(v, np.float64)
    side = 2 * irange + 1
    out = np.empty((side, side, 6), np.float64)
    lib.ncc_masked_sums_f64(
        _dptr(u), u.shape[0], u.shape[1], _dptr(v), v.shape[0], v.shape[1],
        int(dx0), int(dy0), int(irange), _dptr(out.ravel()))
    return out


def utm_forward(lats, lons, lon0_rad: float, e: float, k0_a_cap: float,
                alpha, false_northing: float):
    """Native twin of the geo/geodesy.utm_from_latlon series core;
    lats/lons broadcast mutually, like the NumPy twin."""
    lib = load_library()
    shape = np.broadcast_shapes(np.shape(lats), np.shape(lons))
    lats = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lats, np.float64), shape))
    lons = np.ascontiguousarray(np.broadcast_to(
        np.asarray(lons, np.float64), shape))
    alpha = np.ascontiguousarray(alpha, np.float64)
    east = np.empty_like(lats)
    north = np.empty_like(lats)
    lib.utm_forward_f64(
        _dptr(lats.ravel()), _dptr(lons.ravel()), lats.size,
        float(lon0_rad), float(e), float(k0_a_cap), _dptr(alpha),
        float(false_northing), _dptr(east.ravel()), _dptr(north.ravel()))
    return east, north

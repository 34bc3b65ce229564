"""Minimal self-contained GeoTIFF codec (read + write), NumPy only.

The reference delegates raster I/O to rasterio/GDAL (satellite.py:67-80,
eval.py:153-182, sat_utils.py:185-276).  Neither wheel exists in this
image, and the pipeline only needs a narrow slice of TIFF: single- or
multi-band strip images, uint8/uint16/int16/float32/float64, uncompressed
or DEFLATE, plus the three GeoTIFF tags that carry georeferencing
(ModelPixelScale, ModelTiepoint, GeoKeyDirectory with a projected EPSG
code).  That slice is implemented here from the TIFF 6.0 / GeoTIFF 1.1
specs; PIL is used as a pixel-data fallback for exotic compressions.

API (shapes follow rasterio conventions):
  read_geotiff(path)  -> (array (bands, H, W), GeoProfile)
  write_geotiff(path, array, profile)
  GeoProfile: ulx/uly (upper-left corner), xres/yres (yres > 0, applied
  as -yres going down), epsg, nodata.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

# TIFF tag ids
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC = 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFFSETS, _T_TILE_COUNTS = 322, 323, 324, 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE, _T_TIEPOINT = 33550, 33922
_T_GEO_KEYS, _T_GEO_DOUBLES, _T_GEO_ASCII = 34735, 34736, 34737
_T_NODATA = 42113

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}


@dataclass
class GeoProfile:
    width: int = 0
    height: int = 0
    count: int = 1
    dtype: str = "float32"
    ulx: float = 0.0        # upper-left pixel corner X (easting)
    uly: float = 0.0        # upper-left pixel corner Y (northing)
    xres: float = 1.0
    yres: float = 1.0       # positive; row step is -yres
    epsg: Optional[int] = None
    nodata: Optional[float] = None

    @property
    def geotransform(self):
        """GDAL-ordered (ulx, xres, 0, uly, 0, -yres)."""
        return (self.ulx, self.xres, 0.0, self.uly, 0.0, -self.yres)


def utm_epsg(zone: int, northern: bool) -> int:
    return (32600 if northern else 32700) + int(zone)


# ------------------------------------------------------------------- reader

def _read_ifd_entries(buf, off, endian):
    n = struct.unpack(endian + "H", buf[off:off + 2])[0]
    entries = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, count = struct.unpack(endian + "HHI", buf[e:e + 8])
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            raw = buf[e + 8:e + 8 + size]
        else:
            ptr = struct.unpack(endian + "I", buf[e + 8:e + 12])[0]
            raw = buf[ptr:ptr + size]
        if typ in _TYPE_FMT:
            vals = struct.unpack(endian + _TYPE_FMT[typ] * count, raw)
        elif typ == 5:   # RATIONAL
            ints = struct.unpack(endian + "I" * (2 * count), raw)
            vals = tuple(ints[2 * j] / max(ints[2 * j + 1], 1)
                         for j in range(count))
        elif typ == 2:   # ASCII
            vals = (raw.rstrip(b"\0").decode("ascii", "replace"),)
        else:
            vals = (raw,)
        entries[tag] = vals
    next_off = struct.unpack(
        endian + "I", buf[off + 2 + 12 * n:off + 6 + 12 * n])[0]
    return entries, next_off


def _np_dtype(bits: int, fmt: int, endian: str):
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    return np.dtype(f"{endian if endian == '<' else '>'}{kind}{bits // 8}")


def read_geotiff(path: str) -> Tuple[np.ndarray, GeoProfile]:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError(f"{path}: not a TIFF")
    magic, ifd_off = struct.unpack(endian + "HI", buf[2:8])
    if magic == 43:
        raise ValueError(f"{path}: BigTIFF not supported")
    tags, _ = _read_ifd_entries(buf, ifd_off, endian)

    w = tags[_T_WIDTH][0]
    h = tags[_T_HEIGHT][0]
    spp = tags.get(_T_SPP, (1,))[0]
    bits = tags.get(_T_BITS, (8,))[0]
    fmt = tags.get(_T_SAMPLE_FORMAT, (1,))[0]
    comp = tags.get(_T_COMPRESSION, (1,))[0]
    planar = tags.get(_T_PLANAR, (1,))[0]
    predictor = tags.get(_T_PREDICTOR, (1,))[0]
    dt = _np_dtype(bits, fmt, endian)

    if comp in (1, 8, 32946) and _T_STRIP_OFFSETS in tags:
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
        rows_per_strip = tags.get(_T_ROWS_PER_STRIP, (h,))[0]
        chunks = []
        for o, c in zip(offsets, counts):
            raw = buf[o:o + c]
            if comp in (8, 32946):
                raw = zlib.decompress(raw)
            chunks.append(raw)
        data = b"".join(chunks)
        arr = np.frombuffer(data, dtype=dt, count=h * w * spp)
        if planar == 2:
            arr = arr.reshape(spp, h, w)
        else:
            arr = arr.reshape(h, w, spp).transpose(2, 0, 1)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=-1).astype(dt)
        elif predictor == 3:
            raise ValueError(f"{path}: float predictor not supported")
        del rows_per_strip
    else:
        # exotic compression / tiled: PIL fallback (no geo tags lost — we
        # already parsed them from the IFD above)
        from PIL import Image
        img = Image.open(path)
        a = np.asarray(img)
        arr = a[None] if a.ndim == 2 else a.transpose(2, 0, 1)

    prof = GeoProfile(width=w, height=h, count=int(arr.shape[0]),
                      dtype=np.dtype(dt.str[1:]).name)
    if _T_PIXEL_SCALE in tags:
        sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
        prof.xres, prof.yres = float(sx), float(sy)
    if _T_TIEPOINT in tags:
        tp = tags[_T_TIEPOINT]
        # (i, j, k, X, Y, Z): raster point -> model point
        prof.ulx = float(tp[3]) - float(tp[0]) * prof.xres
        prof.uly = float(tp[4]) + float(tp[1]) * prof.yres
    if _T_GEO_KEYS in tags:
        keys = tags[_T_GEO_KEYS]
        n_keys = keys[3]
        for i in range(1, n_keys + 1):
            kid, loc, cnt, val = keys[4 * i:4 * i + 4]
            if kid == 3072 and loc == 0:   # ProjectedCSTypeGeoKey
                prof.epsg = int(val)
            elif kid == 2048 and loc == 0 and prof.epsg is None:
                prof.epsg = int(val)       # GeographicTypeGeoKey
    if _T_NODATA in tags:
        try:
            prof.nodata = float(tags[_T_NODATA][0])
        except (TypeError, ValueError):
            pass
    arr = arr.astype(arr.dtype.newbyteorder("="))
    return arr, prof


# ------------------------------------------------------------------- writer

def _pack_entry(endian, tag, typ, vals, heap, heap_base):
    count = len(vals)
    if typ == 2:   # ASCII: vals is a bytes payload
        payload = vals
        count = len(payload)
    else:
        payload = struct.pack(endian + _TYPE_FMT[typ] * count, *vals)
    if len(payload) <= 4:
        payload = payload.ljust(4, b"\0")
        return struct.pack(endian + "HHI", tag, typ, count) + payload, heap
    ptr = heap_base + len(heap)
    return (struct.pack(endian + "HHII", tag, typ, count, ptr),
            heap + payload.ljust((len(payload) + 1) // 2 * 2, b"\0"))


def write_geotiff(path: str, array: np.ndarray, profile: GeoProfile = None,
                  nodata: Optional[float] = None):
    """Write (bands, H, W) or (H, W) array as an uncompressed GeoTIFF.
    Parent directories are created (src ids may carry path separators,
    e.g. blender frame file_paths like './val/r_0')."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[None]
    bands, h, w = arr.shape
    prof = profile or GeoProfile()
    if nodata is None:
        nodata = prof.nodata

    dt = arr.dtype
    if dt.kind == "f":
        fmt = 3
    elif dt.kind == "i":
        fmt = 2
    else:
        fmt = 1
    bits = dt.itemsize * 8
    endian = "<"
    pix = arr.transpose(1, 2, 0).astype(dt.newbyteorder("<")).tobytes()

    entries = []   # (tag, typ, vals)
    entries.append((_T_WIDTH, 4, (w,)))
    entries.append((_T_HEIGHT, 4, (h,)))
    entries.append((_T_BITS, 3, (bits,) * bands))
    entries.append((_T_COMPRESSION, 3, (1,)))
    entries.append((_T_PHOTOMETRIC, 3, (2 if bands >= 3 else 1,)))
    entries.append((_T_SPP, 3, (bands,)))
    entries.append((_T_ROWS_PER_STRIP, 4, (h,)))
    entries.append((_T_STRIP_COUNTS, 4, (len(pix),)))
    entries.append((_T_PLANAR, 3, (1,)))
    entries.append((_T_SAMPLE_FORMAT, 3, (fmt,) * bands))
    has_geo = prof.xres != 1.0 or prof.ulx != 0.0 or prof.epsg is not None
    if has_geo:
        entries.append((_T_PIXEL_SCALE, 12,
                        (float(prof.xres), float(prof.yres), 0.0)))
        entries.append((_T_TIEPOINT, 12,
                        (0.0, 0.0, 0.0, float(prof.ulx), float(prof.uly), 0.0)))
        epsg = prof.epsg or 32601
        # GTModelTypeGeoKey=1 (projected), GTRasterTypeGeoKey=1 (PixelIsArea),
        # ProjectedCSTypeGeoKey=epsg, ProjLinearUnitsGeoKey=9001 (metre)
        entries.append((_T_GEO_KEYS, 3, (
            1, 1, 0, 4,
            1024, 0, 1, 1,
            1025, 0, 1, 1,
            3072, 0, 1, int(epsg),
            3076, 0, 1, 9001)))
    if nodata is not None:
        nd = (f"{nodata:g}").encode("ascii") + b"\0"
        entries.append((_T_NODATA, 2, nd))
    entries.append((_T_STRIP_OFFSETS, 4, (0,)))   # patched below
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    heap_base = ifd_off + ifd_size
    heap = b""
    packed = []
    strip_entry_idx = None
    for i, (tag, typ, vals) in enumerate(entries):
        if tag == _T_STRIP_OFFSETS:
            strip_entry_idx = i
        b, heap = _pack_entry(endian, tag, typ, vals, heap, heap_base)
        packed.append(b)
    data_off = heap_base + len(heap)
    # patch the strip offset value in place
    b, _ = _pack_entry(endian, _T_STRIP_OFFSETS, 4, (data_off,), b"", 0)
    packed[strip_entry_idx] = b

    with open(path, "wb") as f:
        f.write(struct.pack(endian + "2sHI", b"II", 42, ifd_off))
        f.write(struct.pack(endian + "H", n))
        f.write(b"".join(packed))
        f.write(struct.pack(endian + "I", 0))   # next IFD
        f.write(heap)
        f.write(pix)
    return path

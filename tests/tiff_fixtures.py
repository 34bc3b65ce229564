"""Independent TIFF/RPC fixture encoders for the ingestion conformance kit.

Everything here is written directly from the TIFF 6.0 / GeoTIFF 1.1 /
RPC00B specs and deliberately shares NO code with the framework's codec
(brdfnerf_tpu/utils/geotiff.py): the point of tests/test_conformance.py is
to prove the framework ingests artifacts its OWN writers never produced —
tiled layouts, LZW, both predictors, big-endian files, RPC sidecars —
exactly as third-party toolchains (libtiff/GDAL/rasterio, rpcm) emit them.
PIL(libtiff) and cv2 cover the strip-layout encodings; this module covers
the layouts those wheels cannot write (tiles, MM byte order, float
predictor on multiband data) plus the RPC text/XML sidecar formats.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids (TIFF 6.0 §8)
T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTOMETRIC = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_PREDICTOR = 284, 317
T_TILE_W, T_TILE_H, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325
T_SAMPLE_FORMAT = 339
T_PIXEL_SCALE, T_TIEPOINT, T_GEO_KEYS = 33550, 33922, 34735
T_NODATA, T_RPC = 42113, 50844


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (TIFF 6.0 §13): MSB-first bit packing,
    9->12 bit codes, ClearCode=256, EOI=257, table reset before overflow.
    Width-change timing mirrors libtiff's writer (validated against the
    framework decoder AND by the framework decoder's bit-exact reads of
    PIL/libtiff- and cv2/libtiff-written LZW files)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    nbits = 9

    def emit(code):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << nbits) | code
        bitcnt += nbits
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    nxt = 258
    emit(CLEAR)
    w = b""
    for ch in data:
        c = bytes([ch])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = nxt
        nxt += 1
        if nxt == (1 << nbits) and nbits < 12:
            nbits += 1
        if nxt >= 4093:
            emit(CLEAR)
            table = fresh()
            nxt = 258
            nbits = 9
        w = c
    if w:
        emit(table[w])
    emit(EOI)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def _predict(seg: np.ndarray, predictor: int, endian: str) -> bytes:
    """Apply the TIFF predictor to one (rows, w, spp) segment and return
    the encoded byte stream (row-major, chunky)."""
    dt = seg.dtype
    if predictor == 2:
        d = seg.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        return d.astype(dt.newbyteorder(endian)).tobytes()
    if predictor == 3:
        rows, w, spp = seg.shape
        bps = dt.itemsize
        # TechNote 3: per row, split values into byte planes MSB-first,
        # then horizontal byte differencing over the whole row buffer
        be = seg.astype(dt.newbyteorder(">")).view(np.uint8)
        be = be.reshape(rows, w * spp, bps).transpose(0, 2, 1)   # planes
        rowbytes = np.ascontiguousarray(be).reshape(rows, w * spp * bps)
        d = rowbytes.astype(np.int16)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        return d.astype(np.uint8).tobytes()
    return seg.astype(dt.newbyteorder(endian)).tobytes()


def _compress(raw: bytes, compression: str) -> bytes:
    if compression == "lzw":
        return lzw_encode(raw)
    if compression == "deflate":
        return zlib.compress(raw)
    return raw


def write_tiff_independent(path: str, array: np.ndarray, *,
                           tile=None, rows_per_strip=None,
                           compression: str = "none", predictor: int = 1,
                           endian: str = "<", geo: dict = None,
                           rpc: dict = None, nodata: float = None) -> str:
    """Write (H, W) or (H, W, C) as a chunky TIFF with the requested
    layout/compression/predictor/byte order.  tile=(tw, th) selects a
    tiled layout (tiles padded to full size as the spec requires);
    otherwise strips of `rows_per_strip` rows (default: whole image)."""
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    bps = dt.itemsize
    fmt = {"f": 3, "i": 2, "u": 1}[dt.kind]
    comp_id = {"none": 1, "lzw": 5, "deflate": 8}[compression]

    segments = []
    if tile is not None:
        tw, th = tile
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                pad = np.zeros((th, tw, spp), dtype=dt)
                y0, x0 = ty * th, tx * tw
                ny, nx = min(th, h - y0), min(tw, w - x0)
                pad[:ny, :nx] = arr[y0:y0 + ny, x0:x0 + nx]
                segments.append(_compress(_predict(pad, predictor, endian),
                                          compression))
    else:
        rps = rows_per_strip or h
        for y0 in range(0, h, rps):
            seg = arr[y0:y0 + rps]
            segments.append(_compress(_predict(seg, predictor, endian),
                                      compression))

    entries = [
        (T_WIDTH, 4, (w,)), (T_HEIGHT, 4, (h,)),
        (T_BITS, 3, (bps * 8,) * spp),
        (T_COMPRESSION, 3, (comp_id,)),
        (T_PHOTOMETRIC, 3, (2 if spp >= 3 else 1,)),
        (T_SPP, 3, (spp,)),
        (T_PLANAR, 3, (1,)),
        (T_SAMPLE_FORMAT, 3, (fmt,) * spp),
    ]
    if predictor != 1:
        entries.append((T_PREDICTOR, 3, (predictor,)))
    n_segs = len(segments)
    if tile is not None:
        entries += [(T_TILE_W, 4, (tile[0],)), (T_TILE_H, 4, (tile[1],)),
                    (T_TILE_OFFSETS, 4, (0,) * n_segs),
                    (T_TILE_COUNTS, 4, tuple(len(s) for s in segments))]
    else:
        entries += [(T_ROWS_PER_STRIP, 4, (rows_per_strip or h,)),
                    (T_STRIP_OFFSETS, 4, (0,) * n_segs),
                    (T_STRIP_COUNTS, 4, tuple(len(s) for s in segments))]
    if geo:
        entries.append((T_PIXEL_SCALE, 12,
                        (float(geo["xres"]), float(geo["yres"]), 0.0)))
        entries.append((T_TIEPOINT, 12,
                        (0.0, 0.0, 0.0, float(geo["ulx"]),
                         float(geo["uly"]), 0.0)))
        entries.append((T_GEO_KEYS, 3,
                        (1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1,
                         3072, 0, 1, int(geo["epsg"]))))
    if nodata is not None:
        entries.append((T_NODATA, 2, (f"{nodata:g}").encode() + b"\0"))
    if rpc is not None:
        vals = ([0.0, 0.0, rpc["row_offset"], rpc["col_offset"],
                 rpc["lat_offset"], rpc["lon_offset"], rpc["alt_offset"],
                 rpc["row_scale"], rpc["col_scale"], rpc["lat_scale"],
                 rpc["lon_scale"], rpc["alt_scale"]]
                + list(rpc["row_num"]) + list(rpc["row_den"])
                + list(rpc["col_num"]) + list(rpc["col_den"]))
        entries.append((T_RPC, 12, tuple(float(v) for v in vals)))
    entries.sort(key=lambda e: e[0])

    type_fmt = {3: "H", 4: "I", 12: "d", 2: "s"}
    type_size = {3: 2, 4: 4, 12: 8, 2: 1}

    n = len(entries)
    ifd_off = 8
    heap_base = ifd_off + 2 + 12 * n + 4
    heap = b""
    seg_tag = T_TILE_OFFSETS if tile is not None else T_STRIP_OFFSETS

    def pack(tag, typ, vals, heap):
        if typ == 2:
            payload = vals if isinstance(vals, bytes) else vals[0]
            count = len(payload)
        else:
            count = len(vals)
            payload = struct.pack(endian + type_fmt[typ] * count, *vals)
        if len(payload) <= 4:
            return (struct.pack(endian + "HHI", tag, typ, count)
                    + payload.ljust(4, b"\0"), heap)
        ptr = heap_base + len(heap)
        return (struct.pack(endian + "HHII", tag, typ, count, ptr),
                heap + payload.ljust((len(payload) + 1) // 2 * 2, b"\0"))

    # two passes: first to size the heap, then with real segment offsets
    for attempt in range(2):
        heap = b""
        packed = []
        for tag, typ, vals in entries:
            b, heap = pack(tag, typ, vals, heap)
            packed.append(b)
        data_off = heap_base + len(heap)
        offs = []
        pos = data_off
        for s in segments:
            offs.append(pos)
            pos += len(s) + (len(s) & 1)
        entries = [(t, ty, tuple(offs) if t == seg_tag else v)
                   for (t, ty, v) in entries]
    with open(path, "wb") as f:
        f.write(struct.pack(endian + "2sHI",
                            b"II" if endian == "<" else b"MM", 42, ifd_off))
        f.write(struct.pack(endian + "H", n) + b"".join(packed))
        f.write(struct.pack(endian + "I", 0))
        f.write(heap)
        for s in segments:
            f.write(s + (b"\0" if len(s) & 1 else b""))
    return path


def write_bigtiff_stub(path: str) -> str:
    """A minimal structurally-valid BigTIFF header (version 43, 8-byte
    offsets, empty IFD) — parses as BigTIFF with zero tags."""
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16))
        f.write(struct.pack("<QQ", 0, 0))   # 0-entry IFD8, no next
    return path


def write_bigtiff_nonstandard_offsets(path: str) -> str:
    """A BigTIFF header claiming 4-byte offsets — invalid per the BigTIFF
    note (offset size must be 8); the framework must reject it with a
    clear message."""
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16))
        f.write(struct.pack("<QQ", 0, 0))
    return path


def write_bigtiff_independent(path: str, array: np.ndarray, *,
                              rows_per_strip=None,
                              compression: str = "none",
                              endian: str = "<", geo: dict = None) -> str:
    """Write (H, W) or (H, W, C) as a chunky BigTIFF (magic 43, 8-byte
    offsets, 20-byte IFD entries — TIFF Technical Note: BigTIFF), strip
    layout, optionally DEFLATE-compressed, either byte order.  Strip
    offsets/counts use type LONG8 (16) as GDAL's BIGTIFF=YES output does,
    so the 8-byte-value parsing path is genuinely exercised."""
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, spp = arr.shape
    dt = arr.dtype
    bps = dt.itemsize
    fmt = {"f": 3, "i": 2, "u": 1}[dt.kind]

    segments = []
    rps = rows_per_strip or h
    for y0 in range(0, h, rps):
        raw = arr[y0:y0 + rps].astype(dt.newbyteorder(endian)).tobytes()
        segments.append(_compress(raw, compression))

    comp_id = {"none": 1, "deflate": 8}[compression]
    entries = [
        (T_WIDTH, 4, (w,)), (T_HEIGHT, 4, (h,)),
        (T_BITS, 3, (bps * 8,) * spp),
        (T_COMPRESSION, 3, (comp_id,)),
        (T_PHOTOMETRIC, 3, (2 if spp >= 3 else 1,)),
        (T_STRIP_OFFSETS, 16, (0,) * len(segments)),   # patched in pass 2
        (T_SPP, 3, (spp,)),
        (T_ROWS_PER_STRIP, 4, (rps,)),
        (T_STRIP_COUNTS, 16, tuple(len(s) for s in segments)),
        (T_PLANAR, 3, (1,)),
        (T_SAMPLE_FORMAT, 3, (fmt,) * spp),
    ]
    if geo:
        entries.append((T_PIXEL_SCALE, 12,
                        (float(geo["xres"]), float(geo["yres"]), 0.0)))
        entries.append((T_TIEPOINT, 12,
                        (0.0, 0.0, 0.0, float(geo["ulx"]),
                         float(geo["uly"]), 0.0)))
        entries.append((T_GEO_KEYS, 3,
                        (1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1,
                         3072, 0, 1, int(geo["epsg"]))))
    entries.sort(key=lambda e: e[0])

    type_fmt = {3: "H", 4: "I", 12: "d", 16: "Q"}
    n = len(entries)
    ifd_off = 16
    heap_base = ifd_off + 8 + 20 * n + 8

    def pack(tag, typ, vals, heap):
        count = len(vals)
        payload = struct.pack(endian + type_fmt[typ] * count, *vals)
        if len(payload) <= 8:
            return (struct.pack(endian + "HHQ", tag, typ, count)
                    + payload.ljust(8, b"\0"), heap)
        ptr = heap_base + len(heap)
        return (struct.pack(endian + "HHQQ", tag, typ, count, ptr),
                heap + payload.ljust((len(payload) + 1) // 2 * 2, b"\0"))

    for _attempt in range(2):            # pass 1 sizes the heap
        heap = b""
        packed = []
        for tag, typ, vals in entries:
            b, heap = pack(tag, typ, vals, heap)
            packed.append(b)
        data_off = heap_base + len(heap)
        offs, pos = [], data_off
        for s in segments:
            offs.append(pos)
            pos += len(s) + (len(s) & 1)
        entries = [(t, ty, tuple(offs) if t == T_STRIP_OFFSETS else v)
                   for (t, ty, v) in entries]
    with open(path, "wb") as f:
        f.write(struct.pack(endian + "2sHHHQ",
                            b"II" if endian == "<" else b"MM",
                            43, 8, 0, ifd_off))
        f.write(struct.pack(endian + "Q", n) + b"".join(packed))
        f.write(struct.pack(endian + "Q", 0))
        f.write(heap)
        for s in segments:
            f.write(s + (b"\0" if len(s) & 1 else b""))
    return path


# ------------------------------------------------------- RPC sidecar formats

_RPC00B_ORDER = [
    ("LINE_OFF", "row_offset", "pixels"), ("SAMP_OFF", "col_offset", "pixels"),
    ("LAT_OFF", "lat_offset", "degrees"), ("LONG_OFF", "lon_offset", "degrees"),
    ("HEIGHT_OFF", "alt_offset", "meters"),
    ("LINE_SCALE", "row_scale", "pixels"), ("SAMP_SCALE", "col_scale", "pixels"),
    ("LAT_SCALE", "lat_scale", "degrees"), ("LONG_SCALE", "lon_scale", "degrees"),
    ("HEIGHT_SCALE", "alt_scale", "meters"),
]
_COEFF_ORDER = [("LINE_NUM_COEFF", "row_num"), ("LINE_DEN_COEFF", "row_den"),
                ("SAMP_NUM_COEFF", "col_num"), ("SAMP_DEN_COEFF", "col_den")]


def write_rpc00b_sidecar(path: str, d: dict) -> str:
    """Emit the `_RPC.TXT` vendor sidecar format (IKONOS/WorldView style:
    `LINE_OFF: +002486.00 pixels`, 1-based coefficient suffixes)."""
    lines = []
    for field, key, unit in _RPC00B_ORDER:
        lines.append(f"{field}: {d[key]:+015.6f} {unit}")
    for field, key in _COEFF_ORDER:
        for j, v in enumerate(d[key], start=1):
            lines.append(f"{field}_{j}: {v:+.12E}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_dimap_rpc_xml(path: str, d: dict) -> str:
    """Emit a Pléiades DIMAP v2 style RPC XML: Inverse_Model coefficients
    (ground->image) + RFM_Validity offsets/scales, with the product's
    1-BASED pixel convention (LINE_OFF/SAMP_OFF carry +1 vs the 0-based
    dict, as real DIMAP products do)."""
    co = []
    for field, key in _COEFF_ORDER:
        for j, v in enumerate(d[key], start=1):
            co.append(f"      <{field}_{j}>{v:.15E}</{field}_{j}>")
    va = []
    for field, key, _ in _RPC00B_ORDER:
        v = float(d[key])
        if field in ("LINE_OFF", "SAMP_OFF"):
            v += 1.0
        va.append(f"      <{field}>{v:.12f}</{field}>")
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Dimap_Document>\n'
        '  <Rational_Function_Model>\n'
        '    <Global_RFM>\n'
        '    <Inverse_Model>\n' + "\n".join(co) + '\n'
        '    </Inverse_Model>\n'
        '    <RFM_Validity>\n' + "\n".join(va) + '\n'
        '    </RFM_Validity>\n'
        '    </Global_RFM>\n'
        '  </Rational_Function_Model>\n'
        '</Dimap_Document>\n')
    with open(path, "w") as f:
        f.write(xml)
    return path


# --------------------------------------------- independent RPC00B evaluator

def rpc00b_project_literal(d: dict, lon, lat, alt):
    """Ground -> image through the LITERAL RPC00B term table (STDI-0002
    appendix E / rpcm apply_poly order), written out monomial by monomial
    with the spec's variable names (L = normalized longitude, P =
    normalized latitude, H = normalized height) as an independent oracle
    for the framework's GEMM-based evaluator."""
    L = (np.asarray(lon, np.float64) - d["lon_offset"]) / d["lon_scale"]
    P = (np.asarray(lat, np.float64) - d["lat_offset"]) / d["lat_scale"]
    H = (np.asarray(alt, np.float64) - d["alt_offset"]) / d["alt_scale"]

    def poly(c):
        c = [float(x) for x in c]
        return (c[0] + c[1] * L + c[2] * P + c[3] * H
                + c[4] * L * P + c[5] * L * H + c[6] * P * H
                + c[7] * L * L + c[8] * P * P + c[9] * H * H
                + c[10] * P * L * H
                + c[11] * L ** 3 + c[12] * L * P * P + c[13] * L * H * H
                + c[14] * L * L * P + c[15] * P ** 3 + c[16] * P * H * H
                + c[17] * L * L * H + c[18] * P * P * H + c[19] * H ** 3)

    r = poly(d["row_num"]) / poly(d["row_den"])
    c = poly(d["col_num"]) / poly(d["col_den"])
    return (c * d["col_scale"] + d["col_offset"],
            r * d["row_scale"] + d["row_offset"])


def make_pleiades_like_rpc(seed: int = 0) -> dict:
    """A full-strength 20-term RPC fitted to a rigorous perspective
    satellite camera over a Pléiades-like footprint (700 km orbit, ~12°
    off-nadir, 0.7 m GSD, 2000-point lon/lat/alt grid), in float64.

    This is how vendor RPCs are produced (least-squares fit of the
    rational polynomials to the rigorous sensor model), so unlike the
    affine test RPCs every coefficient — including the denominators and
    all cubic cross terms — is non-trivially exercised.  Fit residual vs
    the rigorous camera is < 1e-6 px across the validity volume."""
    lat0, lon0, alt0 = 48.2, 11.5, 500.0
    lat_scale, lon_scale, alt_scale = 0.02, 0.03, 600.0
    re = 6378137.0

    def ecef(lon, lat, alt):
        f = 1.0 / 298.257223563
        e2 = f * (2 - f)
        lam, phi = np.radians(lon), np.radians(lat)
        n = re / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        return np.stack([(n + alt) * np.cos(phi) * np.cos(lam),
                         (n + alt) * np.cos(phi) * np.sin(lam),
                         (n * (1 - e2) + alt) * np.sin(phi)], -1)

    center = ecef(lon0, lat0, alt0)
    up = center / np.linalg.norm(center)
    # satellite 700 km up, displaced ~150 km horizontally (off-nadir)
    east = np.cross([0.0, 0.0, 1.0], up)
    east /= np.linalg.norm(east)
    north = np.cross(up, east)
    sat = center + 700e3 * up + 120e3 * east + 90e3 * north
    boresight = (center - sat) / np.linalg.norm(center - sat)
    cam_x = np.cross(boresight, up)
    cam_x /= np.linalg.norm(cam_x)
    cam_y = np.cross(boresight, cam_x)
    focal_px = 1.0e6   # ~0.7 m GSD from 714 km slant range

    def project_rigorous(lon, lat, alt):
        p = ecef(lon, lat, alt) - sat
        zc = p @ boresight
        return (focal_px * (p @ cam_x) / zc + 10000.0,
                focal_px * (p @ cam_y) / zc + 10000.0)

    rng = np.random.RandomState(seed)
    nl = rng.uniform(-1, 1, 4000)
    np_ = rng.uniform(-1, 1, 4000)
    nh = rng.uniform(-1, 1, 4000)
    lon = lon0 + nl * lon_scale
    lat = lat0 + np_ * lat_scale
    alt = alt0 + nh * alt_scale
    col, row = project_rigorous(lon, lat, alt)
    col_off, col_scl = 10000.0, 12000.0
    row_off, row_scl = 10000.0, 12000.0
    ncol = (col - col_off) / col_scl
    nrow = (row - row_off) / row_scl

    # design matrix in the RPC00B term order (L=nlon, P=nlat, H=nalt)
    L, P, H = nl, np_, nh
    M = np.stack([np.ones_like(L), L, P, H, L * P, L * H, P * H,
                  L * L, P * P, H * H, P * L * H, L ** 3, L * P * P,
                  L * H * H, L * L * P, P ** 3, P * H * H, L * L * H,
                  P * P * H, H ** 3], axis=-1)

    def fit(target):
        # solve [num - target*den] = 0 with den[0] fixed to 1
        A = np.concatenate([M, -target[:, None] * M[:, 1:]], axis=1)
        coef, *_ = np.linalg.lstsq(A, target, rcond=None)
        num = coef[:20]
        den = np.concatenate([[1.0], coef[20:]])
        return num, den

    col_num, col_den = fit(ncol)
    row_num, row_den = fit(nrow)
    return {
        "row_offset": row_off, "col_offset": col_off,
        "lat_offset": lat0, "lon_offset": lon0, "alt_offset": alt0,
        "row_scale": row_scl, "col_scale": col_scl,
        "lat_scale": lat_scale, "lon_scale": lon_scale,
        "alt_scale": alt_scale,
        "row_num": row_num.tolist(), "row_den": row_den.tolist(),
        "col_num": col_num.tolist(), "col_den": col_den.tolist(),
        "_rigorous": project_rigorous,
    }

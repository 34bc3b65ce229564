"""Ingestion conformance against THIRD-PARTY-ENCODED artifacts.

Every other test round-trips artifacts through the framework's own
writers; this suite proves the readers on the encodings real toolchains
produce — the reference's defining property is that it runs on real
rasterio/GDAL/rpcm/MicMac outputs (satellite.py:67-80,
satellite_rgb_dep.py:419-427, generate_dataset.py:152-163):

  * GeoTIFFs from PIL/libtiff (LZW, deflate, PackBits, predictors 2 and
    3) and cv2/libtiff (float32 LZW) — genuinely third-party encoders
  * layouts those wheels cannot write, from an INDEPENDENT spec-based
    encoder (tests/tiff_fixtures.py): tiled, big-endian, multiband float
    predictor — i.e. what GDAL-written Pléiades crops look like
  * BigTIFFs (8-byte offsets, LONG8 strip tables) decoded natively and
    checked against their classic twins; malformed variants fail typed
  * multi-IFD (overview-bearing) files returning the full-res IFD 0,
    JPEG-in-TIFF through the typed PIL fallback, uint16 multiband
    through the --scale per-channel mode
  * a full-strength RPC00B coefficient set fitted to a rigorous
    perspective satellite camera, with golden values from a literal
    spec-term oracle, plus the vendor sidecar formats (_RPC.TXT text,
    DIMAP v2 XML, GeoTIFF tag 50844) all agreeing
  * MicMac triplets with real-world formatting quirks parsed with exact
    np.loadtxt semantics (the reference's parser), end-to-end through
    SatelliteDataset
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from tiff_fixtures import (  # noqa: E402
    make_pleiades_like_rpc, rpc00b_project_literal, write_bigtiff_stub,
    write_dimap_rpc_xml, write_rpc00b_sidecar, write_tiff_independent)

from brdfnerf_tpu.utils.geotiff import read_geotiff, write_geotiff, GeoProfile  # noqa: E402
from brdfnerf_tpu.geo import rpc as rpc_mod  # noqa: E402


# --------------------------------------------------------------- PIL / cv2

def _pil_variants(tmp_path, rng):
    from PIL import Image
    a8 = rng.randint(0, 255, (96, 130, 3), np.uint8)
    a16 = rng.randint(0, 4096, (96, 130), np.uint16).astype(np.uint16)
    f32 = (rng.rand(96, 130).astype(np.float32) * 400 - 200)
    cases = []
    p = str(tmp_path / "pil_lzw_rgb.tif")
    Image.fromarray(a8).save(p, compression="tiff_lzw")
    cases.append((p, a8))
    p = str(tmp_path / "pil_lzw_pred2_u16.tif")
    Image.fromarray(a16).save(p, compression="tiff_lzw", tiffinfo={317: 2})
    cases.append((p, a16[..., None]))
    p = str(tmp_path / "pil_deflate_pred2_rgb.tif")
    Image.fromarray(a8).save(p, compression="tiff_adobe_deflate",
                             tiffinfo={317: 2})
    cases.append((p, a8))
    p = str(tmp_path / "pil_packbits.tif")
    Image.fromarray(a8).save(p, compression="packbits")
    cases.append((p, a8))
    p = str(tmp_path / "pil_f32_pred3.tif")
    Image.fromarray(f32, mode="F").save(p, compression="tiff_adobe_deflate",
                                        tiffinfo={317: 3})
    cases.append((p, f32[..., None]))
    return cases


def test_pil_libtiff_encodings(tmp_path):
    """PIL/libtiff-written strips: LZW, deflate, PackBits, both
    predictors — decoded bit-exactly by the native reader (no PIL
    fallback: the fallback path would be exercised only for compressions
    outside the native slice)."""
    rng = np.random.RandomState(0)
    for path, expect in _pil_variants(tmp_path, rng):
        arr, prof = read_geotiff(path)
        got = arr.transpose(1, 2, 0)
        assert got.shape == expect.shape, path
        assert np.array_equal(got, expect), path


def test_cv2_libtiff_float_lzw(tmp_path):
    import cv2
    rng = np.random.RandomState(1)
    f = rng.rand(64, 80).astype(np.float32) * 1000
    p = str(tmp_path / "cv2_f32_lzw.tif")
    assert cv2.imwrite(p, f, [cv2.IMWRITE_TIFF_COMPRESSION, 5])
    arr, _ = read_geotiff(p)
    assert np.array_equal(arr[0], f)


# ------------------------------------------------- independent-encoder set

@pytest.mark.parametrize("case", [
    dict(dtype="uint16", shape=(130, 210), tile=(64, 48),
         compression="lzw", predictor=2),
    dict(dtype="uint8", shape=(77, 50, 3), tile=(32, 32),
         compression="deflate", predictor=2),
    dict(dtype="float32", shape=(100, 90, 3), tile=(32, 32),
         compression="deflate", predictor=3),
    dict(dtype="float32", shape=(60, 61), tile=(16, 16),
         compression="none", predictor=1),
    dict(dtype="uint8", shape=(77, 50, 3), rows_per_strip=16,
         compression="lzw", predictor=1, endian=">"),
    dict(dtype="uint16", shape=(90, 40), rows_per_strip=13,
         compression="lzw", predictor=2, endian=">"),
    dict(dtype="float64", shape=(40, 30), rows_per_strip=7,
         compression="deflate", predictor=3),
    dict(dtype="int16", shape=(50, 33), rows_per_strip=9,
         compression="deflate", predictor=2),
])
def test_independent_encoder_layouts(tmp_path, case):
    """Tiled / big-endian / float-predictor layouts (what GDAL writes for
    real Pléiades crops and DSMs) decode bit-exactly."""
    rng = np.random.RandomState(42)
    dt = np.dtype(case["dtype"])
    shape = case["shape"]
    if dt.kind == "f":
        a = (rng.rand(*shape) * 500 - 250).astype(dt)
    else:
        info = np.iinfo(dt)
        a = rng.randint(max(info.min, -2000), min(info.max, 4000),
                        shape).astype(dt)
    p = str(tmp_path / "x.tif")
    write_tiff_independent(
        p, a, tile=case.get("tile"), rows_per_strip=case.get("rows_per_strip"),
        compression=case["compression"], predictor=case["predictor"],
        endian=case.get("endian", "<"))
    arr, _ = read_geotiff(p)
    got = arr.transpose(1, 2, 0)
    expect = a if a.ndim == 3 else a[..., None]
    assert got.dtype == expect.dtype
    assert np.array_equal(got, expect)


def test_geo_tags_from_independent_encoder(tmp_path):
    rng = np.random.RandomState(2)
    a = rng.randint(0, 255, (20, 30), np.uint8)
    p = str(tmp_path / "geo.tif")
    write_tiff_independent(
        p, a, compression="lzw", endian=">",
        geo=dict(xres=0.5, yres=0.5, ulx=399000.0, uly=5300000.0,
                 epsg=32632), nodata=-9999)
    arr, prof = read_geotiff(p)
    assert prof.epsg == 32632
    assert prof.ulx == 399000.0 and prof.uly == 5300000.0
    assert prof.xres == 0.5 and prof.nodata == -9999.0


@pytest.mark.parametrize("case", [
    dict(dtype="float32", shape=(40, 55), compression="none"),
    dict(dtype="uint16", shape=(33, 47, 3), compression="deflate",
         rows_per_strip=9),
    dict(dtype="uint8", shape=(21, 30, 3), compression="none", endian=">"),
])
def test_bigtiff_reads_native(tmp_path, case):
    """BigTIFF (magic 43, 8-byte offsets, LONG8 strip offsets/counts —
    what GDAL emits for Pléiades mosaics over 4 GB with BIGTIFF=YES)
    decodes bit-exactly with geo tags intact, matching the classic twin
    of the same pixels."""
    rng = np.random.RandomState(7)
    dt = np.dtype(case["dtype"])
    shape = case["shape"]
    if dt.kind == "f":
        a = (rng.rand(*shape) * 500 - 250).astype(dt)
    else:
        a = rng.randint(0, min(np.iinfo(dt).max, 4000), shape).astype(dt)
    geo = dict(xres=0.5, yres=0.5, ulx=399000.0, uly=5300000.0, epsg=32632)
    from tiff_fixtures import write_bigtiff_independent
    pb = write_bigtiff_independent(
        str(tmp_path / "big.tif"), a,
        rows_per_strip=case.get("rows_per_strip"),
        compression=case["compression"], endian=case.get("endian", "<"),
        geo=geo)
    pc = write_tiff_independent(
        str(tmp_path / "classic.tif"), a,
        rows_per_strip=case.get("rows_per_strip"),
        compression=case["compression"], endian=case.get("endian", "<"),
        geo=geo)
    arr_b, prof_b = read_geotiff(pb)
    arr_c, prof_c = read_geotiff(pc)
    assert np.array_equal(arr_b, arr_c)
    assert (prof_b.epsg, prof_b.ulx, prof_b.uly, prof_b.xres) == \
           (prof_c.epsg, prof_c.ulx, prof_c.uly, prof_c.xres) == \
           (32632, 399000.0, 5300000.0, 0.5)


def test_bigtiff_empty_and_malformed(tmp_path):
    """A 0-tag BigTIFF parses as BigTIFF but has no raster (KeyError on
    ImageWidth is acceptable — it IS malformed); a BigTIFF claiming a
    non-8 offset size must fail with a clear typed message."""
    from tiff_fixtures import write_bigtiff_nonstandard_offsets
    p = write_bigtiff_stub(str(tmp_path / "big.tif"))
    with pytest.raises((ValueError, KeyError)):
        read_geotiff(p)
    p2 = write_bigtiff_nonstandard_offsets(str(tmp_path / "big4.tif"))
    with pytest.raises(ValueError, match="offset size"):
        read_geotiff(p2)


def test_overview_bearing_file_reads_full_res(tmp_path):
    """Multi-IFD files (GDAL .ovr-embedded overviews append reduced
    rasters as later IFDs): the reader must return IFD 0 — the full-
    resolution image — and ignore the overviews."""
    from PIL import Image
    rng = np.random.RandomState(3)
    full = rng.randint(0, 255, (64, 96, 3), np.uint8)
    im = Image.fromarray(full)
    ov1 = im.resize((48, 32))
    ov2 = im.resize((24, 16))
    p = str(tmp_path / "ovr.tif")
    im.save(p, save_all=True, append_images=[ov1, ov2])
    arr, prof = read_geotiff(p)
    assert (prof.height, prof.width) == (64, 96)
    assert np.array_equal(arr.transpose(1, 2, 0), full)


def test_jpeg_in_tiff_decodes_or_types(tmp_path):
    """JPEG-compressed TIFF (compression 7 — common in delivered
    Pléiades quicklooks): outside the native slice, so it must route
    through the PIL fallback and decode to within JPEG loss, or fail
    with the typed UnsupportedTiffFeature taxonomy — never a bare
    KeyError/struct error."""
    from PIL import Image
    # smooth gradient so JPEG loss stays tiny
    y, x = np.mgrid[0:64, 0:96]
    a = np.stack([(x * 2) % 256, (y * 3) % 256, ((x + y)) % 256],
                 -1).astype(np.uint8)
    p = str(tmp_path / "jpg.tif")
    try:
        Image.fromarray(a).save(p, compression="jpeg", quality=95)
    except OSError:
        pytest.skip("PIL lacks libtiff JPEG write support here")
    arr, prof = read_geotiff(p)
    assert arr.shape == (3, 64, 96)
    assert float(np.mean(np.abs(arr.transpose(1, 2, 0).astype(np.int32)
                                - a.astype(np.int32)))) < 8.0


def test_uint16_multiband_per_channel_scale(tmp_path):
    """A uint16 3-band product (WorldView-style radiometry) through the
    --scale per-channel minmax mode (scale < 0, satellite_rgb_dep.py:
    87-105): each channel lands exactly on [0, 1] regardless of its raw
    dynamic range."""
    from brdfnerf_tpu.data.satellite import load_rgb
    rng = np.random.RandomState(5)
    bands = [rng.randint(120, 890, (40, 50)).astype(np.uint16),
             rng.randint(1000, 2047, (40, 50)).astype(np.uint16),
             rng.randint(0, 65535, (40, 50)).astype(np.uint16)]
    a = np.stack(bands, -1)
    p = str(tmp_path / "u16rgb.tif")
    write_tiff_independent(p, a, compression="deflate", predictor=2)
    img = load_rgb(p, scale=-1.0)                 # per-channel minmax
    img = img.reshape(40, 50, 3)
    for c in range(3):
        assert img[..., c].min() == 0.0 and img[..., c].max() == 1.0
        # monotone per-channel mapping preserves ordering
        flat_raw = a[..., c].ravel().astype(np.float64)
        flat_img = img[..., c].ravel().astype(np.float64)
        i, j = np.argmin(flat_raw), np.argmax(flat_raw)
        assert flat_img[i] == 0.0 and flat_img[j] == 1.0
        expect = (flat_raw - flat_raw.min()) / (flat_raw.max()
                                                - flat_raw.min())
        np.testing.assert_allclose(flat_img, expect, atol=1e-6)


def test_non_tiff_fails(tmp_path):
    p = tmp_path / "notatiff.tif"
    p.write_bytes(b"PNG whatever")
    with pytest.raises(ValueError, match="not a TIFF"):
        read_geotiff(str(p))


def test_corrupt_strip_surfaces_decode_error(tmp_path):
    """A structurally valid TIFF whose compressed strip data is corrupt
    must surface the native decode error, NOT be silently re-tried
    through the PIL fallback (which would replace the actionable error
    with an unrelated PIL one).  Only UnsupportedTiffFeature — a valid
    file using a compression outside the native slice — may fall back."""
    from PIL import Image

    from brdfnerf_tpu.utils.geotiff import UnsupportedTiffFeature

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 16), dtype=np.uint8)
    p = str(tmp_path / "corrupt.tif")
    Image.fromarray(img).save(p, compression="tiff_adobe_deflate")
    buf = bytearray(open(p, "rb").read())
    # garble 4 bytes inside the deflate strip (any in-stream corruption
    # trips zlib's adler32 data check); the stream starts at the zlib
    # 0x78 header byte, which follows the TIFF header/IFD
    idx = bytes(buf).rfind(b"\x78")
    assert idx > 8
    buf[idx:idx + 4] = b"\x00\x00\x00\x00"
    open(p, "wb").write(bytes(buf))
    with pytest.raises(Exception) as ei:
        read_geotiff(p)
    assert not isinstance(ei.value, UnsupportedTiffFeature)
    # the error is the native one (zlib/buffer), not a PIL failure
    assert "PIL" not in type(ei.value).__module__


# ------------------------------------------------------------- RPC golden

@pytest.fixture(scope="module")
def pleiades_rpc():
    d = make_pleiades_like_rpc()
    rigorous = d.pop("_rigorous")
    return d, rigorous


def test_rpc00b_forward_matches_literal_oracle(pleiades_rpc):
    """The framework's GEMM-based RPC evaluation must agree with a
    literal monomial-by-monomial expansion of the RPC00B term table
    (independent oracle) to float64 exactness, on a full-strength
    (all-40-denominator-terms) coefficient set."""
    d, rigorous = pleiades_rpc
    rng = np.random.RandomState(3)
    lon = d["lon_offset"] + rng.uniform(-1, 1, 300) * d["lon_scale"]
    lat = d["lat_offset"] + rng.uniform(-1, 1, 300) * d["lat_scale"]
    alt = d["alt_offset"] + rng.uniform(-1, 1, 300) * d["alt_scale"]
    c_lit, r_lit = rpc00b_project_literal(d, lon, lat, alt)
    m = rpc_mod.rpc_from_dict(d)
    c_fw, r_fw = rpc_mod.projection_np(m, lon, lat, alt)
    assert np.max(np.abs(c_fw - c_lit)) < 1e-9
    assert np.max(np.abs(r_fw - r_lit)) < 1e-9
    # and the fit itself reproduces the rigorous perspective camera
    c_rig, r_rig = rigorous(lon, lat, alt)
    assert np.max(np.abs(c_lit - c_rig)) < 1e-5      # px
    assert np.max(np.abs(r_lit - r_rig)) < 1e-5


def test_rpc00b_newton_inverse_roundtrip(pleiades_rpc):
    """localization_np must invert the full-strength RPC to far below a
    pixel (the convention-drift failure VERDICT flagged would show up
    here as a systematic offset)."""
    d, _ = pleiades_rpc
    m = rpc_mod.rpc_from_dict(d)
    rng = np.random.RandomState(4)
    lon = d["lon_offset"] + rng.uniform(-0.9, 0.9, 200) * d["lon_scale"]
    lat = d["lat_offset"] + rng.uniform(-0.9, 0.9, 200) * d["lat_scale"]
    alt = d["alt_offset"] + rng.uniform(-0.9, 0.9, 200) * d["alt_scale"]
    col, row = rpc_mod.projection_np(m, lon, lat, alt)
    lon2, lat2 = rpc_mod.localization_np(m, col, row, alt)
    # degrees; 1e-9 deg ~ 0.1 mm on the ground
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    col2, row2 = rpc_mod.projection_np(m, lon2, lat2, alt)
    assert np.max(np.abs(col2 - col)) < 1e-6         # sub-micropixel
    assert np.max(np.abs(row2 - row)) < 1e-6


def test_rpc_sidecar_text_format(tmp_path, pleiades_rpc):
    """_RPC.TXT vendor sidecar (IKONOS/WorldView style) parses to the
    same model: projections agree to the text format's printed precision."""
    d, _ = pleiades_rpc
    p = write_rpc00b_sidecar(str(tmp_path / "IMG_RPC.TXT"), d)
    with open(p) as f:
        parsed = rpc_mod.rpc_dict_from_rpc00b_text(f.read())
    for k in ("row_offset", "col_offset", "lat_offset", "lon_offset",
              "alt_offset", "row_scale", "col_scale", "lat_scale",
              "lon_scale", "alt_scale"):
        assert abs(parsed[k] - d[k]) < 1e-6, k
    m0 = rpc_mod.rpc_from_dict(d)
    m1 = rpc_mod.rpc_from_dict(parsed)
    rng = np.random.RandomState(5)
    lon = d["lon_offset"] + rng.uniform(-1, 1, 50) * d["lon_scale"]
    lat = d["lat_offset"] + rng.uniform(-1, 1, 50) * d["lat_scale"]
    alt = d["alt_offset"] + rng.uniform(-1, 1, 50) * d["alt_scale"]
    c0, r0 = rpc_mod.projection_np(m0, lon, lat, alt)
    c1, r1 = rpc_mod.projection_np(m1, lon, lat, alt)
    assert np.max(np.abs(c0 - c1)) < 1e-3            # sidecar prints 12 sig figs
    assert np.max(np.abs(r0 - r1)) < 1e-3


def test_rpc_sidecar_tolerates_formatting(tmp_path):
    """Real sidecars vary in case, spacing, and field order."""
    d = make_pleiades_like_rpc()
    d.pop("_rigorous")
    p = write_rpc00b_sidecar(str(tmp_path / "r.txt"), d)
    with open(p) as f:
        lines = f.read().splitlines()
    # shuffle, lowercase half the keys, add noise lines and blank lines
    rng = np.random.RandomState(6)
    rng.shuffle(lines)
    mangled = ["# vendor header", ""]
    for i, ln in enumerate(lines):
        if i % 2:
            k, _, v = ln.partition(":")
            ln = k.lower() + " :\t" + v
        mangled.append(ln)
    mangled.append("ERR_BIAS: 0.5 meters")
    parsed = rpc_mod.rpc_dict_from_rpc00b_text("\r\n".join(mangled))
    with open(p) as f:
        ref = rpc_mod.rpc_dict_from_rpc00b_text(f.read())
    for k, v in ref.items():
        assert np.allclose(parsed[k], v), k


def test_rpc_sidecar_missing_fields_raise():
    with pytest.raises(ValueError, match="missing"):
        rpc_mod.rpc_dict_from_rpc00b_text("LINE_OFF: 10 pixels\n")


def test_rpc_dimap_xml(tmp_path, pleiades_rpc):
    """DIMAP v2 RPC XML (Pléiades vendor format, 1-based pixel indices)
    parses to the 0-based model used everywhere else."""
    d, _ = pleiades_rpc
    p = write_dimap_rpc_xml(str(tmp_path / "RPC_PHR1A.XML"), d)
    parsed = rpc_mod.rpc_dict_from_dimap_xml(p)
    for k in d:
        assert np.allclose(parsed[k], d[k], atol=1e-9), k


def test_rpc_geotiff_tag(tmp_path, pleiades_rpc):
    """Tag 50844 in a GeoTIFF (what rpcm.rpc_from_geotiff reads in
    generate_dataset.py:152-163): independent encoder -> framework
    reader, and framework writer -> tags-only reader."""
    d, _ = pleiades_rpc
    rng = np.random.RandomState(7)
    a = rng.randint(0, 255, (16, 16, 3), np.uint8)
    p1 = str(tmp_path / "ind_rpc.tif")
    write_tiff_independent(p1, a, compression="lzw", rpc=d)
    arr, prof = read_geotiff(p1)
    assert prof.rpc is not None
    for k in d:
        assert np.allclose(prof.rpc[k], d[k]), k
    assert np.allclose(rpc_mod.rpc_dict_from_geotiff(p1)["row_num"],
                       d["row_num"])
    p2 = str(tmp_path / "fw_rpc.tif")
    write_geotiff(p2, a.transpose(2, 0, 1), GeoProfile(rpc=d))
    got = rpc_mod.rpc_dict_from_geotiff(p2)
    for k in d:
        assert np.allclose(got[k], d[k]), k
    # a plain tiff has no tag
    p3 = str(tmp_path / "norpc.tif")
    write_tiff_independent(p3, a)
    with pytest.raises(ValueError, match="no RPC"):
        rpc_mod.rpc_dict_from_geotiff(p3)


# ------------------------------------------------------------- MicMac quirks

def _canonical_micmac(depth_dir, img_id, rng, n=40, w=16):
    os.makedirs(depth_dir, exist_ok=True)
    cols = rng.randint(0, w, n)
    rows = rng.randint(0, w, n)
    pts2d = np.stack([cols, rows], -1)
    pts3d = np.stack([399000 + rng.rand(n) * 50,
                      5300000 + rng.rand(n) * 50,
                      500 + rng.rand(n) * 20], -1)
    correl = rng.rand(n)
    np.savetxt(os.path.join(depth_dir, img_id + "_2DPts.txt"), pts2d,
               fmt="%d")
    np.savetxt(os.path.join(depth_dir, img_id + "_3DPts.txt"), pts3d)
    np.savetxt(os.path.join(depth_dir, img_id + "_Correl.txt"), correl)
    return pts2d, pts3d, correl


def _quirky_micmac(depth_dir, img_id, pts2d, pts3d, correl):
    """The same values with real-world txt quirks: CRLF endings, ragged
    whitespace/tabs, trailing blank lines, multiple pairs per line (the
    reference reshape(-1, 2) semantics — np.loadtxt still requires a
    CONSISTENT column count, so the grouping must divide the total),
    mixed fixed/exponent notation."""
    os.makedirs(depth_dir, exist_ok=True)
    # 2D: several ints per line (grouped points), tabs, trailing blanks, CRLF
    flat = pts2d.ravel()
    group2 = 4 if len(flat) % 4 == 0 else 2
    lines = []
    for i in range(0, len(flat), group2):
        chunk = flat[i:i + group2]
        lines.append("\t " + "\t\t".join(str(v) for v in chunk) + "  ")
    with open(os.path.join(depth_dir, img_id + "_2DPts.txt"), "wb") as f:
        f.write(("\r\n".join(lines) + "\r\n\r\n   \r\n").encode())
    # 3D: mixed notation, leading spaces
    lines = []
    for p in pts3d:
        lines.append(f"   {p[0]:.10f}  {p[1]:.15E}   {p[2]:.17g}")
    with open(os.path.join(depth_dir, img_id + "_3DPts.txt"), "w") as f:
        f.write("\n".join(lines) + "\n\n")
    # correl: several per line
    c = [f"{v:.16E}" for v in correl]
    group = 5 if len(c) % 5 == 0 else 1
    lines = ["  ".join(c[i:i + group]) for i in range(0, len(c), group)]
    with open(os.path.join(depth_dir, img_id + "_Correl.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_micmac_quirky_files_parse_identically(tmp_path):
    from brdfnerf_tpu.data.satellite import load_depth_files
    rng = np.random.RandomState(8)
    d_can = str(tmp_path / "canon")
    d_qrk = str(tmp_path / "quirk")
    pts2d, pts3d, correl = _canonical_micmac(d_can, "img_00", rng)
    _quirky_micmac(d_qrk, "img_00", pts2d, pts3d, correl)
    a2, a3, ac = load_depth_files(d_can, "img_00")
    b2, b3, bc = load_depth_files(d_qrk, "img_00")
    assert np.array_equal(a2, b2)
    assert np.allclose(a3, b3, rtol=0, atol=1e-6)
    assert np.allclose(ac, bc, rtol=0, atol=1e-12)
    assert np.array_equal(a2, pts2d)


# --------------------------------------------- end-to-end dataset ingestion

def test_satellite_dataset_ingests_third_party_encodings(tmp_path):
    """Full SatelliteDataset ingestion where every raster artifact was
    re-encoded by a third-party/independent encoder (PIL LZW strips for
    one image, tiled-LZW-predictor for another, tiled masks) and the
    MicMac triplets carry the formatting quirks: the train store must be
    IDENTICAL to the one built from the framework-written originals."""
    from PIL import Image
    from synth_aoi import build_aoi
    from brdfnerf_tpu.data.satellite import SatelliteConfig, SatelliteDataset

    root_a = str(tmp_path / "orig")
    build_aoi(root_a, n_train=2, n_test=1)
    cfg_a = SatelliteConfig(root_dir=root_a, aoi_id="synth")
    ds_a = SatelliteDataset(cfg_a, split="train")

    # clone the dataset dir, re-encoding rasters with foreign encoders
    import shutil
    root_b = str(tmp_path / "reenc")
    shutil.copytree(root_a, root_b)
    os.remove(os.path.join(root_b, "scene.loc"))   # force recompute
    tifs = sorted(f for f in os.listdir(root_b) if f.endswith(".tif"))
    for i, name in enumerate(tifs):
        arr, prof = read_geotiff(os.path.join(root_b, name))
        img = arr.transpose(1, 2, 0)
        path = os.path.join(root_b, name)
        if i % 2 == 0 and img.dtype == np.uint8 and img.shape[-1] in (1, 3):
            pil = img[..., 0] if img.shape[-1] == 1 else img
            Image.fromarray(pil).save(path, compression="tiff_lzw",
                                      tiffinfo={317: 2})
        else:
            write_tiff_independent(path, img, tile=(16, 16),
                                   compression="lzw",
                                   predictor=2 if img.dtype.kind in "ui" else 3,
                                   endian=">" if i % 3 else "<")
    # quirk-ify the MicMac triplets (values unchanged)
    ddir = os.path.join(root_b, "DenseDepth_ZM4")
    from brdfnerf_tpu.data.satellite import load_depth_files
    for jf in sorted(f for f in os.listdir(root_b) if f.endswith(".json")):
        img_id = os.path.splitext(json.load(
            open(os.path.join(root_b, jf)))["img"])[0]
        try:
            p2, p3, cr = load_depth_files(ddir, img_id)
        except OSError:
            continue
        _quirky_micmac(ddir, img_id, p2, p3, cr)

    cfg_b = SatelliteConfig(root_dir=root_b, aoi_id="synth")
    ds_b = SatelliteDataset(cfg_b, split="train")

    assert set(ds_a.store) == set(ds_b.store)
    for k in ds_a.store:
        a, b = ds_a.store[k], ds_b.store[k]
        assert a.shape == b.shape, k
        assert np.allclose(a, b, atol=1e-5), \
            f"{k}: max|d|={np.max(np.abs(a - b))}"

    # and the val image renders from the re-encoded rasters too
    val_b = SatelliteDataset(cfg_b, split="val")
    item = val_b.get_image(0)
    assert np.isfinite(item["rays"]).all()

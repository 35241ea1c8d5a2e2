"""Binary-layer tests for the pure-Python GeoTIFF reader/writer
(geodata_spark/geotiff.py) and the un-gated S7/S10 raster paths.

The codecs are pinned two ways: hand-packed known-answer bytes (the
LZW 9-bit MSB-first stream and the Apple PackBits spec example) so
the wire format matches the published spec, not just our own dual
implementation; and large round-trips that force LZW code-width
growth through 10/11/12 bits and a CLEAR reissue.
"""

import numpy as np
import pytest

from geodata_spark import geotiff as gt


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def test_lzw_known_answer():
    # codes for "ABABABA": CLEAR(256) 'A'(65) 'B'(66) AB(258) ABA(260)
    # EOI(257), all 9-bit, MSB-first, zero-padded to a byte boundary
    enc = gt.lzw_encode(b"ABABABA")
    assert enc == bytes([0x80, 0x10, 0x48, 0x50, 0x28, 0x24, 0x04])
    assert gt.lzw_decode(enc) == b"ABABABA"


@pytest.mark.parametrize(
    "blob",
    [
        np.random.RandomState(0).randint(0, 8, 200_000).astype(np.uint8).tobytes(),
        bytes(range(256)) * 600,   # width growth to 12 bits + CLEAR reissue
        b"\x00" * 50_000,          # long single-symbol runs
        b"",                       # empty strip
        b"\xff",                   # single byte
    ],
    ids=["random", "cycle", "zeros", "empty", "one"],
)
def test_lzw_roundtrip(blob):
    assert gt.lzw_decode(gt.lzw_encode(blob)) == blob


def test_lzw_early_change_boundary():
    """Exactly pin the 9→10-bit switch: with all-distinct 2-byte
    pairs the table adds one entry per emitted code, so the code
    emitted after entry 511 is added must be 10 bits — a 1-bit
    misalignment scrambles everything after byte ~285."""
    blob = bytes(
        b for i in range(0, 1 << 16, 7) for b in (i & 0xFF, (i >> 8) & 0xFF)
    )
    assert gt.lzw_decode(gt.lzw_encode(blob)) == blob


def test_packbits_known_answer():
    # the Apple PackBits specification example
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = (
        b"\xaa\xaa\xaa\x80\x00\x2a" + b"\xaa" * 4
        + b"\x80\x00\x2a\x22" + b"\xaa" * 10
    )
    assert gt.packbits_decode(enc) == want
    assert gt.packbits_decode(gt.packbits_encode(want)) == want


def test_packbits_roundtrip_mixed():
    rng = np.random.RandomState(1)
    blob = b"".join(
        bytes([rng.randint(0, 4)]) * rng.randint(1, 200) for _ in range(100)
    )
    assert gt.packbits_decode(gt.packbits_encode(blob)) == blob


# ---------------------------------------------------------------------------
# file round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dt,pred", [
    ("u1", 1), ("u2", 2), ("i2", 1), ("i4", 2), ("u4", 1), ("f4", 1), ("f8", 1),
])
@pytest.mark.parametrize("comp", [1, 8, 5, 32773])
def test_roundtrip_dtypes_compressions(tmp_path, dt, pred, comp):
    rng = np.random.RandomState(42)
    a = (rng.randint(0, 1000, (13, 17)) % 256).astype(dt)
    p = str(tmp_path / "t.tif")
    gt.write_geotiff(p, a, -10.0, 55.0, 0.5, 0.25, compression=comp,
                     predictor=pred, rows_per_strip=4, nodata=7.0)
    r = gt.read_tiff(p)
    assert np.array_equal(r["array"], a)
    assert r["transform"] == (-10.0, 0.5, 55.0, 0.25)
    assert r["nodata"] == 7.0
    assert r["geokeys"].get(2048) == 4326  # GeographicTypeGeoKey


@pytest.mark.parametrize("big", [False, True], ids=["classic", "bigtiff"])
@pytest.mark.parametrize("bo", ["<", ">"], ids=["II", "MM"])
def test_roundtrip_byteorder_and_bigtiff(tmp_path, big, bo):
    a = np.arange(12 * 9, dtype="u2").reshape(12, 9)
    p = str(tmp_path / "t.tif")
    gt.write_geotiff(p, a, 3.0, 48.0, 0.1, 0.1, compression=8,
                     rows_per_strip=5, big=big, byteorder=bo)
    r = gt.read_tiff(p)
    assert np.array_equal(r["array"], a)
    assert r["transform"] == (3.0, 0.1, 48.0, 0.1)


def test_roundtrip_tiled_with_edge_padding(tmp_path):
    rng = np.random.RandomState(7)
    a = rng.standard_normal((30, 21)).astype("f4")  # 21 % 16 != 0
    p = str(tmp_path / "t.tif")
    gt.write_geotiff(p, a, 0.0, 10.0, 1.0, 1.0, compression=5, tile=(8, 16))
    r = gt.read_tiff(p)
    assert np.array_equal(r["array"], a)


def test_model_transformation_tag(tmp_path):
    a = np.ones((4, 5), dtype="u1")
    p = str(tmp_path / "t.tif")
    gt.write_geotiff(p, a, -1.5, 2.5, 0.25, 0.5, compression=1,
                     transform_tag=True)
    r = gt.read_tiff(p)
    assert r["transform"] == (-1.5, 0.25, 2.5, 0.5)


def test_unsupported_features_raise(tmp_path):
    p = str(tmp_path / "t.tif")
    with open(p, "wb") as f:
        f.write(b"GARBAGE!")
    with pytest.raises(gt.UnsupportedTiff):
        gt.read_tiff(p)
    # float predictor is rejected by the writer too
    with pytest.raises(ValueError):
        gt.write_geotiff(p, np.ones((2, 2), dtype="f4"), 0, 0, 1, 1,
                         predictor=2)


# ---------------------------------------------------------------------------
# S7 / S10 Spark integration (gate removed round 7)
# ---------------------------------------------------------------------------

def test_read_geotiff_ungated(spark, tmp_path):
    """sources.read_geotiff reads a real .tif with no rasterio: same
    rows as raster_to_table on the same array, nodata mapped to 0
    (reference mask.py:936-965 semantics)."""
    from geodata_spark import sources

    rng = np.random.RandomState(3)
    north_up = rng.randint(1, 50, (6, 8)).astype("f8")
    north_up[2, 3] = 99.0  # nodata sentinel
    p = str(tmp_path / "era_mask.tif")
    # top edge y0 = 52.0, 0.5-degree cells, 6 rows → bottom edge 49.0
    gt.write_geotiff(p, north_up, 10.0, 52.0, 0.25, 0.5, compression=8,
                     nodata=99.0)
    got = sources.read_geotiff(spark, p, layer="m").toPandas().sort_values(
        ["y_idx", "x_idx"]
    )
    expect = np.where(north_up == 99.0, 0.0, north_up)[::-1]
    assert np.array_equal(
        got["value"].to_numpy().reshape(6, 8), expect
    )
    sub = got[(got.y_idx == 0) & (got.x_idx == 0)].iloc[0]
    assert sub.lat == 49.0 and sub.lon == 10.0  # bottom-left anchor
    assert got.lat.max() == 49.0 + 0.5 * 5


def test_geotiff_sink_roundtrip(spark, tmp_path):
    """S10 write_geotiff_raster → S7 read_geotiff round-trips the
    long-table raster bit-exactly (dyadic values)."""
    from geodata_spark import sources

    rng = np.random.RandomState(9)
    arr = (rng.randint(0, 64, (5, 7)) / 16.0).astype("f8")
    df = sources.raster_to_table(spark, arr, 40.0, -3.0, 0.25, 0.5, layer="x")
    p = str(tmp_path / "sink.tif")
    sources.write_geotiff_raster(df, p, 5, 7, 40.0, -3.0, 0.25, 0.5,
                                 compression=5)
    back = sources.read_geotiff(spark, p).toPandas().sort_values(
        ["y_idx", "x_idx"]
    )
    assert np.array_equal(back["value"].to_numpy().reshape(5, 7), arr)
    assert back.lat.min() == 40.0 and back.lon.min() == -3.0

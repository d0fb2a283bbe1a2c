"""Image codec round-trips (ref model: bevy_image's ktx2/dds/hdr/exr
loaders). Synthetic files are encoded in-test (no binary fixtures) and
decoded by bevy_tpu.image."""

import struct
import zlib

import numpy as np
import pytest

from bevy_tpu.image import load_exr, load_hdr, load_ktx2


def _write_hdr(path, rgb, rle=False):
    """Minimal Radiance writer (flat scanlines)."""
    h, w = rgb.shape[:2]
    m = rgb.max(-1)
    e = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32))) + 1,
                 0).astype(np.int32)
    scale = np.where(m > 1e-32, np.ldexp(1.0, -e + 8), 0.0)
    mant = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe = np.concatenate(
        [mant, np.where(m > 1e-32, e + 128, 0)[..., None]], -1
    ).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def test_hdr_roundtrip(tmp_path):
    rgb = np.array([[[1.0, 0.5, 0.25], [8.0, 4.0, 2.0]],
                    [[0.0, 0.0, 0.0], [100.0, 50.0, 25.0]]], np.float32)
    p = tmp_path / "t.hdr"
    _write_hdr(p, rgb)
    out = load_hdr(p)
    assert out.shape == (2, 2, 3)
    # RGBE is ~1% precise
    nz = rgb > 0
    assert np.abs(out[nz] / rgb[nz] - 1.0).max() < 0.02
    assert out[1, 0].max() == 0.0


def _attr(name, typ, payload):
    return name.encode() + b"\0" + typ.encode() + b"\0" + \
        struct.pack("<i", len(payload)) + payload


def _write_exr(path, img, compression=0):
    """Minimal scanline EXR writer, FLOAT channels R/G/B."""
    h, w = img.shape[:2]
    chnames = ["B", "G", "R"]       # alphabetical, as EXR stores them
    chl = b""
    for nm in chnames:
        chl += nm.encode() + b"\0" + struct.pack("<iBBBBii", 2, 0, 0, 0,
                                                 0, 1, 1)
    chl += b"\0"
    hdr = b""
    hdr += _attr("channels", "chlist", chl)
    hdr += _attr("compression", "compression", bytes([compression]))
    hdr += _attr("dataWindow", "box2i",
                 struct.pack("<iiii", 0, 0, w - 1, h - 1))
    hdr += _attr("displayWindow", "box2i",
                 struct.pack("<iiii", 0, 0, w - 1, h - 1))
    hdr += _attr("lineOrder", "lineOrder", b"\0")
    hdr += _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    hdr += _attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
    hdr += _attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    hdr += b"\0"
    chunks = []
    ci = {"R": 0, "G": 1, "B": 2}
    for y in range(h):
        raw = b""
        for nm in chnames:
            raw += img[y, :, ci[nm]].astype(np.float32).tobytes()
        if compression == 2:
            # inverse of the loader's reconstruct: interleave then
            # delta-encode then zlib
            b = np.frombuffer(raw, np.uint8)
            half = (len(b) + 1) // 2
            inter = np.concatenate([b[0::2], b[1::2]]).astype(np.int16)
            d = inter.copy()
            d[1:] = (inter[1:] - inter[:-1] + 128) % 256
            comp_b = zlib.compress(d.astype(np.uint8).tobytes())
            raw = comp_b if len(comp_b) < len(raw) else raw
        chunks.append((y, raw))
    base = 8 + len(hdr) + 8 * len(chunks)
    offsets = []
    pos = base
    for y, raw in chunks:
        offsets.append(pos)
        pos += 8 + len(raw)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", 20000630, 2))
        f.write(hdr)
        for o in offsets:
            f.write(struct.pack("<Q", o))
        for y, raw in chunks:
            f.write(struct.pack("<ii", y, len(raw)))
            f.write(raw)


@pytest.mark.parametrize("compression", [0, 2])
def test_exr_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 10, (4, 5, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    _write_exr(p, img, compression)
    out = load_exr(p)
    assert out.shape == (4, 5, 3)
    np.testing.assert_allclose(out, img, rtol=1e-6)


def _write_ktx2(path, rgba, zstd=False):
    h, w = rgba.shape[:2]
    payload = rgba.tobytes()
    ulen = len(payload)
    if zstd:
        import zstandard
        payload = zstandard.ZstdCompressor().compress(payload)
    head = b"\xabKTX 20\xbb\r\n\x1a\n"
    head += struct.pack("<9I", 37, 1, w, h, 0, 0, 1, 1, 2 if zstd else 0)
    head += struct.pack("<4I", 0, 0, 0, 0)       # dfd/kvd index
    head += struct.pack("<2Q", 0, 0)             # sgd index
    lvl_off = len(head) + 24
    head += struct.pack("<3Q", lvl_off, len(payload), ulen)
    with open(path, "wb") as f:
        f.write(head + payload)


@pytest.mark.parametrize("zstd", [False, True])
def test_ktx2_roundtrip(tmp_path, zstd):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (6, 4, 4), dtype=np.uint8)
    p = tmp_path / "t.ktx2"
    _write_ktx2(p, img, zstd)
    out = load_ktx2(p)
    np.testing.assert_array_equal(out, img)


def test_ktx2_basis_rejected(tmp_path):
    head = b"\xabKTX 20\xbb\r\n\x1a\n" + \
        struct.pack("<9I", 0, 1, 4, 4, 0, 0, 1, 1, 1)   # scheme 1 = BasisLZ
    head += struct.pack("<4I", 0, 0, 0, 0) + struct.pack("<2Q", 0, 0)
    head += struct.pack("<3Q", 104, 0, 0)
    p = tmp_path / "b.ktx2"
    p.write_bytes(head)
    with pytest.raises(ValueError, match="supercompression"):
        load_ktx2(p)


def test_dds_via_pil(tmp_path):
    # PIL writes uncompressed DDS; decode path is shared with BC formats
    from PIL import Image

    from bevy_tpu.image import load_dds
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 255
    p = tmp_path / "t.dds"
    Image.fromarray(img).save(p)
    out = load_dds(p)
    np.testing.assert_array_equal(out, img)

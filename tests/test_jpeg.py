"""JPEG codec: baseline + progressive encoder<->decoder roundtrips plus
hand-assembled streams that exercise decoder paths the minimal encoders
never emit (4:2:0 chroma subsampling, DRI/RSTn restart intervals, error
paths). Progressive coverage: spectral-selection bands, DC+AC successive
approximation refinement, EOB runs, ZRL in refinement, restart markers,
non-interleaved partial-MCU block geometry."""

import struct

import numpy as np
import pytest

from hyperdx_spark.pipeline import codecs


def test_flat_gray_roundtrip():
    img = np.full((16, 24), 77, np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - 77).max() <= 1


def test_smooth_gray_roundtrip():
    y, x = np.mgrid[0:40, 0:56]
    img = (128 + 60 * np.sin(x / 9.0) * np.cos(y / 7.0)).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(img))
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 3 and err.max() < 30


def test_rgb_roundtrip_and_odd_dims():
    y, x = np.mgrid[0:37, 0:51]
    base = (128 + 50 * np.cos(x / 8.0 + y / 11.0)).astype(np.uint8)
    rgb = np.stack([base, np.roll(base, 5, 0), 255 - base], axis=-1)
    out = codecs.decode_jpeg(codecs.encode_jpeg(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(float) - rgb.astype(float)).mean() < 5


def _seg(marker, body):
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dc_only_block(writer, enc_dc, enc_ac, dc, pred):
    diff = dc - pred
    n = abs(diff).bit_length()
    code, length = enc_dc[n]
    writer.write(code, length)
    if n:
        writer.write(diff if diff > 0 else diff + (1 << n) - 1, n)
    code, length = enc_ac[0x00]  # EOB
    writer.write(code, length)


def _flat_jpeg_420(yv, cbv, crv):
    """One-MCU 16x16 4:2:0 colour JPEG with flat planes, built by hand."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(codecs._QT_LUMA[codecs._ZIGZAG].astype(np.uint8)))
    out += _seg(0xDB, bytes([1]) + bytes(codecs._QT_CHROMA[codecs._ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    sof += bytes([1, 0x22, 0])  # Y: 2x2 sampling
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += _seg(0xC0, sof)
    for tc, th, (bits, values) in (
        (0, 0, codecs._HT_DC_LUMA), (1, 0, codecs._HT_AC_LUMA),
        (0, 1, codecs._HT_DC_CHROMA), (1, 1, codecs._HT_AC_CHROMA),
    ):
        out += _seg(0xC4, bytes([(tc << 4) | th] + bits) + bytes(values))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    # flat plane value v -> DC coefficient round((v-128)*8 / q[0])
    dcy = round((yv - 128) * 8 / codecs._QT_LUMA[0])
    dcc_b = round((cbv - 128) * 8 / codecs._QT_CHROMA[0])
    dcc_r = round((crv - 128) * 8 / codecs._QT_CHROMA[0])
    w = codecs._BitWriter()
    ydc = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    yac = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    cdc = codecs._huff_encode_table(*codecs._HT_DC_CHROMA)
    cac = codecs._huff_encode_table(*codecs._HT_AC_CHROMA)
    pred = 0
    for _ in range(4):  # 4 luma blocks in the MCU
        _dc_only_block(w, ydc, yac, dcy, pred)
        pred = dcy
    _dc_only_block(w, cdc, cac, dcc_b, 0)
    _dc_only_block(w, cdc, cac, dcc_r, 0)
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_420_chroma_subsampling_hand_built():
    data = _flat_jpeg_420(180, 100, 160)
    out = codecs.decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    # expected RGB from the flat YCbCr values (quantization-tolerant)
    yq = round((180 - 128) * 8 / codecs._QT_LUMA[0]) * codecs._QT_LUMA[0] / 8 + 128
    cbq = round((100 - 128) * 8 / codecs._QT_CHROMA[0]) * codecs._QT_CHROMA[0] / 8 + 128
    crq = round((160 - 128) * 8 / codecs._QT_CHROMA[0]) * codecs._QT_CHROMA[0] / 8 + 128
    exp = np.array([
        yq + 1.402 * (crq - 128),
        yq - 0.344136 * (cbq - 128) - 0.714136 * (crq - 128),
        yq + 1.772 * (cbq - 128),
    ])
    got = out[8, 8].astype(float)
    assert np.abs(got - np.clip(exp, 0, 255)).max() <= 2.0
    # flatness: every pixel identical per channel
    assert (out == out[0, 0]).all()


def _flat_jpeg_gray_restart(v0, v1):
    """Two-MCU 8x16 grayscale JPEG with DRI=1 and an RST0 between MCUs —
    the DC predictor must reset, so block 2's diff is from 0, not block 1."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(codecs._QT_LUMA[codecs._ZIGZAG].astype(np.uint8)))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    for tc, th, (bits, values) in ((0, 0, codecs._HT_DC_LUMA), (1, 0, codecs._HT_AC_LUMA)):
        out += _seg(0xC4, bytes([(tc << 4) | th] + bits) + bytes(values))
    out += _seg(0xDD, struct.pack(">H", 1))  # DRI = 1 MCU
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    dc0 = round((v0 - 128) * 8 / codecs._QT_LUMA[0])
    dc1 = round((v1 - 128) * 8 / codecs._QT_LUMA[0])
    ydc = codecs._huff_encode_table(*codecs._HT_DC_LUMA)
    yac = codecs._huff_encode_table(*codecs._HT_AC_LUMA)
    w = codecs._BitWriter()
    _dc_only_block(w, ydc, yac, dc0, 0)
    out += w.flush()
    out += b"\xff\xd0"  # RST0
    w = codecs._BitWriter()
    _dc_only_block(w, ydc, yac, dc1, 0)  # predictor reset -> diff from 0
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_restart_interval_resets_dc_predictor():
    data = _flat_jpeg_gray_restart(200, 64)
    out = codecs.decode_jpeg(data)
    assert out.shape == (8, 16)
    left, right = float(out[4, 3]), float(out[4, 12])
    assert abs(left - 200) <= 3 and abs(right - 64) <= 3


def test_lossless_rejected():
    img = np.full((8, 8), 10, np.uint8)
    data = bytearray(codecs.encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # pretend SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF0.*SOF2|supported"):
        codecs.decode_jpeg(bytes(data))
    assert codecs.jpeg_profile(bytes(data)) == "sof3"


def test_sniff_and_decode_image_route():
    img = np.full((9, 11), 130, np.uint8)
    data = codecs.encode_jpeg(img)
    assert codecs.sniff(data) == "jpeg"
    assert codecs.decode_image(data).shape == (9, 11)


# ---------------------------------------------------------------------------
# progressive (SOF2)
# ---------------------------------------------------------------------------

def _textured_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[:h, :w]
    img = np.stack([(y * 7) % 256, (x * 5) % 256, ((x + y) * 3) % 256], -1)
    return (img + rng.integers(0, 25, img.shape)).clip(0, 255).astype(np.uint8)


def test_progressive_444_matches_baseline_exactly():
    """Same quant tables -> identical coefficients -> the progressive
    decode must be pixel-identical to the baseline decode."""
    img = _textured_rgb(37, 29)
    prog = codecs.encode_jpeg_progressive(img)
    assert codecs.jpeg_profile(prog) == "progressive"
    assert codecs.sniff(prog) == "jpeg"
    assert np.array_equal(codecs.decode_jpeg(prog),
                          codecs.decode_jpeg(codecs.encode_jpeg(img)))


def test_progressive_gray_odd_dims():
    y, x = np.mgrid[0:17, 0:23]
    img = (128 + 60 * np.sin(x / 5.0) * np.cos(y / 4.0)).astype(np.uint8)
    prog = codecs.encode_jpeg_progressive(img)
    assert np.array_equal(codecs.decode_jpeg(prog),
                          codecs.decode_jpeg(codecs.encode_jpeg(img)))


def test_progressive_420_non_interleaved_geometry():
    """4:2:0 progressive: AC scans walk the component's own block grid
    (nbw x nbh), not the MCU-padded grid — odd dims exercise the
    difference. Decode must land close to the source."""
    img = _textured_rgb(33, 50, seed=3)
    prog = codecs.encode_jpeg_progressive(img, subsample=True)
    out = codecs.decode_jpeg(prog)
    assert out.shape == img.shape
    err = np.abs(out.astype(float) - img.astype(float))
    assert err.mean() < 12  # chroma is box-averaged + quantized


def test_progressive_restart_markers():
    img = _textured_rgb(45, 37, seed=1)
    base = codecs.decode_jpeg(codecs.encode_jpeg(img))
    for ri in (1, 3, 7):
        prog = codecs.encode_jpeg_progressive(img, restart_interval=ri)
        assert np.array_equal(codecs.decode_jpeg(prog), base), ri


def test_progressive_eob_runs_and_zrl():
    # flat image -> every AC band is an EOB run spanning all blocks
    flat = np.full((64, 64), 128, np.uint8)
    assert np.array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg_progressive(flat)), flat)
    # single bright pixel deep in a block -> long zero runs (ZRL) in both
    # first and refinement AC passes
    sp = np.zeros((32, 32), np.uint8)
    sp[20, 25] = 255
    assert np.array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg_progressive(sp)),
        codecs.decode_jpeg(codecs.encode_jpeg(sp)))


def test_jpeg_profile_baseline():
    img = np.full((8, 8), 90, np.uint8)
    assert codecs.jpeg_profile(codecs.encode_jpeg(img)) == "baseline"
    with pytest.raises(ValueError, match="not a JPEG"):
        codecs.jpeg_profile(b"\x00\x01")

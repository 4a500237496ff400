"""Real media codecs (operators/multimodal.py): stdlib PNG decode across
all five filter types, WAV decode at 8/16-bit, nearest-neighbor resize
geometry, and the Pillow path when available."""

import math
import struct

import pytest

from coolplaydruid_spark.operators import multimodal as mm


def _px(w, h, ch):
    """Deterministic gradient pixels — adjacent-correlated so Sub/Up/Avg/
    Paeth filters produce non-trivial deltas."""
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ch", [(8, 8, 3), (5, 3, 1), (4, 4, 4), (3, 2, 2)])
def test_png_roundtrip_all_geometries(w, h, ch):
    px = _px(w, h, ch)
    assert mm.decode_image(mm.png_encode(px, w, h, ch)) == (w, h, ch, px)


def _filter_scanlines(px, w, h, ch, ftype):
    """Apply PNG filter `ftype` to every scanline (the encoder-side
    transform our filter-0-only encoder never emits)."""
    stride = w * ch
    out = b""
    for y in range(h):
        row = px[y * stride:(y + 1) * stride]
        prior = px[(y - 1) * stride:y * stride] if y > 0 else bytes(stride)
        line = bytearray()
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if ftype == 1:
                line.append((row[x] - a) & 0xFF)
            elif ftype == 2:
                line.append((row[x] - b) & 0xFF)
            elif ftype == 3:
                line.append((row[x] - (a + b) // 2) & 0xFF)
            else:  # 4
                line.append((row[x] - mm._paeth(a, b, c)) & 0xFF)
        out += bytes([ftype]) + bytes(line)
    return out


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_unfilter_sub_up_avg_paeth(ftype):
    """Hand-filter scanlines with each nonzero filter type and check the
    decoder reconstructs the original pixels — the path real-world PNGs
    (libpng picks per-row filters) exercise."""
    import zlib

    w, h, ch = 6, 5, 3
    px = _px(w, h, ch)
    body = _filter_scanlines(px, w, h, ch, ftype)
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    raw = (mm._PNG_MAGIC
           + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(body))
           + mm._png_chunk(b"IEND", b""))
    assert mm._png_decode(raw) == (w, h, ch, px)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        mm._png_decode(b"JFIF not a png")
    # 16-bit depth
    import zlib
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    raw = (mm._PNG_MAGIC + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(b"")) + mm._png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        mm._png_decode(raw)


def test_pillow_path_if_available():
    """When Pillow exists, decode_image must agree with the stdlib codec
    on our own PNGs (same tuple), proving the two paths are swappable."""
    pytest.importorskip("PIL")
    px = _px(8, 8, 3)
    assert mm.decode_image(mm.png_encode(px, 8, 8, 3)) == mm._png_decode(
        mm.png_encode(px, 8, 8, 3)
    )


def test_wav_8bit_roundtrip_stats():
    samples = bytes(range(200))
    nch, rate, n, dur, rms = mm.decode_audio(mm.wav_encode(samples, 8000))
    assert (nch, rate, n, dur) == (1, 8000, 200, 25)
    expect = math.sqrt(sum((s - 128) ** 2 for s in samples) / 200)
    assert rms == pytest.approx(expect)


def test_wav_16bit_decode():
    import io
    import wave

    vals = [0, 1000, -1000, 32767, -32768]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack(f"<{len(vals)}h", *vals))
    nch, rate, n, dur, rms = mm.decode_audio(buf.getvalue())
    assert (nch, rate, n) == (1, 16000, 5)
    assert rms == pytest.approx(math.sqrt(sum(v * v for v in vals) / 5))


def test_empty_wav_rms_zero():
    assert mm.decode_audio(mm.wav_encode(b""))[4] == 0.0


def test_resize_images_nearest_neighbor_exact(spark):
    """4x4 → 2x2 with 2:1 ratio: output (x,y) must be source (2x,2y),
    byte-exact through decode → resample → re-encode → decode."""
    px = _px(4, 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(mm.png_encode(px, 4, 4, 3)))], "media_id long, media binary"
    )
    out = mm.resize_images(df, 2, 2).collect()[0]
    w, h, ch, got = mm.decode_image(bytes(out["media"]))
    assert (w, h, ch) == (2, 2, 3)
    stride = 4 * 3
    expect = b"".join(
        px[(2 * y) * stride + (2 * x) * 3:(2 * y) * stride + (2 * x) * 3 + 3]
        for y in range(2) for x in range(2)
    )
    assert got == expect


def test_image_stats_operator(spark):
    px = _px(8, 8, 3)
    df = spark.createDataFrame(
        [(7, bytearray(mm.png_encode(px, 8, 8, 3)))], "media_id long, media binary"
    )
    row = mm.image_stats(df).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (8, 8, 3)
    assert row["mean_px"] == pytest.approx(sum(px) / len(px))


def _ref_dhash(px, w, h, ch):
    """Independent dHash reference: literal spec transcription."""
    hi = lo = 0
    for y in range(8):
        sy = y * h // 8
        row = [sum(px[(sy * w + (x * w // 9)) * ch:
                      (sy * w + (x * w // 9)) * ch + ch]) // ch
               for x in range(9)]
        for x in range(8):
            if row[x] > row[x + 1]:
                idx = y * 8 + x
                if idx < 32:
                    hi |= 1 << (31 - idx)
                else:
                    lo |= 1 << (63 - idx)
    return hi, lo


def test_phash_signature_known_values(spark):
    """Hash a horizontal-gradient image (strictly decreasing rows → all
    bits set EXCEPT each row's first: the 8→9 nearest-neighbor grid
    samples source pixel 0 twice, so the x=0 comparison ties → 0x7F per
    row byte), a flat image (no bit set), and a pseudo-random image
    against the independent reference."""
    grad = bytes(255 - x * 25 for y in range(8) for x in range(8) for _ in range(3))
    flat = bytes(128 for _ in range(8 * 8 * 3))
    rand = bytes((i * 37 + 11) % 256 for i in range(8 * 8 * 3))
    rows = [(1, mm.png_encode(grad, 8, 8, 3)),
            (2, mm.png_encode(flat, 8, 8, 3)),
            (3, mm.png_encode(rand, 8, 8, 3))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: (r["phash_hi"], r["phash_lo"])
           for r in mm.phash_signatures(df).collect()}
    assert got[1] == (0x7F7F7F7F, 0x7F7F7F7F)
    assert got[2] == (0, 0)
    assert got[3] == _ref_dhash(rand, 8, 8, 3)


def test_phash_neardup_blocking_and_threshold(spark):
    """Identical images pair at hamming 0; a 1-bit perturbation pairs at
    its exact hamming; unrelated images above the cap don't pair — and
    max_hamming past the pigeonhole guarantee raises."""
    base = bytes((i * 53 + 7) % 256 for i in range(8 * 8 * 3))
    # flip one gradient comparison: bump a single sample far enough
    tweaked = bytearray(base)
    tweaked[0:3] = bytes([255, 255, 255])
    other = bytes((i * 11 + 200) % 256 for i in range(8 * 8 * 3))
    rows = [(1, mm.png_encode(base, 8, 8, 3)),
            (2, mm.png_encode(base, 8, 8, 3)),
            (3, mm.png_encode(bytes(tweaked), 8, 8, 3)),
            (4, mm.png_encode(other, 8, 8, 3))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    h1 = _ref_dhash(base, 8, 8, 3)
    h3 = _ref_dhash(bytes(tweaked), 8, 8, 3)
    d13 = bin(h1[0] ^ h3[0]).count("1") + bin(h1[1] ^ h3[1]).count("1")
    assert 1 <= d13 <= 7  # the tweak flips a few bits, within banding reach
    got = {(r["media_id_a"], r["media_id_b"]): r["hamming"]
           for r in mm.phash_neardup(df, max_hamming=7).collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == d13 and got[(2, 3)] == d13
    h4 = _ref_dhash(other, 8, 8, 3)
    d14 = bin(h1[0] ^ h4[0]).count("1") + bin(h1[1] ^ h4[1]).count("1")
    if d14 > 7:
        assert (1, 4) not in got
    with pytest.raises(ValueError, match="pigeonhole"):
        mm.phash_neardup(df, max_hamming=8)


def test_audio_fingerprint_known_values(spark):
    """A clip whose per-window mean energy strictly decreases sets all
    32 bits; a constant clip sets none; an empty clip is 0; a 16-bit
    clip follows the same window math on signed samples."""
    # 33 windows x 4 samples, window w has every sample 233-7w:
    # strictly decreasing window means -> all 32 bits
    desc = bytes(128 + (233 - 7 * w) // 2 for w in range(33) for _ in range(4))
    flat = bytes(200 for _ in range(66))
    rows = [(1, mm.wav_encode(desc)),
            (2, mm.wav_encode(flat)),
            (3, mm.wav_encode(b""))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r["afp"]
           for r in mm.audio_fingerprint(df).collect()}
    assert got[1] == 0xFFFFFFFF
    assert got[2] == 0
    assert got[3] == 0


def test_audio_neardup_threshold_and_validation(spark):
    base = bytes((i * 29 + 3) % 256 for i in range(200))
    rows = [(1, mm.wav_encode(base)), (2, mm.wav_encode(base)),
            (3, mm.wav_encode(bytes(reversed(base))))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {(r["media_id_a"], r["media_id_b"]): r["hamming"]
           for r in mm.audio_neardup(df, max_hamming=3).collect()}
    assert got[(1, 2)] == 0
    with pytest.raises(ValueError, match="pigeonhole"):
        mm.audio_neardup(df, max_hamming=4)

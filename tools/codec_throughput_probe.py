"""Single-core throughput probe for the pure-Python image decoders.

VERDICT r7 #2b: the PNG/JPEG decoders are verification-grade; this probe
measures where the interpreted-Python cliff sits so the `decoder=`
injection threshold (PIL/libvips at production scale) is a NUMBER in
SCALING.md and the module docstring, not a vibe.

Methodology: build representative REAL files with the independent
pure-Python writers (same construction as the test twins — zlib-deflated
filtered PNG rasters; baseline JPEG with standard Annex-K tables,
value-varying 8x8 blocks so the entropy stream is non-degenerate), then
decode each repeatedly on ONE core and report decoded-payload bytes/s and
raster pixels/s.  Run:  python tools/codec_throughput_probe.py
"""

from __future__ import annotations

import json
import struct
import time
import zlib


# ------------------------------------------------------------------ PNG
def _png_chunk(t: bytes, d: bytes) -> bytes:
    return (
        struct.pack(">I", len(d))
        + t
        + d
        + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    )


def make_png(w: int, h: int, seed: int = 7) -> bytes:
    """Filter-0 RGB PNG with a cheap value-varying raster (real deflate)."""
    rb = 3 * w
    scan = bytearray()
    x = seed
    for r in range(h):
        scan.append(0)
        row = bytearray(rb)
        for j in range(rb):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            row[j] = (x >> 16) & 0xFF
        scan += row
    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    idat = _png_chunk(b"IDAT", zlib.compress(bytes(scan), 6))
    return b"\x89PNG\r\n\x1a\n" + ihdr + idat + _png_chunk(b"IEND", b"")


# ----------------------------------------------------------------- JPEG
def make_jpeg(w: int, h: int, seed: int = 7) -> bytes:
    """Baseline grayscale JPEG, one DC step per block + one AC coefficient
    every other block — a non-degenerate entropy stream at quant 1.
    Table/header assembly shared with the fixture builders (review
    finding r8: three divergent encoder copies)."""
    from stream_processing_pipeline_spark.plans.multimodalq import (
        _JPEG_AC_BITS,
        _JPEG_DC_BITS,
        _jpeg_ac_table_values,
        _jpeg_baseline_gray_header,
        _jpeg_canonical_codes,
    )

    dc = _jpeg_canonical_codes(_JPEG_DC_BITS, list(range(12)))
    ac = _jpeg_canonical_codes(_JPEG_AC_BITS, _jpeg_ac_table_values())

    def put(bits, sym):
        return bits + format(sym[0], f"0{sym[1]}b")

    def mag(bits, val):
        s = abs(val).bit_length()
        m = val if val > 0 else val + (1 << s) - 1
        return bits + format(m, f"0{s}b")

    bw, bh = (w + 7) // 8, (h + 7) // 8
    bits = ""
    x = seed
    for bi in range(bw * bh):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        diff = (x >> 16) % 17 - 8  # small DC steps, category <= 4
        s = abs(diff).bit_length()
        bits = put(bits, dc[s])
        if s:
            bits = mag(bits, diff)
        if bi % 2:  # AC(4,4) at zigzag 39 via ZRL+ZRL+run6, value 8 (size 4)
            bits = put(put(bits, ac[0xF0]), ac[0xF0])
            bits = put(bits, ac[(6 << 4) | 4])
            bits = mag(bits, 8)
        bits = put(bits, ac[0x00])
    bits += "1" * (-len(bits) % 8)
    raw = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i : i + 8], 2)
        raw.append(b)
        if b == 0xFF:
            raw.append(0x00)
    return _jpeg_baseline_gray_header(w, h) + bytes(raw) + b"\xFF\xD9"



# ------------------------------------------------------------------ GIF
def make_gif(w: int, h: int, seed: int = 7) -> bytes:
    """GIF87a with REAL LZW compression (the tests' encoder twin logic):
    value-varying pixels with run repetition so the dictionary grows."""
    from tests.test_operators import _gif_make

    x = seed
    idx = []
    while len(idx) < w * h:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        v = (x >> 16) & 0xFF
        idx.extend([v] * (1 + (x & 3)))
    payload, _pal = _gif_make(w, h, 8, idx[: w * h])
    return payload


def make_gif_dict_fixture(doc_id: int = 5) -> bytes:
    """The registered mm_gif_dict_decode_stats payload for one doc —
    127 byte-aligned ramp literals, forced 8->9 width bump, then the
    constant 9-bit dictionary tail (plans/multimodalq.py r9). Probes the
    exact in-plan dictionary-path shape the gate decodes."""
    from stream_processing_pipeline_spark.plans.multimodalq import (
        _GIF_DICT_HEADER_HEX,
        _GIF_DICT_TAIL_HEX,
    )

    b, m = doc_id % 64, (doc_id % 7) + 2
    lits = bytes(b + (p % m) for p in range(127))
    data = bytes([0x80]) + lits + bytes.fromhex(_GIF_DICT_TAIL_HEX)
    return (
        bytes.fromhex(_GIF_DICT_HEADER_HEX)
        + bytes([len(data)])
        + data
        + b"\x00\x3B"
    )




# ------------------------------------------------------------------ ZIP
def make_zip(n_files: int, file_kb: int, seed: int = 7) -> bytes:
    """Deflated archive via the stdlib writer (the decoder's authoritative
    twin): n_files entries of file_kb KiB of LCG bytes each."""
    import io
    import zipfile

    buf = io.BytesIO()
    x = seed
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(n_files):
            row = bytearray(file_kb * 1024)
            for j in range(len(row)):
                x = (x * 1103515245 + 12345) & 0x7FFFFFFF
                row[j] = (x >> 16) & 0xFF
            zi = zipfile.ZipInfo(f"m/{i}.bin", date_time=(1999, 1, 1, 0, 0, 0))
            z.writestr(zi, bytes(row))
    return buf.getvalue()


def bench(label: str, payload: bytes, decode, pixels: int, secs: float = 2.0):
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < secs:
        decode(payload)
        n += 1
    dt = time.perf_counter() - t0
    return {
        "case": label,
        "file_bytes": len(payload),
        "decodes": n,
        "bytes_per_sec": round(len(payload) * n / dt),
        "pixels_per_sec": round(pixels * n / dt),
    }


def main() -> None:
    import sys

    sys.path.insert(0, ".")
    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_jpeg,
        parse_png,
    )

    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_gif,
    )

    rows = []
    for w, h in ((64, 64), (256, 256)):
        rows.append(bench(f"png_{w}x{h}", make_png(w, h), parse_png, w * h))
    for w, h in ((64, 64), (256, 256)):
        rows.append(bench(f"jpeg_{w}x{h}", make_jpeg(w, h), parse_jpeg, w * h))
    for w, h in ((64, 64), (256, 256)):
        rows.append(bench(f"gif_{w}x{h}", make_gif(w, h), parse_gif, w * h))
    rows.append(
        bench("gif_dict_fixture_19x7", make_gif_dict_fixture(), parse_gif, 133)
    )
    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_zip,
    )

    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_gzip,
    )

    import gzip as _gz

    for kb in (16, 256):
        raw = make_zip(1, kb)  # reuse the LCG payload builder's bytes
        gz = _gz.compress(raw, mtime=0)
        rows.append(bench(f"gzip_{kb}KiB", gz, parse_gzip, len(raw)))
    for n_files, kb in ((16, 4), (64, 16)):
        zp = make_zip(n_files, kb)
        rows.append(
            bench(
                f"zip_{n_files}x{kb}KiB",
                zp,
                parse_zip,
                n_files * kb * 1024,  # pixels column = decoded bytes here
            )
        )
    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_zlib,
    )

    import zlib as _zl

    for kb in (16, 256):
        raw = make_zip(1, kb)  # reuse the LCG payload builder's bytes
        zs = _zl.compress(raw, 6)
        rows.append(bench(f"zlib_{kb}KiB", zs, parse_zlib, len(raw)))
    # r12 multi-stream shard walks: bz2 and xz decode through the native
    # stdlib codecs (unlike the interpreted-Python image decoders), so
    # these rows locate the *framing walk's* overhead, not a Python
    # cliff — expected within epsilon of raw bz2/lzma.decompress.
    from stream_processing_pipeline_spark.operators.multimodal import (
        parse_bz2,
        parse_xz,
    )

    import bz2 as _bz2
    import lzma as _lzma

    for kb in (16, 256):
        raw = make_zip(1, kb)
        cut = len(raw) // 2
        tb = _bz2.compress(raw[:cut], 9) + _bz2.compress(raw[cut:], 9)
        rows.append(bench(f"bz2_2stream_{kb}KiB", tb, parse_bz2, len(raw)))
        tx = (
            _lzma.compress(raw[:cut])
            + b"\x00" * 8
            + _lzma.compress(raw[cut:])
        )
        rows.append(bench(f"xz_2stream_pad_{kb}KiB", tx, parse_xz, len(raw)))
    # Native-decoder seam (VERDICT r10 #3): when Pillow is importable the
    # same payloads run through pil_decoder() so the committed ledger
    # carries the measured native rate BESIDE the ~5 MB/s pure-Python rows
    # (the number that makes decoder= injection mandatory at image-corpus
    # scale). Env-gated like tests/test_live_pil.py — the sandbox has no
    # media libraries, so the row records the gate instead of a rate.
    try:
        from stream_processing_pipeline_spark.operators.multimodal import (
            pil_decoder,
        )

        _pil = pil_decoder()
        for w, h in ((64, 64), (256, 256)):
            rows.append(bench(f"pil_png_{w}x{h}", make_png(w, h), _pil, w * h))
            rows.append(bench(f"pil_jpeg_{w}x{h}", make_jpeg(w, h), _pil, w * h))
    except ImportError:
        rows.append({"case": "pil_seam", "skipped": "Pillow not installed (env-gated; see tests/test_live_pil.py)"})
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

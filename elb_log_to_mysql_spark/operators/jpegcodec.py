"""JPEG codec (pure Python + numpy, zero deps): baseline sequential
AND progressive, from the public spec.

The reference pipeline treats media as opaque payloads; this engine's
multimodal family decodes REAL bytes for WAV/BMP/PNG, and JPEG was
the one remaining stub (VERDICT r7 item 5). This module closes it
with a from-scratch implementation of the PUBLIC JPEG specification
(ITU-T T.81 / ISO 10918-1, Huffman entropy coding, JFIF container):

- :func:`encode_gray` — a real encoder for 8-bit grayscale images:
  forward 8x8 DCT (numpy, orthonormal basis), quantization against a
  self-describing DQT table, zigzag + run-length coding, canonical
  Huffman tables DECLARED IN the stream (DHT), byte stuffing. Used
  to build deterministic fixtures; the bytes are a spec-valid JFIF
  file any external viewer can open. :func:`encode_gray_progressive`
  and friends transmit the SAME quantized coefficients as an SOF2
  multi-scan stream (DC first/refine, spectral-selection AC bands,
  AC refinement — annex G), for fixtures that drive every branch of
  the progressive decoder.
- :func:`decode_pixels` — a general decoder: marker parse
  (DQT/SOF0/SOF2/DHT/DRI/SOS, APPn/COM skipped, 0xFF fill bytes and
  standalone TEM/RSTn markers per B.1.1.2), Huffman entropy decode
  with 0xFF00 unstuffing and RSTn handling, DC prediction, dequant,
  de-zigzag, separable inverse DCT, level shift + clamp, partial-MCU
  crop; 1-component (grayscale) and 3-component YCbCr→RGB at any
  integer-ratio sampling — 4:4:4, 4:2:2, and the dominant wild-JPEG
  layout 4:2:0 (interleaved H x V data units per MCU, chroma
  upsampled by sample replication). Progressive streams accumulate
  coefficients scan by scan (successive-approximation shifts, EOB
  runs, correction bits — T.81 G.1.2) and reconstruct once at EOI.
  Non-integer sampling ratios, 12-bit precision and arithmetic
  coding are rejected loudly.

Everything here derives from the published spec; the Huffman tables
are NOT the Annex K examples but canonical tables computed from the
declared symbol sets (the stream carries its tables, so any valid
choice decodes identically). The zigzag order is generated
algorithmically from the diagonal-walk definition rather than typed
as a constant.

Numerics note for oracle replay: a block-CONSTANT 8x8 tile has only
a DC coefficient (all AC exactly 0 in the float DCT up to 1e-12,
quantizing to 0), so with even levels and qDC=16 the encode→decode
round trip is EXACT integer arithmetic — which is what lets a SQL
oracle recompute decoded pixel means from generation parameters
(queries.py: multimodal_jpeg_real), the same replay pattern the PNG
entry uses.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT basis (orthonormal): coef = C @ block @ C.T ------------------


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()

# JPEG's DCT convention scales the orthonormal transform by 4 in
# total across the 2-D pair; with the orthonormal basis above,
# coef[0,0] of a constant block of value v is exactly 8*(v-128),
# matching the spec's FDCT up to the same quantizer.


def _zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan, generated from its definition: walk
    anti-diagonals, alternating direction, starting up-right."""
    order = []
    for s in range(15):
        rng = range(s + 1)
        idx = [(s - j, j) for j in rng] if s % 2 == 0 else [(j, s - j) for j in rng]
        order.extend((r, c) for r, c in idx if r < 8 and c < 8)
    return order


_ZIGZAG = _zigzag_order()

# Default quantization table: DC step 16 (the classic luminance DC
# step), flat AC step 24 — self-describing via DQT, chosen so the
# fixture math stays readable. Any table works; it ships in-stream.
_DEFAULT_QTAB = np.full((8, 8), 24, dtype=np.int64)
_DEFAULT_QTAB[0, 0] = 16


# --- canonical Huffman construction ---------------------------------------


def _canonical_table(symbols: list[int], length: int):
    """BITS/HUFFVAL for a table assigning every symbol a code of the
    same `length` (valid canonical Huffman when 2**length > len(symbols),
    which also keeps the all-ones code unused). Returns (bits16,
    huffval, {symbol: (code, length)})."""
    if len(symbols) >= (1 << length):
        raise ValueError("length too small for symbol count")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {}
    code = 0
    for s in symbols:
        codes[s] = (code, length)
        code += 1
    return bits, list(symbols), codes


_DC_SYMBOLS = list(range(12))  # DC size categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS, _DC_HUFFVAL, _DC_CODES = _canonical_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_HUFFVAL, _AC_CODES = _canonical_table(_AC_SYMBOLS, 8)

# Progressive AC scans additionally need the EOBn symbols (run<<4 with
# size 0 for run 0..14 — T.81 G.1.2.2's end-of-band run lengths), so
# the progressive table carries the full (run, size 0..10) grid.
_PROG_AC_SYMBOLS = [
    (run << 4) | size for run in range(16) for size in range(0, 11)
]
_PROG_AC_BITS, _PROG_AC_HUFFVAL, _PROG_AC_CODES = _canonical_table(
    _PROG_AC_SYMBOLS, 8
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    # negative amplitudes encode as value-1 in `size` low bits (T.81 F.1.4)
    return v if v >= 0 else v + (1 << size) - 1


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _pad_replicate(
    plane: np.ndarray, th: int | None = None, tw: int | None = None
) -> np.ndarray:
    """Replicate-pad `plane` to (th, tw) — default: up to whole 8x8
    blocks; interleaved encodes pass the MCU-grid dims instead."""
    h, w = plane.shape
    if th is None:
        th = ((h + 7) // 8) * 8
    if tw is None:
        tw = ((w + 7) // 8) * 8
    padded = np.empty((th, tw), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:h, w:] = padded[:h, w - 1 : w]
    padded[h:, w:] = padded[h - 1, w - 1]
    return padded


def _write_block(writer: _BitWriter, zz64: np.ndarray, prev_dc: int) -> int:
    """Entropy-code one quantized block (zigzag-order coefficient
    vector: DC diff + AC run-lengths); returns the new DC predictor."""
    dc = int(zz64[0])
    diff = dc - prev_dc
    size = _category(diff if diff >= 0 else -diff)
    code, ln = _DC_CODES[size]
    writer.write(code, ln)
    if size:
        writer.write(_amplitude_bits(diff, size), size)
    zz = [int(v) for v in zz64[1:]]
    last_nz = -1
    for i, v in enumerate(zz):
        if v != 0:
            last_nz = i
    run = 0
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c16, l16 = _AC_CODES[0xF0]
            writer.write(c16, l16)
            run -= 16
        sz = _category(v if v >= 0 else -v)
        cA, lA = _AC_CODES[(run << 4) | sz]
        writer.write(cA, lA)
        writer.write(_amplitude_bits(v, sz), sz)
        run = 0
    if last_nz < 62:
        cE, lE = _AC_CODES[0x00]
        writer.write(cE, lE)
    return dc


def _container(
    h: int,
    w: int,
    sampling: list[tuple[int, int]],
    q: np.ndarray,
    scan: bytes,
) -> bytes:
    qt_zz = bytes(int(q[r, c]) for (r, c) in _ZIGZAG)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + qt_zz)  # DQT, 8-bit, id 0
    sof = struct.pack(">BHHB", 8, h, w, len(sampling))
    for cid, (hi, vi) in enumerate(sampling, start=1):
        sof += bytes([cid, (hi << 4) | vi, 0])  # sampling, qtable 0
    out += _marker(0xC0, sof)
    out += _marker(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_HUFFVAL))
    out += _marker(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_HUFFVAL))
    sos = bytes([len(sampling)])
    for cid in range(1, len(sampling) + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_planes(
    planes: list[np.ndarray],
    q: np.ndarray,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    """Interleaved baseline encode. `sampling` gives each plane's
    (H, V) factors; planes arrive at their OWN resolution (chroma
    already downsampled) and plane 0 must carry the max factors (its
    shape defines the frame dims). Default: all 1x1 (no subsampling,
    one block per component per MCU — the 4:4:4 / grayscale walk)."""
    if sampling is None:
        sampling = [(1, 1)] * len(planes)
    h, w = planes[0].shape
    # the orthonormal 2-D DCT IS the spec's FDCT scaling: a constant
    # block of value v yields exactly 8*(v-128) at DC. One shared
    # DCT/quantize path with the progressive encoder, so both emit
    # the IDENTICAL quantized coefficients (only transmission differs).
    zzs, mcux, mcuy = _quantized_zigzag(planes, q, sampling)
    writer = _BitWriter()
    preds = [0] * len(planes)
    # T.81 A.2.3 MCU walk: per MCU, each component contributes its
    # H x V data units in raster order, components in frame order.
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, zz in enumerate(zzs):
                hi, vi = sampling[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        by, bx = my * vi + vy, mx * hi + vx
                        preds[ci] = _write_block(
                            writer, zz[by, bx], preds[ci]
                        )
    writer.flush()
    return _container(h, w, sampling, q, bytes(writer.out))


def encode_gray(pixels: np.ndarray, qtab: np.ndarray | None = None) -> bytes:
    """Encode an 8-bit grayscale image (H x W uint8) as baseline JFIF.
    Real pipeline: level shift, per-block forward DCT, quantize,
    zigzag, DC-difference + AC run-length, Huffman, byte stuffing."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    return _encode_planes([np.asarray(pixels, dtype=np.float64)], q)


def encode_rgb444(rgb: np.ndarray, qtab: np.ndarray | None = None) -> bytes:
    """Encode an 8-bit RGB image (H x W x 3 uint8) as baseline JFIF,
    3 interleaved YCbCr components at 4:4:4 (no subsampling) — the
    exercise fixture for the decoder's color path. YCbCr per T.871."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    a = np.asarray(rgb, dtype=np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _encode_planes([y, cb, cr], q)


def encode_rgb420(rgb: np.ndarray, qtab: np.ndarray | None = None) -> bytes:
    """Encode an 8-bit RGB image (H x W x 3 uint8) as baseline JFIF
    with 4:2:0 chroma subsampling — Y at 2x2 sampling (full
    resolution), Cb/Cr at 1x1 (each chroma sample a 2x2-pixel box
    average), interleaved 16x16-pixel MCUs of 4 Y + 1 Cb + 1 Cr data
    units. This is the dominant wild-JPEG layout; the encoder exists
    to build deterministic fixtures that exercise the decoder's
    subsampled-MCU walk and chroma upsampling."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    a = np.asarray(rgb, dtype=np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def down2(p: np.ndarray) -> np.ndarray:
        hh, ww = p.shape
        p2 = _pad_replicate(p, hh + hh % 2, ww + ww % 2)
        return (
            p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2] + p2[1::2, 1::2]
        ) / 4.0

    return _encode_planes(
        [y, down2(cb), down2(cr)], q, [(2, 2), (1, 1), (1, 1)]
    )


def make_block_jpeg_bytes(width: int, height: int, block_base: int) -> bytes:
    """Deterministic fixture: every 8x8 block is CONSTANT at the even
    level (2*(block_base + raster_block_index)) % 256, so each block
    carries only a DC coefficient and (qDC=16, even levels) the
    decode is bit-exact — the oracle recomputes decoded means from
    (width, height, block_base) alone. Width/height need not be
    multiples of 8; the decoder's crop handles partial blocks (and
    the replicate-padded samples belong to the same constant block,
    keeping exactness)."""
    bh, bw = (height + 7) // 8, (width + 7) // 8
    img = np.empty((height, width), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            level = (2 * (block_base + by * bw + bx)) % 256
            img[by * 8 : min(by * 8 + 8, height), bx * 8 : min(bx * 8 + 8, width)] = level
    return encode_gray(img)


# --- progressive encoder (T.81 annex G, spectral selection +
# --- successive approximation) --------------------------------------------


def _quantized_zigzag(
    planes: list[np.ndarray],
    q: np.ndarray,
    sampling: list[tuple[int, int]],
) -> tuple[list[np.ndarray], int, int]:
    """Quantized coefficients for every component over the MCU-padded
    block grid, in ZIGZAG index order: one (nby, nbx, 64) int array
    per plane. Same FDCT/quantizer as the baseline path, so a
    progressive stream of these coefficients decodes to the identical
    image."""
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    if sampling[0] != (hmax, vmax):
        raise ValueError("plane 0 must carry the max sampling factors")
    h, w = planes[0].shape
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = []
    for p, (hi, vi) in zip(planes, sampling):
        nby, nbx = mcuy * vi, mcux * hi
        padded = _pad_replicate(p, nby * 8, nbx * 8)
        blocks = (
            padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = np.einsum("ij,xyjk,lk->xyil", _C, blocks, _C)
        qc = np.rint(coef / q).astype(np.int64)
        zz = np.empty((nby, nbx, 64), dtype=np.int64)
        for k, (r, c) in enumerate(_ZIGZAG):
            zz[:, :, k] = qc[:, :, r, c]
        out.append(zz)
    return out, mcux, mcuy


class _EobRun:
    """End-of-band run + (for refinement scans) the correction bits
    that must follow the EOBn code — T.81 G.1.2.2/G.1.2.3."""

    def __init__(self, writer: _BitWriter) -> None:
        self.writer = writer
        self.run = 0
        self.bits: list[int] = []

    def flush(self) -> None:
        if self.run:
            n = self.run.bit_length() - 1
            code, ln = _PROG_AC_CODES[n << 4]
            self.writer.write(code, ln)
            if n:
                self.writer.write(self.run - (1 << n), n)
            self.run = 0
        for b in self.bits:
            self.writer.write(b, 1)
        self.bits = []


def _enc_dc_scan(
    writer: _BitWriter, order, zzs: list[np.ndarray], ah: int, al: int
) -> None:
    """DC scan over `order` = [(ci, by, bx)] data units in
    transmission order. First pass (ah=0): DPCM of the
    point-transformed DC; refinement: one raw bit per unit."""
    preds: dict[int, int] = {}
    for ci, by, bx in order:
        dc = int(zzs[ci][by, bx, 0]) >> al  # arithmetic shift = G.1.2.1
        if ah == 0:
            diff = dc - preds.get(ci, 0)
            preds[ci] = dc
            size = _category(abs(diff))
            code, ln = _DC_CODES[size]
            writer.write(code, ln)
            if size:
                writer.write(_amplitude_bits(diff, size), size)
        else:
            writer.write(dc & 1, 1)


def _enc_ac_first(
    writer: _BitWriter,
    zz: np.ndarray,
    blocks,
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC first pass (G.1.2.2): run-length + amplitude of the
    point-transformed band, zero tails folded into EOB runs."""
    eob = _EobRun(writer)
    for by, bx in blocks:
        band = zz[by, bx]
        r = 0
        for k in range(ss, se + 1):
            v = int(band[k])
            t = abs(v) >> al
            if t == 0:
                r += 1
                continue
            eob.flush()
            while r > 15:
                code, ln = _PROG_AC_CODES[0xF0]
                writer.write(code, ln)
                r -= 16
            if v < 0:
                t = -t
            s = _category(abs(t))
            code, ln = _PROG_AC_CODES[(r << 4) | s]
            writer.write(code, ln)
            writer.write(_amplitude_bits(t, s), s)
            r = 0
        if r > 0:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush()
    eob.flush()


def _enc_ac_refine(
    writer: _BitWriter,
    zz: np.ndarray,
    blocks,
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC refinement pass (G.1.2.3): newly-significant coefficients
    as (run,1)+sign, already-nonzero ones as appended correction
    bits, zero tails as EOB runs carrying their correction bits."""
    eob = _EobRun(writer)
    for by, bx in blocks:
        band = zz[by, bx]
        absval = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
        last_new = -1  # band-relative index of last newly-significant
        for i, a in enumerate(absval):
            if a == 1:
                last_new = i
        r = 0
        pending: list[int] = []  # correction bits awaiting a code
        for i, a in enumerate(absval):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= last_new:
                eob.flush()
                code, ln = _PROG_AC_CODES[0xF0]
                writer.write(code, ln)
                r -= 16
                for b in pending:
                    writer.write(b, 1)
                pending = []
            if a > 1:
                pending.append(a & 1)
                continue
            eob.flush()
            code, ln = _PROG_AC_CODES[(r << 4) | 1]
            writer.write(code, ln)
            writer.write(1 if int(band[ss + i]) > 0 else 0, 1)
            for b in pending:
                writer.write(b, 1)
            pending = []
            r = 0
        if r > 0 or pending:
            eob.run += 1
            eob.bits.extend(pending)
            if eob.run == 0x7FFF or len(eob.bits) > 900:
                eob.flush()
    eob.flush()


def _encode_planes_progressive(
    planes: list[np.ndarray],
    q: np.ndarray,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    """Progressive (SOF2) encode of the SAME quantized coefficients
    the baseline path would transmit, as a conventional scan script:
    DC first at Al=1 (interleaved), DC refinement, then per component
    AC bands 1-5 and 6-63 at Al=1, then AC refinement 1-63. Exists to
    build deterministic fixtures that drive every branch of the
    progressive decoder (EOB runs, ZRL folding, correction bits)."""
    if sampling is None:
        sampling = [(1, 1)] * len(planes)
    h, w = planes[0].shape
    zzs, mcux, mcuy = _quantized_zigzag(planes, q, sampling)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    # interleaved MCU order for the DC scans (A.2.3); a single
    # component's MCU is one data unit over its own grid (A.2.2)
    dc_order = []
    if len(planes) == 1:
        nby, nbx = zzs[0].shape[:2]
        dc_order = [(0, by, bx) for by in range(nby) for bx in range(nbx)]
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(sampling):
                    for vy in range(vi):
                        for vx in range(hi):
                            dc_order.append((ci, my * vi + vy, mx * hi + vx))

    # AC scans are always single-component, over the blocks covering
    # the component's true sample array (not the MCU padding)
    ac_blocks = []
    for hi, vi in sampling:
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        ac_blocks.append(
            [(by, bx) for by in range(bh) for bx in range(bw)]
        )

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, body)

    qt_zz = bytes(int(q[r, c]) for (r, c) in _ZIGZAG)
    out = bytearray()
    out += b"\xff\xd8"
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + qt_zz)
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for cid, (hi, vi) in enumerate(sampling, start=1):
        sof += bytes([cid, (hi << 4) | vi, 0])
    out += _marker(0xC2, sof)  # SOF2: progressive DCT, Huffman
    out += _marker(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_HUFFVAL))
    out += _marker(
        0xC4, bytes([0x10] + _PROG_AC_BITS) + bytes(_PROG_AC_HUFFVAL)
    )
    all_ids = list(range(1, len(planes) + 1))

    wr = _BitWriter()
    _enc_dc_scan(wr, dc_order, zzs, ah=0, al=1)
    wr.flush()
    out += sos(all_ids, 0, 0, 0, 1) + bytes(wr.out)

    wr = _BitWriter()
    _enc_dc_scan(wr, dc_order, zzs, ah=1, al=0)
    wr.flush()
    out += sos(all_ids, 0, 0, 1, 0) + bytes(wr.out)

    for ci in range(len(planes)):
        for ss, se in ((1, 5), (6, 63)):
            wr = _BitWriter()
            _enc_ac_first(wr, zzs[ci], ac_blocks[ci], ss, se, al=1)
            wr.flush()
            out += sos([ci + 1], ss, se, 0, 1) + bytes(wr.out)
    for ci in range(len(planes)):
        wr = _BitWriter()
        _enc_ac_refine(wr, zzs[ci], ac_blocks[ci], 1, 63, al=0)
        wr.flush()
        out += sos([ci + 1], 1, 63, 1, 0) + bytes(wr.out)

    out += b"\xff\xd9"
    return bytes(out)


def encode_gray_progressive(
    pixels: np.ndarray, qtab: np.ndarray | None = None
) -> bytes:
    """Progressive (SOF2) encode of an 8-bit grayscale image; decodes
    bit-identically to encode_gray of the same pixels (same quantized
    coefficients, different transmission order)."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    return _encode_planes_progressive(
        [np.asarray(pixels, dtype=np.float64)], q
    )


def encode_rgb444_progressive(
    rgb: np.ndarray, qtab: np.ndarray | None = None
) -> bytes:
    """Progressive YCbCr 4:4:4 encode (T.871 color transform)."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    a = np.asarray(rgb, dtype=np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return _encode_planes_progressive([y, cb, cr], q)


def encode_rgb420_progressive(
    rgb: np.ndarray, qtab: np.ndarray | None = None
) -> bytes:
    """Progressive YCbCr 4:2:0 encode — the dominant wild-JPEG layout
    under the dominant wild-JPEG scan structure."""
    q = _DEFAULT_QTAB if qtab is None else np.asarray(qtab, dtype=np.int64)
    a = np.asarray(rgb, dtype=np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b

    def down2(p: np.ndarray) -> np.ndarray:
        hh, ww = p.shape
        p2 = _pad_replicate(p, hh + hh % 2, ww + ww % 2)
        return (
            p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2] + p2[1::2, 1::2]
        ) / 4.0

    return _encode_planes_progressive(
        [y, down2(cb), down2(cr)], q, [(2, 2), (1, 1), (1, 1)]
    )


def make_block_jpeg_bytes_progressive(
    width: int, height: int, block_base: int
) -> bytes:
    """Progressive twin of make_block_jpeg_bytes: the same
    block-constant integer-exact fixture transmitted as an SOF2
    multi-scan stream, so a SQL oracle can replay decoded means from
    (width, height, block_base) alone."""
    bh, bw = (height + 7) // 8, (width + 7) // 8
    img = np.empty((height, width), dtype=np.uint8)
    for by in range(bh):
        for bx in range(bw):
            level = (2 * (block_base + by * bw + bx)) % 256
            img[
                by * 8 : min(by * 8 + 8, height),
                bx * 8 : min(bx * 8 + 8, width),
            ] = level
    return encode_gray_progressive(img)


# --- decoder ---------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        while self._n <= 24:
            if self.pos >= len(self.data):
                self._acc = (self._acc << 8) | 0xFF  # pad past end
                self._n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (RSTn handled by caller via sync); pad
                    self.pos -= 1
                    self._acc = (self._acc << 8) | 0xFF
                    self._n += 8
                    continue
            self._acc = (self._acc << 8) | b
            self._n += 8

    def read_bit(self) -> int:
        self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_restart(self) -> None:
        """Discard bits to the next RSTn marker and skip it."""
        self._acc = 0
        self._n = 0
        d = self.data
        while self.pos < len(d) - 1:
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _build_decoder(bits: list[int], huffval: list[int]):
    """code table: {(length, code): symbol} per the canonical rule."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_end(payload: bytes, start: int) -> int:
    """First byte of the next real marker after `start`: scan past
    stuffed 0xFF00 pairs and in-stream RSTn markers (both belong to
    the entropy-coded segment, B.1.1.5)."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return i
        i += 1
    return n


def _decode_unit_baseline(reader, block, dc_t, ac_t, preds, cid) -> None:
    """One full 8x8 data unit of a sequential scan (F.2.2): DC
    DPCM + AC run-lengths into the zigzag-order coefficient row."""
    size = _huff_decode(reader, dc_t)
    diff = _extend(reader.read_bits(size), size) if size else 0
    preds[cid] += diff
    block[0] = preds[cid]
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_t)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k >= 64:
            raise ValueError("AC index overflow")
        block[k] = _extend(reader.read_bits(size), size)
        k += 1


def _decode_unit_ac_first(
    reader, block, ac_t, ss, se, al, eob_state
) -> None:
    """Progressive AC first pass for one data unit (G.1.2.2 /
    figure G.3): amplitudes at approximation Al, EOBn run decoding."""
    if eob_state[0] > 0:
        eob_state[0] -= 1
        return
    k = ss
    while k <= se:
        sym = _huff_decode(reader, ac_t)
        r, s = sym >> 4, sym & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC band overflow")
            block[k] = _extend(reader.read_bits(s), s) << al
        else:
            if r != 15:
                eob = 1 << r
                if r:
                    eob += reader.read_bits(r)
                eob_state[0] = eob - 1  # this unit consumes one
                return
            k += 15  # ZRL: 16 zeros (+1 below)
        k += 1


def _decode_unit_ac_refine(
    reader, block, ac_t, ss, se, al, eob_state
) -> None:
    """Progressive AC refinement for one data unit (G.1.2.3 / figure
    G.7, the correction-bit protocol): newly-significant coefficients
    arrive as (run,1)+sign, already-nonzero coefficients absorb one
    correction bit as they are passed over, EOB runs carry correction
    bits for the band tails of every unit they cover."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if reader.read_bit() and not (int(block[k]) & p1):
            block[k] += p1 if block[k] >= 0 else m1

    k = ss
    if eob_state[0] == 0:
        while k <= se:
            sym = _huff_decode(reader, ac_t)
            r, s = sym >> 4, sym & 0xF
            if s:
                if s != 1:
                    raise ValueError("refinement amplitude must be 1")
                s = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    eob_state[0] = 1 << r
                    if r:
                        eob_state[0] += reader.read_bits(r)
                    break
                s = 0  # ZRL: skip 16 zero-history positions
            while k <= se:
                if block[k] != 0:
                    correct(k)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s:
                if k > se:
                    raise ValueError("AC refinement overflow")
                block[k] = s
            k += 1
    if eob_state[0] > 0:
        while k <= se:
            if block[k] != 0:
                correct(k)
            k += 1
        eob_state[0] -= 1


def _decode_scan(
    data: bytes,
    frame: dict,
    scomps: list[dict],
    coefs: dict[int, np.ndarray],
    dc_tables: dict,
    ac_tables: dict,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """Decode one entropy-coded segment into the per-component
    zigzag-order coefficient arrays. Handles interleaved MCU walks
    (A.2.3), non-interleaved single-component walks (A.2.2), and all
    four progressive scan kinds plus the sequential full-band scan."""
    progressive = frame["progressive"]
    by_id = {c["id"]: c for c in frame["comps"]}
    reader = _BitReader(data)
    preds = {sc["id"]: 0 for sc in scomps}
    eob_state = [0]

    def unit(sc: dict, comp: dict, by: int, bx: int) -> None:
        block = coefs[comp["id"]][by, bx]
        if not progressive:
            _decode_unit_baseline(
                reader, block,
                dc_tables[sc["td"]], ac_tables[sc["ta"]],
                preds, comp["id"],
            )
        elif ss == 0:
            if ah == 0:  # DC first
                size = _huff_decode(reader, dc_tables[sc["td"]])
                diff = (
                    _extend(reader.read_bits(size), size) if size else 0
                )
                preds[comp["id"]] += diff
                block[0] = preds[comp["id"]] << al
            elif reader.read_bit():  # DC refinement: one raw bit
                block[0] |= 1 << al
        elif ah == 0:
            _decode_unit_ac_first(
                reader, block, ac_tables[sc["ta"]], ss, se, al, eob_state
            )
        else:
            _decode_unit_ac_refine(
                reader, block, ac_tables[sc["ta"]], ss, se, al, eob_state
            )

    def restart(n: int) -> None:
        if restart_interval and n and n % restart_interval == 0:
            reader.sync_to_restart()
            for k in preds:
                preds[k] = 0
            eob_state[0] = 0

    if len(scomps) > 1:
        # interleaved: each MCU carries H_i x V_i units per component
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        layout = [(sc, by_id[sc["id"]]) for sc in scomps]
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(n)
                for sc, comp in layout:
                    hi, vi = comp["h"], comp["v"]
                    for vy in range(vi):
                        for vx in range(hi):
                            unit(sc, comp, my * vi + vy, mx * hi + vx)
                n += 1
    else:
        # non-interleaved: one data unit per MCU over the component's
        # own block grid (progressive AC scans and single-component
        # frames; the grid covers the true samples, not MCU padding)
        sc = scomps[0]
        comp = by_id[sc["id"]]
        n = 0
        for by in range(comp["bh"]):
            for bx in range(comp["bw"]):
                restart(n)
                unit(sc, comp, by, bx)
                n += 1


def decode_pixels(payload: bytes) -> tuple:
    """Decode a JFIF/JPEG stream — baseline sequential (SOF0/1) or
    progressive (SOF2: spectral selection + successive approximation,
    DC/AC first and refinement scans, EOB runs). Returns (width,
    height, n_components, pixel_sum, n_samples) where pixel_sum is
    over the decoded (cropped) samples — grayscale levels, or RGB
    after the T.871 YCbCr conversion for 3-component streams (4:4:4,
    4:2:2, 4:2:0 and any other integer-ratio sampling)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    coefs: dict[int, np.ndarray] = {}
    nscans = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        tag = payload[pos + 1]
        if tag == 0xD9:  # EOI
            break
        if tag == 0x01 or 0xD0 <= tag <= 0xD7:
            # TEM / standalone RSTn: length-less markers, skip
            pos += 2
            continue
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if tag == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros((8, 8), dtype=np.int64)
                for i, (r, c) in enumerate(_ZIGZAG):
                    tab[r, c] = body[p + i]
                qtabs[tq] = tab
                p += 64
        elif tag in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(
                    f"{prec}-bit sample precision unsupported (8-bit only)"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {
                "w": w, "h": h, "comps": comps,
                "progressive": tag == 0xC2,
            }
        elif tag == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nsym = sum(bits)
                huffval = list(body[p + 17 : p + 17 + nsym])
                (dc_tables if tc == 0 else ac_tables)[th] = _build_decoder(
                    bits, huffval
                )
                p += 17 + nsym
        elif tag == 0xDD:
            (restart_interval,) = struct.unpack(">H", body)
        elif tag == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cid, tdta = body[1 + 2 * i : 3 + 2 * i]
                scomps.append(
                    {"id": cid, "td": tdta >> 4, "ta": tdta & 0xF}
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if frame["progressive"]:
                # B.2.3 scan-header constraints: a DC scan is Ss=Se=0,
                # AC scans are single-component bands in 1..63, and a
                # refinement pass lowers the approximation by one bit
                if (ss == 0) != (se == 0) or se > 63 or ss > se:
                    raise ValueError(
                        "invalid progressive scan header "
                        f"(Ss={ss}, Se={se})"
                    )
                if ss > 0 and ns != 1:
                    raise ValueError(
                        "progressive AC scans are single-component"
                    )
                if ah and ah != al + 1:
                    raise ValueError(
                        f"invalid successive approximation Ah={ah} Al={al}"
                    )
            if not coefs:
                _frame_geometry(frame)
                coefs = {
                    c["id"]: np.zeros(
                        (c["bh_alloc"], c["bw_alloc"], 64), dtype=np.int32
                    )
                    for c in frame["comps"]
                }
            if not frame["progressive"]:
                if len(scomps) == 1 and len(frame["comps"]) > 1:
                    raise ValueError(
                        "multi-scan non-interleaved sequential streams "
                        "unsupported (baseline interleaved decoder)"
                    )
                ss, se, ah, al = 0, 63, 0, 0  # full-band, no approx
            seg_end = _entropy_end(payload, pos)
            _decode_scan(
                payload[pos:seg_end], frame, scomps, coefs,
                dc_tables, ac_tables, restart_interval,
                ss, se, ah, al,
            )
            nscans += 1
            pos = seg_end
            if not frame["progressive"]:
                break  # sequential: one interleaved scan carries all
    if frame is None or nscans == 0:
        raise ValueError("missing SOF0/SOS")

    # reconstruction: dezigzag + dequantize + IDCT, whole grid at once
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for c in comps:
        q = qtabs[c["tq"]]
        zz = coefs[c["id"]]
        nby, nbx = zz.shape[:2]
        nat = np.zeros((nby, nbx, 8, 8), dtype=np.float64)
        for k, (r, cc) in enumerate(_ZIGZAG):
            nat[:, :, r, cc] = zz[:, :, k] * q[r, cc]
        blocks = np.einsum("ji,xyjk,kl->xyil", _C, nat, _C) + 128.0
        p = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # Upsample subsampled components by sample replication (JFIF
        # leaves the upsampling filter unspecified; nearest-neighbor
        # is exact on the block-constant oracle fixtures), then crop.
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1:
            p = np.repeat(p, fy, axis=0)
        if fx > 1:
            p = np.repeat(p, fx, axis=1)
        full.append(p)
    cropped = [np.clip(np.rint(p[:h, :w]), 0, 255) for p in full]
    if len(cropped) == 1:
        samples = cropped[0]
        return w, h, 1, float(samples.sum()), int(samples.size)
    if len(cropped) == 3:
        y, cb, cr = cropped
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        rgb = np.clip(np.rint(np.stack([r, g, b])), 0, 255)
        return w, h, 3, float(rgb.sum()), int(rgb.size)
    raise ValueError(f"{len(cropped)}-component streams unsupported")


def _frame_geometry(frame: dict) -> None:
    """Annotate the frame with its MCU grid and each component's
    block dims: the allocation grid (MCU-padded — what interleaved
    scans walk) and the true-sample grid bh/bw (what non-interleaved
    scans walk, A.2.2). With a single frame component its plane IS
    the image whatever the declared factors (some grayscale encoders
    write 0x22)."""
    comps = frame["comps"]
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError("invalid sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError(
                "non-integer subsampling ratio unsupported "
                f"(factors {c['h']}x{c['v']} vs max {hmax}x{vmax})"
            )
    w, h = frame["w"], frame["h"]
    frame["mcux"] = -(-w // (8 * hmax))
    frame["mcuy"] = -(-h // (8 * vmax))
    for c in comps:
        cw = -(-(w * c["h"]) // hmax)  # component's own sample dims
        ch = -(-(h * c["v"]) // vmax)
        c["bw"], c["bh"] = -(-cw // 8), -(-ch // 8)
        c["bw_alloc"] = max(frame["mcux"] * c["h"], c["bw"])
        c["bh_alloc"] = max(frame["mcuy"] * c["v"], c["bh"])

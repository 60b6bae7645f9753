"""Minimal baseline-JPEG codec (pure Python + numpy, zero deps).

The reference pipeline treats media as opaque payloads; this engine's
multimodal family decodes REAL bytes for WAV/BMP/PNG, and JPEG was
the one remaining stub (VERDICT r7 item 5). This module closes it
with a from-scratch implementation of the PUBLIC baseline JPEG
specification (ITU-T T.81 / ISO 10918-1, sequential DCT, Huffman
entropy coding, JFIF container):

- :func:`encode_gray` — a real encoder for 8-bit grayscale images:
  forward 8x8 DCT (numpy, orthonormal basis), quantization against a
  self-describing DQT table, zigzag + run-length coding, canonical
  Huffman tables DECLARED IN the stream (DHT), byte stuffing. Used
  to build deterministic fixtures; the bytes are a spec-valid JFIF
  file any external viewer can open.
- :func:`decode_pixels` — a general baseline decoder: marker parse
  (DQT/SOF0/DHT/DRI/SOS, APPn/COM skipped, 0xFF fill bytes and
  standalone TEM/RSTn markers per B.1.1.2), Huffman entropy decode
  with 0xFF00 unstuffing and RSTn handling, DC prediction, dequant,
  de-zigzag, separable inverse DCT, level shift + clamp, partial-MCU
  crop; 1-component (grayscale) and 3-component YCbCr→RGB at any
  integer-ratio sampling — 4:4:4, 4:2:2, and the dominant wild-JPEG
  layout 4:2:0 (interleaved H x V data units per MCU, chroma
  upsampled by sample replication). Progressive (SOF2) and
  non-integer sampling ratios are rejected loudly — this is a
  baseline sequential codec, and says so.

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


def _write_block(writer: _BitWriter, qc: np.ndarray, prev_dc: int) -> int:
    """Entropy-code one quantized block (DC diff + AC run-lengths);
    returns the new DC predictor."""
    dc = int(qc[0, 0])
    diff = dc - prev_dc
    size = _category(diff if diff >= 0 else -diff)
    code, ln = _DC_CODES[size]
    writer.write(code, ln)
    if size:
        writer.write(_amplitude_bits(diff, size), size)
    zz = [int(qc[r, c]) for (r, c) in _ZIGZAG[1:]]
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
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    if sampling[0] != (hmax, vmax):
        raise ValueError("plane 0 must carry the max sampling factors")
    h, w = planes[0].shape
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_replicate(p, mcuy * vi * 8, mcux * hi * 8)
        for p, (hi, vi) in zip(planes, sampling)
    ]
    writer = _BitWriter()
    preds = [0] * len(planes)
    # T.81 A.2.3 MCU walk: per MCU, each component contributes its
    # H x V data units in raster order, components in frame order.
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, plane in enumerate(padded):
                hi, vi = sampling[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        by, bx = my * vi + vy, mx * hi + vx
                        block = (
                            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                            - 128.0
                        )
                        # the orthonormal 2-D DCT IS the spec's FDCT
                        # scaling: a constant block of value v yields
                        # exactly 8*(v-128) at DC
                        coef = _C @ block @ _C.T
                        qc = np.rint(coef / q).astype(np.int64)
                        preds[ci] = _write_block(writer, qc, preds[ci])
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


def decode_pixels(payload: bytes) -> tuple:
    """Decode a baseline JFIF/JPEG stream. Returns (width, height,
    n_components, pixel_sum, n_samples) where pixel_sum is over the
    decoded (cropped) samples — grayscale levels, or RGB after the
    T.871 YCbCr conversion for 3-component streams (4:4:4, 4:2:2,
    4:2:0 and any other integer-ratio sampling)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    scan = None
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
        elif tag in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif tag == 0xC2:
            raise ValueError("progressive JPEG unsupported (baseline codec)")
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
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cid, "td": tdta >> 4, "ta": tdta & 0xF})
            scan = {"comps": scan_comps, "data_at": pos}
            break  # entropy-coded data follows
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
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
    scomps = scan["comps"]
    if len(scomps) == 1 and len(comps) > 1:
        raise ValueError(
            "multi-scan non-interleaved streams unsupported "
            "(baseline interleaved decoder)"
        )
    if len(scomps) == 1:
        # Non-interleaved scan (T.81 A.2.2): the MCU is ONE data unit
        # of the sole component, walked over its own block grid. With
        # a single frame component its plane IS the image, whatever
        # the declared factors (some grayscale encoders write 0x22).
        comp = by_id[scomps[0]["id"]]
        cw = -(-(w * comp["h"]) // hmax)  # component's own width
        ch = -(-(h * comp["v"]) // vmax)
        mcux, mcuy = -(-cw // 8), -(-ch // 8)
        layout = [(scomps[0], comp, 1, 1)]
        plane_dims = {comp["id"]: (mcuy * 8, mcux * 8)}
    else:
        # Interleaved scan (T.81 A.2.3): each MCU carries H_i x V_i
        # data units per component, components in scan order.
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        layout = [
            (sc, by_id[sc["id"]], by_id[sc["id"]]["h"], by_id[sc["id"]]["v"])
            for sc in scomps
        ]
        plane_dims = {
            c["id"]: (mcuy * c["v"] * 8, mcux * c["h"] * 8) for c in comps
        }
    planes = {
        cid: np.zeros(dims, dtype=np.float64)
        for cid, dims in plane_dims.items()
    }
    reader = _BitReader(payload[scan["data_at"] :])
    preds = {sc["id"]: 0 for sc in scomps}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_to_restart()
                preds = {k: 0 for k in preds}
            for sc, comp, hi, vi in layout:
                dc_t, ac_t = dc_tables[sc["td"]], ac_tables[sc["ta"]]
                q = qtabs[comp["tq"]]
                plane = planes[comp["id"]]
                for vy in range(vi):
                    for vx in range(hi):
                        size = _huff_decode(reader, dc_t)
                        diff = (
                            _extend(reader.read_bits(size), size)
                            if size
                            else 0
                        )
                        preds[comp["id"]] += diff
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[0, 0] = preds[comp["id"]] * q[0, 0]
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
                            v = _extend(reader.read_bits(size), size)
                            r, c = _ZIGZAG[k]
                            coef[r, c] = v * q[r, c]
                            k += 1
                        block = _C.T @ coef @ _C + 128.0
                        by, bx = my * vi + vy, mx * hi + vx
                        plane[
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = block
            mcu += 1

    # Upsample subsampled components by sample replication (JFIF
    # leaves the upsampling filter unspecified; nearest-neighbor is
    # exact on the block-constant oracle fixtures), then crop.
    full = []
    for c in comps:
        p = planes[c["id"]]
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

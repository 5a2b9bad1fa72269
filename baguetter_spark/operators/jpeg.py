"""Baseline JPEG (ITU-T T.81 sequential DCT) decoder in pure numpy +
stdlib — round-5 stretch item narrowing the "compressed codecs" gap
(reference ships media through PIL-family loaders; this container has no
image libraries, but baseline JPEG is decodable from the public spec:
huffman entropy coding + dequantization + 8x8 IDCT + YCbCr conversion).

Scope (decoder): baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
components, any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0 via
nearest-neighbor chroma upsampling), DRI/RSTn restart markers, multiple
DQT/DHT segments.  Progressive (SOF2), arithmetic coding, and 12-bit
precision raise ``NotImplementedError`` naming the feature.

Scope (encoder, fixture-only): ``encode_jpeg`` writes a valid baseline
JPEG from raw samples — grayscale or RGB 4:4:4 (optionally 4:2:0) with
UNIT quantization tables and self-contained canonical huffman tables
(all 12 DC categories at 4 bits; EOB/ZRL + every (run,size) AC symbol at
9 bits — the DHT segment carries them, so no dependence on the Annex K
tables).  With unit quant tables the only loss is coefficient rounding
(<= 0.5 per coefficient), so decode(encode(x)) is within a small bound of
x; for BLOCK-CONSTANT grayscale images the DCT has one integer DC
coefficient per block and zero ACs, so the roundtrip is integer-EXACT —
that is what the driver-gate row checks against closed-form DuckDB
synthesis (gate5 ``multimodal_decode_jpeg``).

Spark integration lives in ``operators/multimodal.py`` (``media_features``
/ ``media_decode_stats`` dispatch on the FFD8 magic).
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# IDCT basis: M[u, x] = C(u) * cos((2x+1) u pi / 16) / 2, C(0)=1/sqrt(2).
# f = M.T @ F @ M  (inverse);  F = M @ f @ M.T  (forward).
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0) / 2.0


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; RSTn markers are consumed by the caller."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # marker inside entropy data (e.g. truncated stream hitting
                # EOI): feed zero bits per the spec's missing-data rule
                self.pos -= 1
                b = 0
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte and any pad bits before a marker (RSTn)."""
        self.nbits = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map ``t`` magnitude bits to the signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _HuffTable:
    """Canonical huffman decode table from DHT (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], values: bytes) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            code <<= 1
        self.values = values

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.max_code[length]:
            code = (code << 1) | br.read_bit()
            length += 1
            if length > 16:
                msg = "corrupt JPEG: huffman code longer than 16 bits"
                raise ValueError(msg)
        return self.values[self.val_ptr[length] + code - self.min_code[length]]


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG.  Returns ``(width, height, channels,
    samples)`` — flat uint8 raster, row-major, channels interleaved
    (grayscale or RGB after YCbCr conversion)."""
    if payload[:2] != b"\xff\xd8":
        msg = "not a JPEG payload (no SOI)"
        raise ValueError(msg)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    restart_interval = 0
    out = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                dq = np.zeros(64, dtype=np.int32)
                dq[ZIGZAG] = tbl
                qt[tid] = dq.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                msg = f"only 8-bit JPEG precision supported (got {precision})"
                raise NotImplementedError(msg)
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + c * 3]
                hs, vs = seg[7 + c * 3] >> 4, seg[7 + c * 3] & 0xF
                tq = seg[8 + c * 3]
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            msg = f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) not supported"
            raise NotImplementedError(msg)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                msg = "JPEG SOS before SOF"
                raise ValueError(msg)
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid = seg[1 + c * 2]
                td, ta = seg[2 + c * 2] >> 4, seg[2 + c * 2] & 0xF
                scan_tables[cid] = (td, ta)
            out = _decode_scan(
                payload, pos + seglen, frame, scan_tables, qt,
                huff_dc, huff_ac, restart_interval,
            )
            break
        pos += seglen
    if out is None:
        msg = "JPEG missing SOS scan"
        raise ValueError(msg)
    return out


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    pred = {cid: 0 for cid, *_ in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                # restart: align, consume RSTn, reset DC predictors
                br.nbits = 0
                while br.data[br.pos] != 0xFF or br.data[br.pos + 1] == 0x00:
                    br.pos += 1
                if 0xD0 <= br.data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = {cid: 0 for cid in pred}
            for cid, hs, vs, tq in comps:
                td, ta = scan_tables[cid]
                dc_tbl, ac_tbl = huff_dc[td], huff_ac[ta]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.int32)
                        t = dc_tbl.decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = ac_tbl.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                msg = "corrupt JPEG: AC run past block end"
                                raise ValueError(msg)
                            coef[k] = _extend(br.receive(s), s)
                            k += 1
                        dez = np.zeros(64, dtype=np.int32)
                        dez[ZIGZAG] = coef
                        block = _idct2(dez.reshape(8, 8) * q)
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution, crop, color-convert
    full = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, gray.reshape(-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).reshape(-1)


# --------------------------------------------------------------- encoder

# fixture tables: 12 DC categories at 4 bits; AC = EOB + ZRL + every
# (run 0-15, size 1-10) symbol at 9 bits (162 symbols; 2^9 = 512 so the
# canonical code never exhausts).  Self-contained — written to DHT.
_ENC_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0] * 16
_ENC_AC_BITS[8] = len(_AC_SYMBOLS)  # all at 9 bits
_ENC_AC_VALS = bytes(_AC_SYMBOLS)


def _canonical_codes(bits: list[int], values: bytes) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    samples: np.ndarray,
    width: int,
    height: int,
    channels: int,
    *,
    subsample_420: bool = False,
) -> bytes:
    """Minimal valid baseline JPEG writer (fixture synthesis; see module
    docstring).  Unit quantization tables; grayscale (channels=1) or RGB
    (channels=3, converted to YCbCr; 4:4:4 or — with ``subsample_420`` —
    2x2-averaged 4:2:0).  Width/height need not be block-aligned (edge
    blocks replicate the last row/column)."""
    px = np.asarray(samples, dtype=np.float64).reshape(height, width, channels)
    if channels == 1:
        planes = [px[:, :, 0]]
        samp = [(1, 1)]
    elif channels == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample_420:
            def down(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
                return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    else:
        msg = f"encode_jpeg supports 1 or 3 channels, got {channels}"
        raise ValueError(msg)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    padded = []
    for p, (hs, vs) in zip(planes, samp):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = np.round(_fdct2(block)).astype(np.int64)
                        zz = coef.reshape(-1)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t = _category(diff)
                        code, length = dc_codes[t]
                        bw.write(code, length)
                        if t:
                            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]
                                bw.write(c, ln)
                                run -= 16
                            s = _category(v)
                            c, ln = ac_codes[(run << 4) | s]
                            bw.write(c, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if last_nz < 63:
                            c, ln = ac_codes[0x00]
                            bw.write(c, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    unit_q = np.ones(64, dtype=np.uint8)
    dqt = seg(0xDB, bytes([0x00]) + unit_q.tobytes())
    ncomp = len(planes)
    sof_body = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof_body += bytes([ci + 1, (hs << 4) | vs, 0])
    sof = seg(0xC0, sof_body)
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _ENC_AC_VALS,
    )
    sos_body = bytes([ncomp])
    for ci in range(ncomp):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    sos = seg(0xDA, sos_body)
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"

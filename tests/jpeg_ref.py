"""Independent baseline-JPEG REFERENCE ENCODER for decoder tests.

Built straight from ITU-T T.81 (forward DCT from its own cosine matrix,
zigzag, run-length symbols, canonical fixed-length huffman tables
emitted in DHT, FF00 byte stuffing, optional 4:2:0 subsampling and
restart intervals) — sharing NO code with the decoder under test, so a
decode(encode(x)) comparison exercises the spec, not a tautology.

Not a production encoder: fixed-length huffman codes are suboptimal and
the API only covers what the tests need.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis():
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


def _fdct(block: np.ndarray) -> np.ndarray:
    a = _dct_basis()
    return a @ block @ a.T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n_bits: int) -> None:
        for i in range(n_bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size class, raw bits) for a signed coefficient — T.81 F.1.2.1.2."""
    if v == 0:
        return 0, 0
    t = abs(v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


def _fixed_tables(symbols: set[int]) -> tuple[dict[int, tuple[int, int]], bytes]:
    """Canonical fixed-length huffman table over the used symbols.

    Returns (symbol -> (code, length), DHT payload bits+vals)."""
    syms = sorted(symbols)
    n = len(syms)
    length = max(2, (n + 1).bit_length())  # leave the all-ones code unused
    assert n < (1 << length) and length <= 16
    enc = {s: (i, length) for i, s in enumerate(syms)}
    counts = [0] * 16
    counts[length - 1] = n
    payload = bytes(counts) + bytes(syms)
    return enc, payload


def _block_symbols(coeffs: np.ndarray, pred: int):
    """(dc_symbol, dc_bits), [(ac_symbol, ac_bits), ...], new predictor."""
    zz = [int(coeffs.flat[ZIGZAG[k]]) for k in range(64)]
    diff = zz[0] - pred
    t, bits = _magnitude(diff)
    dc = (t, bits, t)
    acs = []
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            if run == 16:
                acs.append((0xF0, 0, 0))  # ZRL
                run = 0
            continue
        s, bits_ = _magnitude(zz[k])
        acs.append(((run << 4) | s, bits_, s))
        run = 0
    if last_nz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return dc, acs, zz[0]


def encode_jpeg(
    img: np.ndarray,
    quant: int | np.ndarray = 8,
    subsample: bool = False,
    restart_interval: int = 0,
    adobe_transform: int | None = None,
) -> bytes:
    """Encode ``(h, w)`` greyscale, ``(h, w, 3)`` RGB, or ``(h, w, 4)``
    Adobe-inverted CMYK uint8 as a baseline JFIF byte string.
    ``quant``: scalar (uniform table) or a 64-entry table, used for
    every component. For 4-channel input an Adobe APP14 marker is
    emitted; ``adobe_transform=2`` runs the inverted C/M/Y channels
    through the YCbCr matrix (YCCK), 0/None stores them direct."""
    img = np.asarray(img, dtype=np.float64)
    grey = img.ndim == 2
    cmyk = img.ndim == 3 and img.shape[2] == 4
    h, w = img.shape[:2]
    q = np.full(64, quant, dtype=np.int32) if np.isscalar(quant) else np.asarray(
        quant, dtype=np.int32
    )
    qtab = q.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]  # natural -> zigzag

    if grey:
        planes = [img]
        samp = [(1, 1)]
    elif cmyk:
        if adobe_transform == 2:  # YCCK: YCbCr over the inverted CMY
            r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            planes = [y, cb, cr, img[:, :, 3]]
        else:
            planes = [img[:, :, c] for c in range(4)]
        samp = [(1, 1)] * 4
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-average 2x2 (pad to even first)
            def down(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), "edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad planes to full MCU coverage (edge replicate)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        pp = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge"
        )
        padded.append(pp)

    # quantized blocks in MCU-interleaved order per component stream
    n_comp = len(planes)
    blocks: list[list[np.ndarray]] = [[] for _ in range(n_comp)]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        f = _fdct(blk)
                        qd = np.floor(f / q.reshape(8, 8) + 0.5).astype(np.int64)
                        blocks[ci].append(qd)

    # gather symbols for table construction (luma tables 0, chroma tables 1)
    tbl_of = [0] + [1] * (n_comp - 1)
    dc_syms: dict[int, set[int]] = {0: set(), 1: set()}
    ac_syms: dict[int, set[int]] = {0: set(), 1: set()}
    preds = [0] * n_comp
    idx = [0] * n_comp
    sym_stream = []  # (comp, dc, acs) in MCU order
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and (my * mcux + mx)
                and (my * mcux + mx) % restart_interval == 0
            ):
                preds = [0] * n_comp
                sym_stream.append(("RST", None, None))
            for ci in range(n_comp):
                sh, sv = samp[ci]
                for _ in range(sh * sv):
                    dc, acs, dcval = _block_symbols(blocks[ci][idx[ci]], preds[ci])
                    preds[ci] = dcval
                    idx[ci] += 1
                    dc_syms[tbl_of[ci]].add(dc[0])
                    for sym, _b, _s in acs:
                        ac_syms[tbl_of[ci]].add(sym)
                    sym_stream.append((ci, dc, acs))

    used_tbls = sorted({tbl_of[ci] for ci in range(n_comp)})
    dc_enc, dc_dht = {}, {}
    ac_enc, ac_dht = {}, {}
    for t in used_tbls:
        dc_enc[t], dc_dht[t] = _fixed_tables(dc_syms[t] or {0})
        ac_enc[t], ac_dht[t] = _fixed_tables(ac_syms[t] or {0})

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if cmyk:
        out += (
            b"\xff\xee"
            + (14).to_bytes(2, "big")
            + b"Adobe"
            + (100).to_bytes(2, "big")
            + bytes(4)
            + bytes([adobe_transform or 0])
        )
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0]) + bytes(
        int(x) for x in qtab
    )
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n_comp])
    for ci in range(n_comp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for t in used_tbls:
        out += b"\xff\xc4" + (len(dc_dht[t]) + 3).to_bytes(2, "big") + bytes(
            [(0 << 4) | t]
        ) + dc_dht[t]
        out += b"\xff\xc4" + (len(ac_dht[t]) + 3).to_bytes(2, "big") + bytes(
            [(1 << 4) | t]
        ) + ac_dht[t]
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")
    sos = bytearray([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, (tbl_of[ci] << 4) | tbl_of[ci]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    bw = _BitWriter()
    rst_n = 0
    for item in sym_stream:
        if item[0] == "RST":
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst_n % 8)])
            rst_n += 1
            continue
        ci, dc, acs = item
        t = tbl_of[ci]
        code, ln = dc_enc[t][dc[0]]
        bw.write(code, ln)
        if dc[2]:
            bw.write(dc[1], dc[2])
        for sym, bits_, s in acs:
            code, ln = ac_enc[t][sym]
            bw.write(code, ln)
            if s:
                bw.write(bits_, s)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------- progressive

_DEFAULT_SCRIPT_3 = [
    # the classic jpeg_simple_progression script (cjpeg): interleaved DC
    # first pass, low-band luma, full-band chroma, high-band luma, then
    # one successive-approximation refinement ladder for everything
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_DEFAULT_SCRIPT_1 = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _prog_grids(img, quant, subsample):
    """Per-component PADDED block grids of zigzag-ordered quantized
    coefficients — the progressive encoder's working form. Mirrors
    encode_jpeg's color/subsample/pad pipeline."""
    img = np.asarray(img, dtype=np.float64)
    grey = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full(64, quant, dtype=np.int32) if np.isscalar(quant) else np.asarray(
        quant, dtype=np.int32
    )
    qtab = q.reshape(8, 8)[np.unravel_index(ZIGZAG, (8, 8))]

    if grey:
        planes = [img]
        samp = [(1, 1)]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(p):
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), "edge")
                return (
                    ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]
                ) / 4.0
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    grids = []
    for p, (sh, sv) in zip(planes, samp):
        tw, th = mcux * sh * 8, mcuy * sv * 8
        pp = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), "edge")
        bh, bw_ = th // 8, tw // 8
        grid = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = _fdct(blk)
                qd = np.floor(f / q.reshape(8, 8) + 0.5).astype(np.int64)
                grid[by, bx] = [int(qd.flat[ZIGZAG[k]]) for k in range(64)]
        grids.append(grid)
    return h, w, samp, qtab, grids, hmax, vmax, mcux, mcuy


class _ProgScanEncoder:
    """One progressive scan, run twice: pass 1 collects huffman symbols
    (emit=None), pass 2 writes bits. Implements cjpeg's EOB-run and
    refinement-correction-bit buffering (cjphuff.c semantics)."""

    def __init__(self, enc=None):
        self.enc = enc  # symbol -> (code, length) or None for pass 1
        self.syms: set[int] = set()
        self.bw = _BitWriter()
        self.eobrun = 0
        self.corr: list[int] = []  # buffered correction bits
        self.out = bytearray()

    def sym(self, s: int) -> None:
        self.syms.add(s)
        if self.enc is not None:
            code, ln = self.enc[s]
            self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if self.enc is not None and n:
            self.bw.write(v, n)

    def flush_corr(self) -> None:
        for b in self.corr:
            self.bits(b, 1)
        self.corr = []

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.bits(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        self.flush_corr()

    def restart(self, n: int) -> None:
        self.emit_eobrun()
        if self.enc is not None:
            self.bw.flush()
            self.out += self.bw.out
            self.bw = _BitWriter()
            self.out += bytes([0xFF, 0xD0 + (n % 8)])

    def finish(self) -> bytes:
        self.emit_eobrun()
        if self.enc is not None:
            self.bw.flush()
            self.out += self.bw.out
        return bytes(self.out)


def _prog_dc_first(se_, zz, pred, al):
    diff = (int(zz[0]) >> al) - pred
    t, bits_ = _magnitude(diff)
    se_.sym(t)
    se_.bits(bits_, t)
    return int(zz[0]) >> al


def _prog_dc_refine(se_, zz, al):
    se_.bits((int(zz[0]) >> al) & 1, 1)


def _prog_ac_first(se_, zz, ss, s_end, al):
    # point transform: |v| >> Al, re-signed (T.81 G.1.2.1)
    vals = [0] * 64
    for k in range(ss, s_end + 1):
        v = int(zz[k])
        t = abs(v) >> al
        vals[k] = -t if v < 0 else t
    last = 0
    for k in range(ss, s_end + 1):
        if vals[k] != 0:
            last = k
    if all(vals[k] == 0 for k in range(ss, s_end + 1)):
        se_.eobrun += 1
        if se_.eobrun == 0x7FFF:
            se_.emit_eobrun()
        return
    se_.emit_eobrun()
    run = 0
    for k in range(ss, last + 1):
        if vals[k] == 0:
            run += 1
            continue
        while run > 15:
            se_.sym(0xF0)
            run -= 16
        t, bits_ = _magnitude(vals[k])
        se_.sym((run << 4) | t)
        se_.bits(bits_, t)
        run = 0
    if last < s_end:
        se_.eobrun += 1
        if se_.eobrun == 0x7FFF:
            se_.emit_eobrun()


def _prog_ac_refine(se_, zz, ss, s_end, al):
    # cjphuff.c encode_mcu_AC_refine
    absv = [0] * 64
    eob = 0
    for k in range(ss, s_end + 1):
        t = abs(int(zz[k])) >> al
        absv[k] = t
        if t == 1:
            eob = k  # last NEWLY-nonzero coefficient
    r = 0
    br: list[int] = []
    for k in range(ss, s_end + 1):
        temp = absv[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            se_.emit_eobrun()
            se_.sym(0xF0)
            r -= 16
            for b in br:
                se_.bits(b, 1)
            br = []
        if temp > 1:
            # previously-nonzero: buffer its correction bit
            br.append(temp & 1)
            continue
        # newly-nonzero (temp == 1)
        se_.emit_eobrun()
        se_.sym((r << 4) | 1)
        se_.bits(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            se_.bits(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        se_.eobrun += 1
        se_.corr.extend(br)
        if se_.eobrun == 0x7FFF or len(se_.corr) > 900:
            se_.emit_eobrun()


def encode_jpeg_progressive(
    img: np.ndarray,
    quant: int | np.ndarray = 8,
    subsample: bool = False,
    restart_interval: int = 0,
    script: list | None = None,
) -> bytes:
    """Encode as a PROGRESSIVE (SOF2) JFIF byte string: spectral
    selection + successive approximation over the same quantized
    coefficients as :func:`encode_jpeg` — so a progressive decode must
    match the baseline decode of the same image EXACTLY. ``script`` is
    a list of ``(comp_indices, Ss, Se, Ah, Al)``; default is the cjpeg
    jpeg_simple_progression ladder."""
    h, w, samp, qtab, grids, hmax, vmax, mcux, mcuy = _prog_grids(
        img, quant, subsample
    )
    n_comp = len(grids)
    if script is None:
        script = _DEFAULT_SCRIPT_3 if n_comp == 3 else _DEFAULT_SCRIPT_1

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0]) + bytes(
        int(x) for x in qtab
    )
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n_comp])
    for ci in range(n_comp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof  # SOF2
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big") + restart_interval.to_bytes(2, "big")

    def used_blocks(ci):
        sh, sv = samp[ci]
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        return -(-cw // 8), -(-ch // 8)

    for comps_idx, ss, s_end, ah, al in script:
        dc_scan = ss == 0

        def run_scan(enc):
            se_ = _ProgScanEncoder(enc)
            preds = {ci: 0 for ci in comps_idx}
            rst_n = 0
            if dc_scan and len(comps_idx) > 1:
                units = mcux * mcuy
                for m in range(units):
                    if restart_interval and m and m % restart_interval == 0:
                        se_.restart(rst_n)
                        rst_n += 1
                        preds = {ci: 0 for ci in comps_idx}
                    my, mx = m // mcux, m % mcux
                    for ci in comps_idx:
                        sh, sv = samp[ci]
                        for v in range(sv):
                            for hh in range(sh):
                                zz = grids[ci][my * sv + v, mx * sh + hh]
                                if ah == 0:
                                    preds[ci] = _prog_dc_first(se_, zz, preds[ci], al)
                                else:
                                    _prog_dc_refine(se_, zz, al)
            else:
                ci = comps_idx[0]
                bw_u, bh_u = used_blocks(ci)
                for m in range(bw_u * bh_u):
                    if restart_interval and m and m % restart_interval == 0:
                        se_.restart(rst_n)
                        rst_n += 1
                        preds = {ci: 0 for ci in comps_idx}
                    zz = grids[ci][m // bw_u, m % bw_u]
                    if dc_scan:
                        if ah == 0:
                            preds[ci] = _prog_dc_first(se_, zz, preds[ci], al)
                        else:
                            _prog_dc_refine(se_, zz, al)
                    elif ah == 0:
                        _prog_ac_first(se_, zz, ss, s_end, al)
                    else:
                        _prog_ac_refine(se_, zz, ss, s_end, al)
            data = se_.finish()
            return se_.syms, data

        syms, _ = run_scan(None)
        needs_table = not (dc_scan and ah != 0)  # DC refine is raw bits
        tbl_id = 0
        if needs_table:
            enc, dht = _fixed_tables(syms or {0})
            tc = 0 if dc_scan else 1
            out_dht = b"\xff\xc4" + (len(dht) + 3).to_bytes(2, "big") + bytes(
                [(tc << 4) | tbl_id]
            ) + dht
            out += out_dht
            _, data = run_scan(enc)
        else:
            _, data = run_scan({})

        sos = bytearray([len(comps_idx)])
        for ci in comps_idx:
            td = tbl_id if dc_scan else 0
            ta = 0 if dc_scan else tbl_id
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, s_end, (ah << 4) | al])
        out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        out += data
    out += b"\xff\xd9"
    return bytes(out)

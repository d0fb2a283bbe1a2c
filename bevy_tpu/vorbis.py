"""Ogg/Vorbis decoder, from scratch in Python+numpy (reference twin:
bevy_audio's symphonia/lewton vorbis feature — the DEFAULT bevy audio
format, `bevy_audio/src/audio_source.rs` extension list).

Host-side decode (SURVEY §2.7 maps rodio/cpal → host), load-time cost:
the hot path is the IMDCT, done as one precomputed cosine-matrix matmul
per block size — numpy SGEMM decodes minutes of audio in seconds.

Scope: the full Vorbis I spec as used by real encoders — codebooks
(Huffman + VQ lookup types 1/2), floor type 1, residue types 0/1/2,
channel coupling (square polar), long/short block window overlap.
Floor type 0 (legacy, unused by libvorbis for ~20 years) parses but
raises at decode.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# Ogg container
# --------------------------------------------------------------------------

def ogg_packets(data: bytes):
    """Yield (packet_bytes, granule_of_page_it_ends_on). Packets are
    reassembled across pages via lacing values (continuation flag)."""
    pos = 0
    partial = b""
    while pos < len(data):
        idx = data.find(b"OggS", pos)
        if idx < 0:
            break
        if idx + 27 > len(data):
            break
        (ver, htype, granule, serial, seq, crc, nsegs) = struct.unpack(
            "<BBqIIIB", data[idx + 4:idx + 27])
        seg_table = data[idx + 27:idx + 27 + nsegs]
        body = idx + 27 + nsegs
        if not (htype & 0x1):
            partial = b""           # fresh page: drop stale continuation
        off = 0
        for i, lace in enumerate(seg_table):
            partial += data[body + off:body + off + lace]
            off += lace
            if lace < 255:
                yield partial, granule
                partial = b""
        pos = body + off


class Bits:
    """Vorbis bit reader: LSB-first within each byte."""

    __slots__ = ("d", "pos", "n")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0                 # bit cursor
        self.n = len(d) * 8

    def read(self, bits: int) -> int:
        if bits == 0:
            return 0
        if self.pos + bits > self.n:
            raise EOFError("vorbis: out of packet bits")
        out = 0
        got = 0
        d, p = self.d, self.pos
        while got < bits:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, bits - got)
            out |= ((byte >> (p & 7)) & ((1 << take) - 1)) << got
            got += take
            p += take
        self.pos = p
        return out

    def flag(self) -> bool:
        return bool(self.read(1))


def ilog(x: int) -> int:
    """Number of bits needed for x (spec ilog: ilog(0)=0, ilog(1)=1)."""
    r = 0
    while x > 0:
        r += 1
        x >>= 1
    return r


def float32_unpack(x: int) -> float:
    mant = x & 0x1FFFFF
    if x & 0x80000000:
        mant = -mant
    exp = (x & 0x7FE00000) >> 21
    return float(mant) * (2.0 ** (exp - 788))


# --------------------------------------------------------------------------
# Codebooks
# --------------------------------------------------------------------------

class Codebook:
    """Huffman scalar decode + optional VQ vector lookup. The Huffman
    tree is a flat two-array structure (node -> child) for speed."""

    def __init__(self, br: Bits):
        if br.read(24) != 0x564342:
            raise ValueError("vorbis: bad codebook sync")
        self.dims = br.read(16)
        entries = br.read(24)
        lengths = np.zeros(entries, np.int32)
        if not br.flag():                      # unordered
            sparse = br.flag()
            for i in range(entries):
                if sparse:
                    if br.flag():
                        lengths[i] = br.read(5) + 1
                    else:
                        lengths[i] = 0         # unused entry
                else:
                    lengths[i] = br.read(5) + 1
        else:                                  # ordered
            cur_len = br.read(5) + 1
            i = 0
            while i < entries:
                num = br.read(ilog(entries - i))
                lengths[i:i + num] = cur_len
                i += num
                cur_len += 1
        self._build_tree(lengths)

        self.lookup = br.read(4)
        if self.lookup not in (0, 1, 2):
            raise ValueError(f"vorbis: bad lookup type {self.lookup}")
        if self.lookup:
            minv = float32_unpack(br.read(32))
            delta = float32_unpack(br.read(32))
            vbits = br.read(4) + 1
            seq_p = br.flag()
            if self.lookup == 1:
                lv = _book_maptype1_quantvals(entries, self.dims)
            else:
                lv = entries * self.dims
            mults = np.asarray([br.read(vbits) for _ in range(lv)],
                               np.float64)
            if self.lookup == 1:
                # value j of entry e: mults[(e // lv^j) % lv]
                idx = np.arange(entries, dtype=np.int64)[:, None]
                divs = lv ** np.arange(self.dims, dtype=np.int64)[None, :]
                table = mults[(idx // divs) % lv] * delta + minv
                if seq_p:
                    table = np.cumsum(table, axis=1)
            else:
                table = (mults.reshape(entries, self.dims) * delta + minv)
                if seq_p:
                    table = np.cumsum(table, axis=1)
            self.vectors = table.astype(np.float32)
        else:
            self.vectors = None

    def _build_tree(self, lengths):
        """Canonical Vorbis Huffman assignment (first-fit, MSB-first
        codewords), flattened to arrays node*2+bit -> child (negative =
        leaf entry - 1 offset by -1)."""
        # assign codewords: the spec's incremental first-available
        available = [0] * 33
        codes = {}
        first = True
        for entry, ln in enumerate(lengths):
            ln = int(ln)
            if ln == 0:
                continue
            if first:
                codes[entry] = (0, ln)
                for j in range(1, ln + 1):
                    available[j] = 1 << (32 - j)
                first = False
                continue
            # find first available branch at depth <= ln
            for j in range(ln, 0, -1):
                if available[j]:
                    break
            else:
                raise ValueError("vorbis: overspecified huffman tree")
            code32 = available[j]
            available[j] = 0
            codes[entry] = (code32 >> (32 - ln), ln)
            for k in range(j + 1, ln + 1):
                available[k] = code32 | (1 << (32 - k))
        # single-entry codebook edge case: 1-bit code 0
        if len(codes) == 1:
            e = next(iter(codes))
            codes[e] = (0, 1)
        # flatten to a binary trie
        nodes = [[0, 0]]
        for entry, (code, ln) in codes.items():
            cur = 0
            for b in range(ln - 1, -1, -1):
                bit = (code >> b) & 1
                nxt = nodes[cur][bit]
                if b == 0:
                    nodes[cur][bit] = -(entry + 1)
                elif nxt == 0:
                    nodes.append([0, 0])
                    nodes[cur][bit] = len(nodes) - 1
                    cur = len(nodes) - 1
                elif nxt < 0:
                    raise ValueError("vorbis: huffman prefix clash")
                else:
                    cur = nxt
        self.tree = nodes

    def decode_scalar(self, br: Bits) -> int:
        cur = 0
        tree = self.tree
        while True:
            cur = tree[cur][br.read(1)]
            if cur < 0:
                return -cur - 1
            if cur == 0:
                raise ValueError("vorbis: invalid huffman code")

    def decode_vector(self, br: Bits) -> np.ndarray:
        return self.vectors[self.decode_scalar(br)]


def _book_maptype1_quantvals(entries: int, dims: int) -> int:
    """Largest integer v with v**dims <= entries (spec lookup1_values)."""
    if dims == 0:
        return 0
    v = int(entries ** (1.0 / dims))
    while (v + 1) ** dims <= entries:
        v += 1
    while v ** dims > entries:
        v -= 1
    return v


# --------------------------------------------------------------------------
# Floors / residues / mappings / modes (setup structs)
# --------------------------------------------------------------------------

class Floor1:
    def __init__(self, br: Bits):
        partitions = br.read(5)
        self.partition_classes = [br.read(4) for _ in range(partitions)]
        maxc = max(self.partition_classes, default=-1)
        self.class_dims = []
        self.class_subs = []
        self.class_master = []
        self.sub_books = []
        for _ in range(maxc + 1):
            dims = br.read(3) + 1
            subs = br.read(2)
            self.class_dims.append(dims)
            self.class_subs.append(subs)
            self.class_master.append(br.read(8) if subs else 0)
            self.sub_books.append(
                [br.read(8) - 1 for _ in range(1 << subs)])
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for pc in self.partition_classes:
            xs += [br.read(rangebits) for _ in range(self.class_dims[pc])]
        self.x_list = np.asarray(xs, np.int64)
        self.sorted_idx = np.argsort(self.x_list, kind="stable")

    def decode(self, br: Bits, books) -> np.ndarray | None:
        """Returns the Y vector (unsynthesized) or None (unused floor)."""
        if not br.flag():
            return None
        rng = [256, 128, 84, 64][self.multiplier - 1]
        ybits = ilog(rng - 1)
        ys = [br.read(ybits), br.read(ybits)]
        for pc in self.partition_classes:
            cdim = self.class_dims[pc]
            cbits = self.class_subs[pc]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.class_master[pc]].decode_scalar(br)
            for _ in range(cdim):
                book = self.sub_books[pc][cval & csub]
                cval >>= cbits
                if book >= 0:
                    ys.append(books[book].decode_scalar(br))
                else:
                    ys.append(0)
        return np.asarray(ys, np.int64)

    def synthesize(self, ys, n2: int) -> np.ndarray:
        """Piecewise curve -> linear amplitude floor over n2 bins
        (spec §7.2.4: step2 flags, render_line in sorted x order)."""
        rng = [256, 128, 86, 64][self.multiplier - 1]
        npts = len(self.x_list)
        step2 = np.zeros(npts, bool)
        step2[:2] = True
        final_y = np.zeros(npts, np.int64)
        final_y[0] = ys[0]
        final_y[1] = ys[1]
        for i in range(2, npts):
            lo = _low_neighbor(self.x_list, i)
            hi = _high_neighbor(self.x_list, i)
            pred = _render_point(self.x_list[lo], final_y[lo],
                                 self.x_list[hi], final_y[hi],
                                 self.x_list[i])
            val = int(ys[i])
            hiroom = rng - pred
            loroom = pred
            room = 2 * min(hiroom, loroom)
            if val:
                step2[lo] = True
                step2[hi] = True
                step2[i] = True
                if val >= room:
                    if hiroom > loroom:
                        final_y[i] = val - loroom + pred
                    else:
                        final_y[i] = pred - (val - hiroom) - 1
                elif val & 1:
                    final_y[i] = pred - ((val + 1) >> 1)
                else:
                    final_y[i] = pred + (val >> 1)
            else:
                step2[i] = False
                final_y[i] = pred
        final_y = np.clip(final_y, 0, rng - 1)
        # render in sorted-x order, only step2 points anchor segments
        sx = self.sorted_idx
        xs = self.x_list[sx]
        yv = final_y[sx]
        st = step2[sx]
        curve = np.zeros(n2, np.float32)
        lx = 0
        ly = int(yv[0]) * self.multiplier
        hy = ly
        for k in range(1, npts):
            if not st[k]:
                continue
            hx = int(xs[k])
            hy = int(yv[k]) * self.multiplier
            if lx < n2:
                _render_line(lx, ly, min(hx, n2), hy, curve)
            lx, ly = hx, hy
        if lx < n2:
            curve[lx:] = hy
        amp = _INVERSE_DB[np.clip(curve.astype(np.int64), 0, 255)]
        return amp


def _low_neighbor(xs, i):
    best = 0
    for j in range(i):
        if xs[j] < xs[i] and (xs[best] >= xs[i] or xs[j] > xs[best]):
            best = j
    return best


def _high_neighbor(xs, i):
    best = -1
    for j in range(i):
        if xs[j] > xs[i] and (best < 0 or xs[j] < xs[best]):
            best = j
    return best


def _render_point(x0, y0, x1, y1, x):
    dy = int(y1) - int(y0)
    adx = int(x1) - int(x0)
    err = abs(dy) * (int(x) - int(x0))
    off = err // adx if adx else 0
    return int(y0) + (-off if dy < 0 else off)


def _render_line(x0, y0, x1, y1, out):
    """Integer line render matching the spec's err-accumulator (division
    truncates toward zero, hence the abs/sign split)."""
    dy = y1 - y0
    adx = x1 - x0
    if adx <= 0 or x0 >= len(out):
        return
    xs = np.arange(x0, min(x1, len(out)))
    q = (abs(dy) * (xs - x0)) // adx
    out[xs] = y0 + (-q if dy < 0 else q)


# closed form of the spec's floor1_inverse_dB_table (256 entries,
# table[255] = 1.0, table[0] = 1.0649863e-07; exact exponential ramp)
_INVERSE_DB = np.exp(
    (np.arange(256) - 255) * (np.log(1.0649863e-07) / -255.0)
).astype(np.float32)


class Residue:
    def __init__(self, br: Bits, rtype: int):
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.psize = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        cascades = []
        for _ in range(self.classifications):
            low = br.read(3)
            high = br.read(5) if br.flag() else 0
            cascades.append((high << 3) | low)
        self.books = []
        for c in cascades:
            row = []
            for p in range(8):
                row.append(br.read(8) if (c & (1 << p)) else -1)
            self.books.append(row)

    def decode(self, br: Bits, books, do_not_decode, n2: int):
        """Decode ch vectors of length n2. Returns (ch, n2) float32."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            if all(do_not_decode):
                return np.zeros((ch, n2), np.float32)
            v = self._decode_core(br, books, [False], ch * n2)
            # deinterleave
            return v.reshape(n2, ch).T.astype(np.float32, copy=False)
        out = self._decode_core_multi(br, books, do_not_decode, n2)
        return out

    def _decode_core_multi(self, br, books, dnd, n2):
        ch = len(dnd)
        out = np.zeros((ch, n2), np.float32)
        begin = min(self.begin, n2)
        end = min(self.end, n2)
        if end <= begin:
            return out
        nparts = (end - begin) // self.psize
        cbook = books[self.classbook]
        cwords = cbook.dims
        classifs = np.zeros((ch, nparts + cwords), np.int64)
        for p in range(8):
            part = 0
            while part < nparts:
                if p == 0:
                    for j in range(ch):
                        if dnd[j]:
                            continue
                        temp = cbook.decode_scalar(br)
                        for k in range(cwords - 1, -1, -1):
                            classifs[j, part + k] = \
                                temp % self.classifications
                            temp //= self.classifications
                for k in range(cwords):
                    if part >= nparts:
                        break
                    for j in range(ch):
                        if dnd[j]:
                            part_ = part  # noqa
                            continue
                        c = classifs[j, part]
                        book = self.books[c][p]
                        if book >= 0:
                            self._partition(br, books[book],
                                            out[j], begin +
                                            part * self.psize)
                    part += 1
        return out

    def _decode_core(self, br, books, dnd, total):
        """Type-2 single interleaved vector decode (type-1 inner loop)."""
        out = np.zeros(total, np.float32)
        begin = min(self.begin, total)
        end = min(self.end, total)
        if end <= begin:
            return out
        nparts = (end - begin) // self.psize
        cbook = books[self.classbook]
        cwords = cbook.dims
        classifs = np.zeros(nparts + cwords, np.int64)
        for p in range(8):
            part = 0
            while part < nparts:
                if p == 0:
                    temp = cbook.decode_scalar(br)
                    for k in range(cwords - 1, -1, -1):
                        classifs[part + k] = temp % self.classifications
                        temp //= self.classifications
                for k in range(cwords):
                    if part >= nparts:
                        break
                    c = classifs[part]
                    book = self.books[c][p]
                    if book >= 0:
                        self._partition(br, books[book], out,
                                        begin + part * self.psize)
                    part += 1
        return out

    def _partition(self, br, book, v, offset):
        if self.rtype == 0:
            step = self.psize // book.dims
            for i in range(step):
                vec = book.decode_vector(br)
                v[offset + i:offset + i + step * book.dims:step] += vec
        else:                                   # types 1 and 2
            i = 0
            while i < self.psize:
                vec = book.decode_vector(br)
                v[offset + i:offset + i + book.dims] += vec
                i += book.dims


# --------------------------------------------------------------------------
# Stream setup + packet decode
# --------------------------------------------------------------------------

class VorbisSetup:
    pass


def _parse_headers(packets):
    setup = VorbisSetup()
    ident = next(packets)[0]
    br = Bits(ident)
    if br.read(8) != 1 or ident[1:7] != b"vorbis":
        raise ValueError("vorbis: bad identification header")
    br = Bits(ident[7:])
    if br.read(32) != 0:
        raise ValueError("vorbis: unsupported version")
    setup.channels = br.read(8)
    setup.rate = br.read(32)
    br.read(32)
    br.read(32)
    br.read(32)
    setup.bs0 = 1 << br.read(4)
    setup.bs1 = 1 << br.read(4)

    next(packets)                              # comment header: skip

    sp = next(packets)[0]
    if sp[0] != 5 or sp[1:7] != b"vorbis":
        raise ValueError("vorbis: bad setup header")
    br = Bits(sp[7:])
    setup.books = [Codebook(br) for _ in range(br.read(8) + 1)]
    for _ in range(br.read(6) + 1):            # time domain (unused)
        if br.read(16) != 0:
            raise ValueError("vorbis: bad time domain")
    setup.floors = []
    for _ in range(br.read(6) + 1):
        ftype = br.read(16)
        if ftype == 1:
            setup.floors.append(Floor1(br))
        elif ftype == 0:
            raise ValueError("vorbis: floor type 0 (legacy) unsupported")
        else:
            raise ValueError(f"vorbis: bad floor type {ftype}")
    setup.residues = []
    for _ in range(br.read(6) + 1):
        rtype = br.read(16)
        if rtype > 2:
            raise ValueError(f"vorbis: bad residue type {rtype}")
        setup.residues.append(Residue(br, rtype))
    setup.mappings = []
    ch = setup.channels
    for _ in range(br.read(6) + 1):
        if br.read(16) != 0:
            raise ValueError("vorbis: bad mapping type")
        m = VorbisSetup()
        m.submaps = br.read(4) + 1 if br.flag() else 1
        m.coupling = []
        if br.flag():
            steps = br.read(8) + 1
            for _ in range(steps):
                mag = br.read(ilog(ch - 1))
                ang = br.read(ilog(ch - 1))
                m.coupling.append((mag, ang))
        if br.read(2) != 0:
            raise ValueError("vorbis: bad mapping reserved bits")
        if m.submaps > 1:
            m.mux = [br.read(4) for _ in range(ch)]
        else:
            m.mux = [0] * ch
        m.submap_floor = []
        m.submap_residue = []
        for _ in range(m.submaps):
            br.read(8)
            m.submap_floor.append(br.read(8))
            m.submap_residue.append(br.read(8))
        setup.mappings.append(m)
    setup.modes = []
    for _ in range(br.read(6) + 1):
        blockflag = br.flag()
        if br.read(16) != 0 or br.read(16) != 0:
            raise ValueError("vorbis: bad mode transform")
        mapping = br.read(8)
        setup.modes.append((blockflag, mapping))
    if not br.flag():
        raise ValueError("vorbis: bad setup framing bit")
    return setup


class _Imdct:
    """IMDCT via a precomputed cosine matrix per block size (SGEMM)."""

    def __init__(self):
        self.mats = {}

    def __call__(self, spectra: np.ndarray, n: int) -> np.ndarray:
        """spectra (B, n/2) -> time (B, n)."""
        if n not in self.mats:
            n2 = n // 2
            k = np.arange(n2, dtype=np.float64)[None, :]
            j = np.arange(n, dtype=np.float64)[:, None]
            self.mats[n] = np.cos(
                (2.0 * np.pi / n) * (j + 0.5 + n2 / 2.0) * (k + 0.5)
            ).astype(np.float32)
        return spectra @ self.mats[n].T


def _vorbis_window(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return np.sin(0.5 * np.pi *
                  np.sin(np.pi / n * (i + 0.5)) ** 2).astype(np.float32)


def decode_vorbis(path):
    """Decode an .ogg Vorbis file → (samples (N, ch) float32 in [-1,1],
    sample_rate)."""
    data = open(path, "rb").read()
    packets = ogg_packets(data)
    setup = _parse_headers(packets)
    ch = setup.channels
    bs0, bs1 = setup.bs0, setup.bs1
    imdct = _Imdct()
    win = {bs0: _vorbis_window(bs0), bs1: _vorbis_window(bs1)}
    n_modes = len(setup.modes)
    mode_bits = ilog(n_modes - 1)

    out = []
    acc = None                # rolling overlap-add buffer (ch, len)
    acc_pos = 0               # global sample index of acc[:, 0]
    pos = 0                   # global position of the last block
    flushed = 0               # everything before this index is emitted
    prev_n = 0
    total_granule = -1
    for pkt, granule in packets:
        if not pkt or (pkt[0] & 1):
            continue                           # not an audio packet
        try:
            br = Bits(pkt)
            if br.flag():
                continue
            mode = setup.modes[br.read(mode_bits)] if mode_bits else \
                setup.modes[0]
            blockflag, map_idx = mode
            n = bs1 if blockflag else bs0
            if blockflag:
                long_prev = br.flag()
                long_next = br.flag()
            else:
                long_prev = long_next = True
            mapping = setup.mappings[map_idx]

            # ---- floors ----
            floor_ys = []
            no_residue = []
            for c in range(ch):
                fl = setup.floors[mapping.submap_floor[mapping.mux[c]]]
                ys = fl.decode(br, setup.books)
                floor_ys.append(ys)
                no_residue.append(ys is None)
            # coupling revives paired channels
            for mag, ang in mapping.coupling:
                if not (no_residue[mag] and no_residue[ang]):
                    no_residue[mag] = no_residue[ang] = False

            # ---- residues (per submap) ----
            n2 = n // 2
            spectra = np.zeros((ch, n2), np.float32)
            for s in range(mapping.submaps):
                idxs = [c for c in range(ch) if mapping.mux[c] == s]
                dnd = [no_residue[c] for c in idxs]
                res = setup.residues[mapping.submap_residue[s]]
                dec = res.decode(br, setup.books, dnd, n2)
                for row, c in enumerate(idxs):
                    spectra[c] = dec[row]

            # ---- inverse coupling (square polar, reverse order;
            #      spec §4.3.5.2) ----
            for mag, ang in reversed(mapping.coupling):
                m = spectra[mag].copy()
                a = spectra[ang].copy()
                spectra[mag] = np.where(
                    m > 0, np.where(a > 0, m, m + a),
                    np.where(a > 0, m, m - a))
                spectra[ang] = np.where(
                    m > 0, np.where(a > 0, m - a, m),
                    np.where(a > 0, m + a, m))

            # ---- floor curve multiply ----
            for c in range(ch):
                if floor_ys[c] is None:
                    spectra[c] = 0.0
                    continue
                fl = setup.floors[mapping.submap_floor[mapping.mux[c]]]
                spectra[c] *= fl.synthesize(floor_ys[c], n2)

            # ---- IMDCT + window (slopes shrink to the short size when
            #      a neighbor is short; spec §4.3.1 window shape) ----
            t = imdct(spectra, n)              # (ch, n)
            w = np.ones(n, np.float32)
            if blockflag and not long_prev:
                ls0 = n // 4 - bs0 // 4
                w[:ls0] = 0.0
                w[ls0:ls0 + bs0 // 2] = win[bs0][:bs0 // 2]
            else:
                w[:n // 2] = win[n][:n // 2]
            if blockflag and not long_next:
                rs0 = 3 * n // 4 - bs0 // 4
                w[rs0:rs0 + bs0 // 2] = win[bs0][bs0 // 2:]
                w[rs0 + bs0 // 2:] = 0.0
            else:
                w[n // 2:] = win[n][n // 2:]
            t = t * w[None, :]

            # ---- overlap-add on a global timeline: consecutive block
            #      positions advance by 3*n_prev/4 - n_cur/4 so the
            #      right slope of one block lands exactly on the left
            #      slope of the next (equal sizes -> the familiar 50%
            #      lap). Samples before the new block's center are
            #      final and flush to the output. ----
            if prev_n == 0:
                acc = t.copy()
                acc_pos = 0
                pos = 0
                flushed = n // 2               # first frame: no output
            else:
                cur_pos = pos + 3 * prev_n // 4 - n // 4
                need = cur_pos + n - acc_pos
                if need > acc.shape[1]:
                    acc = np.concatenate(
                        [acc, np.zeros((ch, need - acc.shape[1]),
                                       np.float32)], axis=1)
                off = cur_pos - acc_pos
                tt = t
                if off < 0:                    # long-after-short: the
                    tt = t[:, -off:]           # clipped part is zeros
                    off = 0
                acc[:, off:off + tt.shape[1]] += tt
                flush_to = cur_pos + n // 2
                if flush_to > flushed:
                    out.append(
                        acc[:, flushed - acc_pos:flush_to - acc_pos]
                        .copy())
                    acc = acc[:, flush_to - acc_pos:]
                    acc_pos = flush_to
                    flushed = flush_to
                pos = cur_pos
            prev_n = n
            if granule >= 0:
                total_granule = granule
        except EOFError:
            continue

    if not out:
        return np.zeros((0, ch), np.float32), setup.rate
    pcm = np.concatenate(out, axis=1).T        # (N, ch)
    if 0 < total_granule < pcm.shape[0]:
        pcm = pcm[:total_granule]
    return np.clip(pcm, -1.0, 1.0), setup.rate

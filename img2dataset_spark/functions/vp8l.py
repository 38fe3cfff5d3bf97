"""VP8L (lossless WebP) codec, from the public WebP Lossless Bitstream
Specification (RFC 9649) — no imaging library.

Closes the last reference-format gap the repo can close honestly: the
reference accepts webp everywhere (/root/reference/img2dataset/
resizer.py:143-148, main.py:86) and delegated pixels to cv2.  Lossy VP8
is a video intra codec and stays behind the PIL gate
(functions/image.py); VP8L is a self-contained lossless format and is
implemented here in full:

  decode: RIFF walk (plain 'VP8L' or inside a 'VP8X' extended file),
    LSB-first bit reading, simple + complex (code-length-coded) prefix
    codes, optional color cache, meta prefix-code image, LZ77 over ARGB
    with the 120-entry near-distance plane mapping, and all four inverse
    transforms (predictor ×14 modes, color transform, subtract-green,
    color indexing incl. sub-byte pixel packing).

  encode: a real (small) encoder used both as a public feature and as
    the spec-roundtrip fixture generator: literals with canonical
    prefix codes, optional subtract-green, optional color cache,
    optional distance-1 RLE backward references, optional near-distance
    plane codes.  It emits only spec-valid streams; the decoder never
    special-cases its output.

Bit conventions (spec §"RIFF header" / §"prefix coding"): scalar fields
are read LSB-first from the byte stream; prefix codes are read one bit
at a time with the FIRST bit as the most significant bit of the
canonical code.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# distance plane-code map (spec §4.2.2): the 120 closest (dx, dy)
# offsets, ordered by squared distance, then larger dy first, then
# smaller |dx|, positive dx before negative.  The cut d² <= 74 yields
# exactly 120 entries; the documented table prefix matches this order
# (pinned in tests).
# ---------------------------------------------------------------------------


def _build_distance_map() -> list[tuple[int, int]]:
    cands = []
    for dy in range(0, 9):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            d2 = dx * dx + dy * dy
            if d2 > 74:
                continue
            cands.append((d2, -dy, abs(dx), 0 if dx > 0 else 1, dx, dy))
    cands.sort()
    out = [(dx, dy) for _, _, _, _, dx, dy in cands]
    assert len(out) == 120
    return out


DISTANCE_MAP: list[tuple[int, int]] = _build_distance_map()
_PLANE_OF_OFFSET = {v: i + 1 for i, v in enumerate(DISTANCE_MAP)}

_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_CACHE_MULT = 0x1E35A7BD


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitReader:
    """LSB-first scalar reads; MSB-first canonical prefix-code reads."""

    __slots__ = ("data", "pos", "nbits", "acc")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # next byte index
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def read_symbol(self, code: "_PrefixCode") -> int:
        if code.single is not None:
            return code.single
        acc = 0
        length = 0
        table = code.table
        maxlen = code.max_length
        while length < maxlen:
            acc = (acc << 1) | self.read(1)
            length += 1
            sym = table.get((length, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:  # LSB-first
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:  # MSB-first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


class _PrefixCode:
    """Decoding table from code lengths: canonical assignment by
    (length asc, symbol asc); `single` marks the spec's 0-bit
    single-symbol code."""

    __slots__ = ("table", "max_length", "single")

    def __init__(self, lengths: list[int]):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise ValueError("empty VP8L prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = {}
            self.max_length = 0
            return
        self.single = None
        used.sort()
        kraft = sum(1 << (15 - l) for l, _ in used)
        if kraft != (1 << 15):
            raise ValueError("invalid VP8L prefix code (not complete)")
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = used[0][0]
        for l, s in used:
            code <<= l - prev_len
            prev_len = l
            table[(l, code)] = s
            code += 1
        self.table = table
        self.max_length = used[-1][0]


def canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    used = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = used[0][0] if used else 0
    for l, s in used:
        code <<= l - prev_len
        prev_len = l
        out[s] = (code, l)
        code += 1
    return out


def huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Optimal length-limited code lengths from a histogram
    (package-merge).  The result is Kraft-complete, as VP8L requires."""
    items = sorted((f, s) for s, f in freqs.items() if f > 0)
    n = len(items)
    if n == 0:
        return {}
    if n == 1:
        return {items[0][1]: 1}
    if (1 << max_len) < n:
        raise ValueError("alphabet too large for depth limit")
    leaves = [(f, (s,)) for f, s in items]
    lst = list(leaves)
    for _ in range(max_len - 1):
        packages = [
            (lst[i][0] + lst[i + 1][0], lst[i][1] + lst[i + 1][1])
            for i in range(0, len(lst) - 1, 2)
        ]
        lst = sorted(leaves + packages)
    lengths: dict[int, int] = {s: 0 for _, s in items}
    for _, syms in lst[: 2 * n - 2]:
        for s in syms:
            lengths[s] += 1
    return lengths


# ---------------------------------------------------------------------------
# prefix-code (de)serialization
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    lengths = [0] * alphabet_size
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _PrefixCode(lengths)
    # complex: code lengths are themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CODE_LENGTH_ORDER):
        raise ValueError("bad VP8L code length count")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_code_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = br.read_symbol(cl_code)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_code_len = code_len
        else:
            if code_len == 16:
                repeat, val = 3 + br.read(2), prev_code_len
            elif code_len == 17:
                repeat, val = 3 + br.read(3), 0
            else:
                repeat, val = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L code length repeat overflow")
            for _ in range(repeat):
                lengths[symbol] = val
                symbol += 1
    return _PrefixCode(lengths)


def _write_prefix_code(bw: _BitWriter, lengths: dict[int, int], alphabet_size: int) -> None:
    """Serialize symbol code lengths; picks the simple form when legal."""
    used = sorted(lengths)
    if len(used) == 1 and used[0] < 256:
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        return
    if (
        len(used) == 2
        and max(used) < 256
        and lengths[used[0]] == 1
        and lengths[used[1]] == 1
    ):
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        bw.write(used[1], 8)
        return
    # complex form: emit one CL symbol per alphabet entry (no repeats —
    # zeros compress via the CL code itself)
    bw.write(0, 1)
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    cl_freq: dict[int, int] = {}
    for v in seq:
        cl_freq[v] = cl_freq.get(v, 0) + 1
    cl_lengths = huffman_lengths(cl_freq, max_len=7)
    if len(cl_lengths) == 1:
        # a CL code needs >= 2 nonzero lengths to be complete; pad with
        # the cheapest unused CL symbol
        pad = 0 if 0 not in cl_lengths else 1
        cl_lengths = {k: 1 for k in cl_lengths}
        cl_lengths[pad] = 1
    bw.write(15, 4)  # num_code_lengths = 19: write all, order-independent
    for sym in _CODE_LENGTH_ORDER:
        bw.write(cl_lengths.get(sym, 0), 3)
    bw.write(0, 1)  # no explicit max_symbol
    cl_codes = canonical_codes([cl_lengths.get(i, 0) for i in range(19)])
    for v in seq:
        c, l = cl_codes[v]
        bw.write_code(c, l)


# ---------------------------------------------------------------------------
# LZ77 prefix values
# ---------------------------------------------------------------------------


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, v - offset, extra


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_entropy_image(br: _BitReader, w: int, h: int) -> list[int]:
    return _decode_image_stream(br, w, h, is_level0=False)


def _decode_image_stream(br: _BitReader, w: int, h: int, is_level0: bool) -> list[int]:
    """Core spec loop: returns ARGB pixels (row-major ints).  When
    is_level0, transforms are read here and applied before returning."""
    transforms = []  # (type, data...), reading order
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                bw_ = (xsize + (1 << bits) - 1) >> bits
                bh_ = (h + (1 << bits) - 1) >> bits
                transforms.append(("pred", bits, _read_entropy_image(br, bw_, bh_)))
            elif ttype == 1:  # color transform
                bits = br.read(3) + 2
                bw_ = (xsize + (1 << bits) - 1) >> bits
                bh_ = (h + (1 << bits) - 1) >> bits
                transforms.append(("color", bits, _read_entropy_image(br, bw_, bh_)))
            elif ttype == 2:  # subtract green
                transforms.append(("subgreen",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                coded = _read_entropy_image(br, n_colors, 1)
                palette = []
                prev = 0
                for p in coded:
                    cur = _add_pixels(prev, p)
                    palette.append(cur)
                    prev = cur
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(("index", width_bits, palette, xsize))
                if width_bits:
                    xsize = (xsize + (1 << width_bits) - 1) >> width_bits

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # meta prefix image (level0 only)
    meta_bits = 0
    meta_image: list[int] | None = None
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_image = _read_entropy_image(br, mw, mh)
        meta_image = [((p >> 8) & 0xFFFF) for p in meta_image]
        n_groups = max(meta_image) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    meta_xsize = (xsize + (1 << meta_bits) - 1) >> meta_bits if meta_image else 0

    n = xsize * h
    pix: list[int] = [0] * n
    pos = 0
    group = groups[0]
    while pos < n:
        if meta_image is not None:
            x, y = pos % xsize, pos // xsize
            group = groups[meta_image[(y >> meta_bits) * meta_xsize + (x >> meta_bits)]]
        g_code, r_code, b_code, a_code, d_code = group
        s = br.read_symbol(g_code)
        if s < 256:
            red = br.read_symbol(r_code)
            blue = br.read_symbol(b_code)
            alpha = br.read_symbol(a_code)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            pos += 1
            if cache_size:
                cache[(_CACHE_MULT * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        elif s < 280:
            length = _prefix_value(s - 256, br)
            plane = _prefix_value(br.read_symbol(d_code), br)
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = DISTANCE_MAP[plane - 1]
                dist = dy * xsize + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                pos += 1
                if cache_size:
                    cache[(_CACHE_MULT * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L color cache index out of range")
            pix[pos] = cache[idx]
            pos += 1

    # inverse transforms, reverse reading order
    for t in reversed(transforms):
        if t[0] == "index":
            _, width_bits, palette, full_w = t
            pix = _apply_inverse_index(pix, xsize, h, width_bits, palette, full_w)
            xsize = full_w
        elif t[0] == "subgreen":
            pix = [_add_green(p) for p in pix]
        elif t[0] == "color":
            pix = _apply_inverse_color(pix, xsize, h, t[1], t[2])
        else:  # pred
            pix = _apply_inverse_predictor(pix, xsize, h, t[1], t[2])
    return pix


def _add_pixels(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | (((a >> 16) + (b >> 16)) & 0xFF) << 16
        | (((a >> 8) + (b >> 8)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _add_green(p: int) -> int:
    g = (p >> 8) & 0xFF
    r = ((p >> 16) + g) & 0xFF
    b = ((p & 0xFF) + g) & 0xFF
    return (p & 0xFF00FF00) | (r << 16) | b


def _apply_inverse_index(
    pix: list[int], packed_w: int, h: int, width_bits: int, palette: list[int], full_w: int
) -> list[int]:
    out = [0] * (full_w * h)
    if width_bits == 0:
        for i, p in enumerate(pix):
            idx = (p >> 8) & 0xFF
            out[i] = palette[idx] if idx < len(palette) else 0
        return out
    per_byte = 1 << width_bits
    bits_each = 8 >> width_bits
    mask = (1 << bits_each) - 1
    for y in range(h):
        for x in range(full_w):
            packed = pix[y * packed_w + (x >> width_bits)]
            green = (packed >> 8) & 0xFF
            idx = (green >> ((x % per_byte) * bits_each)) & mask
            out[y * full_w + x] = palette[idx] if idx < len(palette) else 0
    return out


def _ct_delta(t: int, c: int) -> int:
    # both operands as int8; arithmetic >> 5
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _apply_inverse_color(pix: list[int], w: int, h: int, bits: int, cimg: list[int]) -> list[int]:
    cw = (w + (1 << bits) - 1) >> bits
    out = [0] * len(pix)
    for y in range(h):
        for x in range(w):
            cte = cimg[(y >> bits) * cw + (x >> bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = pix[y * w + x]
            g = (p >> 8) & 0xFF
            r = ((p >> 16) & 0xFF) + _ct_delta(g2r, g)
            r &= 0xFF
            b = (p & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r)
            b &= 0xFF
            out[y * w + x] = (p & 0xFF00FF00) | (r << 16) | b
    return out


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        lc = (l >> sh) & 0xFF
        tc = (t >> sh) & 0xFF
        tlc = (tl >> sh) & 0xFF
        pred = lc + tc - tlc
        p_l += abs(pred - lc)
        p_t += abs(pred - tc)
    return l if p_l < p_t else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _apply_inverse_predictor(
    pix: list[int], w: int, h: int, bits: int, pimg: list[int]
) -> list[int]:
    pw = (w + (1 << bits) - 1) >> bits
    out = [0] * len(pix)
    for pos in range(len(pix)):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = out[pos - 1]
        elif x == 0:
            pred = out[pos - w]
        else:
            mode = (pimg[(y >> bits) * pw + (x >> bits)] >> 8) & 0xFF
            # linear-memory TR: at x == w-1 this is the first pixel of
            # the current row, per spec
            pred = _predict(
                mode, out[pos - 1], out[pos - w], out[pos - w + 1], out[pos - w - 1]
            )
        out[pos] = _add_pixels(pix[pos], pred)
    return out


def decode_vp8l_stream(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Decode a raw VP8L stream (starting at the 0x2F signature).
    ``max_pixels`` bounds the allocation a corrupt header can trigger
    (the 28-bit dimension field allows 16384x16384)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if w * h > max_pixels:
        raise ValueError(f"VP8L image too large ({w}x{h})")
    try:
        pix = _decode_image_stream(br, w, h, is_level0=True)
    except (IndexError, KeyError, OverflowError) as e:
        # corrupt-stream structural failures surface uniformly
        raise ValueError("corrupt VP8L stream") from e
    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), np.uint8)
    rgba[..., 0] = (arr >> 16) & 0xFF
    rgba[..., 1] = (arr >> 8) & 0xFF
    rgba[..., 2] = arr & 0xFF
    rgba[..., 3] = (arr >> 24) & 0xFF
    if (rgba[..., 3] == 255).all():
        return rgba[..., :3].copy()
    return rgba


def decode_webp(data: bytes) -> np.ndarray:
    """Decode a WebP container: lossless ('VP8L', plain or inside a
    'VP8X' extended file) is decoded here; lossy 'VP8 ' raises
    NotImplementedError (video intra codec — PIL/cv2 territory)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(data):
        cc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if cc == b"VP8L":
            return decode_vp8l_stream(payload)
        if cc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise NotImplementedError(
            "lossy WebP (VP8) decode requires an imaging library"
        )
    raise ValueError("WebP container has no image chunk")


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgba_to_argb_list(arr: np.ndarray) -> tuple[list[int], int, int]:
    if arr.ndim == 2:
        arr = np.dstack([arr] * 3)
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        a = np.full((h, w), 255, np.uint32)
    else:
        a = arr[..., 3].astype(np.uint32)
    argb = (
        (a << 24)
        | (arr[..., 0].astype(np.uint32) << 16)
        | (arr[..., 1].astype(np.uint32) << 8)
        | arr[..., 2].astype(np.uint32)
    )
    return [int(v) for v in argb.ravel()], w, h




def _tokenize(
    coded: list[int],
    cache_bits: int,
    use_rle: bool,
) -> list[tuple[str, object]]:
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache: list[int | None] = [None] * cache_size
    tokens: list[tuple[str, object]] = []
    n = len(coded)
    i = 0
    while i < n:
        p = coded[i]
        if use_rle and i > 0 and coded[i - 1] == p:
            run = 1
            while i + run < n and coded[i + run] == p and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("copy", (run, 1)))
                if cache_size:
                    key = (_CACHE_MULT * p & 0xFFFFFFFF) >> (32 - cache_bits)
                    cache[key] = p
                i += run
                continue
        if cache_size:
            key = (_CACHE_MULT * p & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == p:
                tokens.append(("cache", key))
                i += 1
                continue
            cache[key] = p
        tokens.append(("lit", p))
        i += 1
    return tokens


def _token_histograms(tokens, use_plane_codes):
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for kind, payload in tokens:
        if kind == "lit":
            p = payload
            for f, v in (
                (gf, (p >> 8) & 0xFF),
                (rf, (p >> 16) & 0xFF),
                (bf, p & 0xFF),
                (af, (p >> 24) & 0xFF),
            ):
                f[v] = f.get(v, 0) + 1
        elif kind == "copy":
            length, dist = payload
            lcode, _, _ = _prefix_encode(length)
            gf[256 + lcode] = gf.get(256 + lcode, 0) + 1
            plane = _PLANE_OF_OFFSET.get((dist, 0)) if use_plane_codes else None
            if plane is None:
                plane = dist + 120
            dcode, _, _ = _prefix_encode(plane)
            df[dcode] = df.get(dcode, 0) + 1
        else:
            gf[280 + payload] = gf.get(280 + payload, 0) + 1
    for f in (rf, bf, af, df):
        if not f:
            f[0] = 1
    if not gf:
        gf[0] = 1
    return gf, rf, bf, af, df


def _write_group_codes(bw, hists, cache_size):
    gf, rf, bf, af, df = hists
    lens = (
        huffman_lengths(gf),
        huffman_lengths(rf),
        huffman_lengths(bf),
        huffman_lengths(af),
        huffman_lengths(df),
    )
    for lengths, alpha in zip(lens, (256 + 24 + cache_size, 256, 256, 256, 40)):
        _write_prefix_code(bw, lengths, alpha)
    return tuple(
        canonical_codes([l.get(i, 0) for i in range(alpha)])
        for l, alpha in zip(lens, (256 + 24 + cache_size, 256, 256, 256, 40))
    )


def _emit_tokens(bw, tokens, codes, use_plane_codes):
    g_codes, r_codes, b_codes, a_codes, d_codes = codes

    def emit(cd, sym):
        if len(cd) == 1:
            return  # single-symbol 0-bit code
        c, l = cd[sym]
        bw.write_code(c, l)

    for kind, payload in tokens:
        if kind == "lit":
            p = payload
            emit(g_codes, (p >> 8) & 0xFF)
            emit(r_codes, (p >> 16) & 0xFF)
            emit(b_codes, p & 0xFF)
            emit(a_codes, (p >> 24) & 0xFF)
        elif kind == "copy":
            length, dist = payload
            lcode, lev, leb = _prefix_encode(length)
            emit(g_codes, 256 + lcode)
            bw.write(lev, leb)
            plane = _PLANE_OF_OFFSET.get((dist, 0)) if use_plane_codes else None
            if plane is None:
                plane = dist + 120
            dcode, dev, deb = _prefix_encode(plane)
            emit(d_codes, dcode)
            bw.write(dev, deb)
        else:
            emit(g_codes, 280 + payload)


def _write_entropy_image(bw: _BitWriter, pix: list[int]) -> None:
    """Serialize a subresolution (entropy-coded) image: cache bit 0, one
    prefix-code group, literal pixels (decoded by _decode_image_stream
    with is_level0=False)."""
    bw.write(0, 1)  # no color cache
    tokens = _tokenize(pix, 0, False)
    codes = _write_group_codes(bw, _token_histograms(tokens, False), 0)
    _emit_tokens(bw, tokens, codes, False)


def _sg_forward(pix: list[int]) -> list[int]:
    out = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = ((p >> 16) - g) & 0xFF
        b = ((p & 0xFF) - g) & 0xFF
        out.append((p & 0xFF00FF00) | (r << 16) | b)
    return out


def _ct_forward(pix: list[int], w: int, h: int, g2r: int, g2b: int, r2b: int) -> list[int]:
    out = []
    for p in pix:
        g = (p >> 8) & 0xFF
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        rr = (r - _ct_delta(g2r, g)) & 0xFF
        # decoder recovers blue from the FINAL red value (== r here)
        bb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        out.append((p & 0xFF00FF00) | (rr << 16) | bb)
    return out


def _pred_forward(pix: list[int], w: int, h: int, bits: int, mode: int) -> list[int]:
    out = []
    for pos, p in enumerate(pix):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[pos - 1]
        elif x == 0:
            pred = pix[pos - w]
        else:
            pred = _predict(
                mode, pix[pos - 1], pix[pos - w], pix[pos - w + 1], pix[pos - w - 1]
            )
        out.append(
            (((p >> 24) - (pred >> 24)) & 0xFF) << 24
            | (((p >> 16) - (pred >> 16)) & 0xFF) << 16
            | (((p >> 8) - (pred >> 8)) & 0xFF) << 8
            | ((p - pred) & 0xFF)
        )
    return out


def encode_vp8l_stream(
    arr: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_bits: int | None = None,
    predictor_mode: int = 1,
    color_transform: tuple[int, int, int] | None = None,
    color_transform_bits: int = 4,
    palette: bool = False,
    cache_bits: int = 0,
    use_rle: bool = False,
    use_plane_codes: bool = False,
    meta_bits: int | None = None,
) -> bytes:
    """Spec-valid VP8L stream from an (H, W, 3|4) uint8 array.

    The keyword options select which spec features the stream uses —
    each exists to exercise a distinct decoder path (and together they
    cover every transform, the color cache, LZ77 with raw and
    near-distance plane codes, and the meta prefix-code image).  All
    combinations emit streams any compliant decoder reads; forward
    transforms are applied in bitstream read order T1..Tn so the
    decoder's reverse-order inverses reconstruct the input exactly.
    """
    pix, w, h = _rgba_to_argb_list(arr)
    if w > (1 << 14) or h > (1 << 14):
        raise ValueError("image too large for VP8L")

    bw = _BitWriter()  # the 0x2F signature byte is prepended at return
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    has_alpha = any((p >> 24) != 0xFF for p in pix)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version

    xsize = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        pix = _sg_forward(pix)
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bits = color_transform_bits
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(bits - 2, 3)
        cw = (xsize + (1 << bits) - 1) >> bits
        ch = (h + (1 << bits) - 1) >> bits
        cte = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _write_entropy_image(bw, [cte] * (cw * ch))
        pix = _ct_forward(pix, xsize, h, g2r, g2b, r2b)
    if predictor_bits is not None:
        bits = predictor_bits
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(bits - 2, 3)
        pw = (xsize + (1 << bits) - 1) >> bits
        ph = (h + (1 << bits) - 1) >> bits
        _write_entropy_image(bw, [0xFF000000 | (predictor_mode << 8)] * (pw * ph))
        pix = _pred_forward(pix, xsize, h, bits, predictor_mode)
    if palette:
        colors = sorted(set(pix))
        if len(colors) > 256:
            raise ValueError("palette requested but image has > 256 colors")
        idx_of = {c: i for i, c in enumerate(colors)}
        n_colors = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((c >> 16) - (prev >> 16)) & 0xFF) << 16
                | (((c >> 8) - (prev >> 8)) & 0xFF) << 8
                | ((c - prev) & 0xFF)
            )
            prev = c
        _write_entropy_image(bw, deltas)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per_byte = 1 << width_bits
            bits_each = 8 >> width_bits
            packed_w = (xsize + per_byte - 1) >> width_bits
            packed = []
            for y in range(h):
                for px_ in range(packed_w):
                    green = 0
                    for k in range(per_byte):
                        x = (px_ << width_bits) + k
                        if x < xsize:
                            green |= idx_of[pix[y * xsize + x]] << (k * bits_each)
                    packed.append(0xFF000000 | (green << 8))
            pix = packed
            xsize = packed_w
        else:
            pix = [0xFF000000 | (idx_of[p] << 8) for p in pix]
    bw.write(0, 1)  # no more transforms

    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    if meta_bits is None:
        bw.write(0, 1)  # no meta prefix image
        tokens = _tokenize(pix, cache_bits, use_rle)
        codes = _write_group_codes(
            bw, _token_histograms(tokens, use_plane_codes), cache_size
        )
        _emit_tokens(bw, tokens, codes, use_plane_codes)
    else:
        # two prefix-code groups in a checkerboard of meta blocks;
        # literal-only emission keeps token->group assignment per pixel
        if use_rle or cache_bits:
            raise ValueError("meta_bits demo supports literal-only encoding")
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = [
            ((bx + by) % 2) for by in range(mh) for bx in range(mw)
        ]
        _write_entropy_image(bw, [0xFF000000 | (g << 8) for g in meta])
        group_of_pixel = [
            meta[((pos // xsize) >> meta_bits) * mw + ((pos % xsize) >> meta_bits)]
            for pos in range(len(pix))
        ]
        group_pix = [
            [p for p, g in zip(pix, group_of_pixel) if g == gi] for gi in (0, 1)
        ]
        group_tokens = [_tokenize(gp, 0, False) for gp in group_pix]
        group_codes = [
            _write_group_codes(bw, _token_histograms(t, False), 0)
            for t in group_tokens
        ]
        for p, g in zip(pix, group_of_pixel):
            _emit_tokens(bw, [("lit", p)], group_codes[g], False)

    return b"\x2f" + bw.bytes()


def encode_webp_lossless(arr: np.ndarray, **opts) -> bytes:
    """(H, W, 3|4) uint8 -> lossless .webp file bytes."""
    stream = encode_vp8l_stream(arr, **opts)
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body

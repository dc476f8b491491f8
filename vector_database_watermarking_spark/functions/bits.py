"""Float binary-expansion surgery (SURVEY P3-P6) — the TVP/RS
embedding primitive.

Reference semantics (clean-room from ``/root/reference/assistance.py:1-31``
and ``watermarking.py:53-117``): a float's magnitude is written as a
binary-expansion string ``"<int bits>.<frac bits>"``; one character in
the low half of that string is *set* (not flipped) to
``wm_bit XOR (position % 2)``, where both the carrier dimension and the
character index are derived from the keyed md5 hash of the vector's
content id. Extraction recomputes both and reads the character back.

The expansion of any float32 magnitude is finite (terminates at its
lowest set bit, always within the 24-bit significand window), so the
surgery round-trips exactly through float32 storage.

Documented deviations from the reference:
- sign is preserved (``watermarking.py:84`` writes the positive
  magnitude back, silently flipping negative values positive — SIFT
  data is non-negative so the reference never hit this; our fixture
  data is signed);
- the value-dependent expansion length means *setting* a bit can
  shorten the expansion (clearing the lowest set bit) and shift the
  extraction window; like the reference, we accept the rare per-vector
  decode error — the majority vote (A2) absorbs it.

These are plain Python/numpy functions; the engine applies them inside
Arrow-batched pandas UDFs (SURVEY §4.4), never row-at-a-time Spark UDFs.
"""

from __future__ import annotations

import math

from .hashing import compat_md5_int

MIN_POS_FRACTION = 0.5


def float_to_bin(num: float) -> str:
    """Binary expansion string of ``|num|``: ``"intbits.fracbits"``.

    Mirrors ``assistance.py:1-24``: integers render as ``bin(n) + ".0"``;
    fractional parts are expanded bit-by-bit until the remainder is
    exhausted (finite for any float, since floats are dyadic).
    """
    num = abs(float(num))
    int_part = int(num)
    frac = num - int_part
    if frac == 0.0:
        return bin(int_part)[2:] + ".0"
    frac_bits = []
    while True:
        frac *= 2.0
        bit = int(frac)
        frac_bits.append(str(bit))
        if frac == 1.0:
            break
        frac -= bit
    return bin(int_part)[2:] + "." + "".join(frac_bits)


def bin_to_float(b: str) -> float:
    """Inverse of :func:`float_to_bin` (``assistance.py:26-31``)."""
    if "." not in b:
        return float(int(b, 2))
    int_part, frac_part = b.split(".")
    frac = 0.0
    for i, bit in enumerate(frac_part):
        if bit == "1":
            frac += 2.0 ** -(i + 1)
    return int(int_part, 2) + frac


def _carrier_position(hash_value: int, d: int, skip_dims: frozenset[int] | None) -> int:
    """Embedding dimension: ``hash % d``, linear-probed past the key
    dims so the content id never changes (``watermarking.py:56-59``)."""
    position = hash_value % d
    if skip_dims:
        while position in skip_dims:
            position = (position + 1) % d
    return position


def _bit_position(hash_value: int, bin_rep: str) -> int:
    """Character index in the low half of the expansion string
    (``watermarking.py:60-75``); steps off the decimal point."""
    len_bin = len(bin_rep) - 1  # without the '.'
    min_pos = int(len_bin * MIN_POS_FRACTION)
    bit_position = hash_value % (len_bin - min_pos) + min_pos
    if bin_rep[bit_position] == ".":
        bit_position -= 1
    return bit_position


def embed_bit(vector: list[float], wm_bit: int, vid: str, skip_dims: frozenset[int]) -> list[float]:
    """P5: embed one watermark bit into one vector (pure; returns a new
    list). ``vid`` is the content id; the md5 hash of it drives both
    the dimension and the character choice."""
    h = compat_md5_int(vid)
    d = len(vector)
    pos = _carrier_position(h, d, skip_dims)
    value = vector[pos]
    bin_rep = float_to_bin(value)
    bp = _bit_position(h, bin_rep)
    target = str(int(wm_bit) ^ (pos % 2))
    if bin_rep[bp] != target:
        bin_rep = bin_rep[:bp] + target + bin_rep[bp + 1 :]
    new_mag = bin_to_float(bin_rep)
    out = list(vector)
    out[pos] = -new_mag if value < 0 else new_mag
    return out


def extract_bit(vector: list[float], vid: str, skip_dims: frozenset[int]) -> int:
    """P6: read the hidden bit back (``watermarking.py:88-117``)."""
    h = compat_md5_int(vid)
    pos = _carrier_position(h, len(vector), skip_dims)
    bin_rep = float_to_bin(vector[pos])
    bp = _bit_position(h, bin_rep)
    return int(bin_rep[bp]) ^ (pos % 2)


# ------------------------------------------------------- integer fast tier
#
# The string expansion above IS the reference semantics (and the
# differential target); the functions below compute the identical
# surgery in O(1) integer arithmetic per value instead of building a
# per-bit character list (~150 Python loop iterations each way). The
# embed path is the one full-scan Python in the engine (SCALING.md),
# so its per-row constant matters at 100 TB. Exactness: |x| is held
# as the exact integer V = |x|·2^fbits (frexp + trailing-zero strip —
# no rounding), and the written-back magnitude V/2^fbits is exact
# whenever V fits in the 53-bit significand. When a bit set would
# widen V past 53 bits (requires |x| below ~2^-27 — never in unit-ish
# embedding data), the fast tier falls back to the string
# implementation so the two tiers are bit-identical BY CONSTRUCTION
# on every input, not just typical ones (Hypothesis-differential
# pinned over the float32 domain).


def _int_rep(num: float) -> tuple[int, int, int, int]:
    """``(V, fbits, ilen, len_bin)`` such that ``|num| = V / 2**fbits``
    exactly and the expansion string of :func:`float_to_bin` has
    ``ilen`` integer chars and ``len_bin`` total digit chars (without
    the '.'). Integer magnitudes carry the trailing ``".0"`` char as
    one zero fraction bit (``fbits=1``), exactly like the string."""
    a = abs(float(num))
    int_part = int(a)
    ilen = max(int_part.bit_length(), 1)
    if a - int_part == 0.0:
        return (int_part << 1, 1, ilen, ilen + 1)
    m, e = math.frexp(a)  # a = m * 2**e, m in [0.5, 1)
    m53 = int(math.ldexp(m, 53))  # exact 53-bit significand
    t = (m53 & -m53).bit_length() - 1
    j = e - 53 + t  # exponent of the lowest set bit (< 0 here)
    return (m53 >> t, -j, ilen, ilen - j)


def _string_index_to_bit(bp: int, ilen: int, fbits: int) -> int:
    """Bit index into V for expansion-string position ``bp`` (which
    never lands on the '.' — the caller has already stepped off it)."""
    w = (ilen - 1 - bp) if bp < ilen else (ilen - bp)
    return w + fbits


def embed_bit_fast(
    vector: list[float], wm_bit: int, vid: str, skip_dims: frozenset[int]
) -> list[float]:
    """P5 via integer arithmetic — bit-identical to :func:`embed_bit`
    (string-tier fallback for sub-2^-27 carriers keeps it exact on
    the whole float domain)."""
    h = compat_md5_int(vid)
    d = len(vector)
    pos = _carrier_position(h, d, skip_dims)
    value = float(vector[pos])
    V, fbits, ilen, len_bin = _int_rep(value)
    min_pos = int(len_bin * MIN_POS_FRACTION)
    bp = h % (len_bin - min_pos) + min_pos
    if bp == ilen:  # the '.' char
        bp -= 1
    idx = _string_index_to_bit(bp, ilen, fbits)
    target = int(wm_bit) ^ (pos % 2)
    if ((V >> idx) & 1) != target:
        V ^= 1 << idx
    if V.bit_length() > 53:
        # written-back float would round: defer to the string tier,
        # whose sequential rounding defines the semantics
        return embed_bit(vector, wm_bit, vid, skip_dims)
    new_mag = math.ldexp(V, -fbits)
    out = list(vector)
    out[pos] = -new_mag if value < 0 else new_mag
    return out


def extract_bit_fast(
    vector: list[float], vid: str, skip_dims: frozenset[int]
) -> int:
    """P6 via integer arithmetic — reads are exact on every input (no
    write-back, so no rounding path at all); bit-identical to
    :func:`extract_bit`."""
    h = compat_md5_int(vid)
    pos = _carrier_position(h, len(vector), skip_dims)
    V, fbits, ilen, len_bin = _int_rep(vector[pos])
    min_pos = int(len_bin * MIN_POS_FRACTION)
    bp = h % (len_bin - min_pos) + min_pos
    if bp == ilen:
        bp -= 1
    idx = _string_index_to_bit(bp, ilen, fbits)
    return ((V >> idx) & 1) ^ (pos % 2)


def content_id_py(vector: list[float], dims: list[int], scale: float = 100.0) -> str:
    """P2 in Python (pandas-UDF tier), matching the native
    ``functions.hashing.content_id`` exactly: leading decimal digit of
    ``floor(|x| * scale)`` per key dim, over ``dims[:-1]``."""
    parts = []
    for d in dims[:-1]:
        v = abs(float(vector[d])) * scale
        parts.append(str(int(v))[0])
    return "".join(parts)

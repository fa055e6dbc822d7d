"""Symbol tables: the data-first replacement for the reference's code generator.

The reference ships an offline generator that turns ``.def`` tables into C
source (a 256-entry encode array plus a goto-label decode tree, reference:
source/huffman_generator/generator.c:216-352). In this framework tables are
*data artifacts*: a :class:`HuffmanTable` holds

- encode arrays: ``patterns`` (uint32, right-aligned code bits) and
  ``lengths`` (int32, 0 = symbol has no code) — the vectorized equivalent of
  the generated ``code_points[]`` array (reference: generator.c:300-311), and
- a flattened decode LUT — a branch-free, gather-friendly replacement for the
  generated goto tree (reference: generator.c:175-214), usable from both the
  JAX kernels and the C++ host codec.

Decode LUT layout (two-level):
  Level 0 is indexed by the top ``root_bits`` bits of a 32-bit MSB-aligned
  window. Each entry is a pair ``(bits, val)``:
    * ``bits > 0``  — leaf: ``val`` is the symbol, ``bits`` is bits_read.
    * ``bits == 0`` — invalid: no code has this prefix (unknown symbol).
    * ``bits < 0``  — pointer: ``-bits`` is the subtable width ``w``; the
      subtable occupies ``lut1[val : val + 2**w]`` and is indexed by the
      ``w`` window bits that follow the root bits.
  Level-1 entries are ``(bits_read, symbol)`` leaves or 0 = invalid.

Both levels are plain int32 arrays so a decode is at most two gathers —
ideal for the VPU and for XLA.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Iterable, Sequence

import numpy as np

from .errors import TableError

MAX_CODE_BITS = 32  # reference: source/huffman.c:10 (MAX_PATTERN_BITS)
NUM_SYMBOLS = 256
DEFAULT_ROOT_BITS = 12

_DEF_CODE_RE = re.compile(
    r'HUFFMAN_CODE\(\s*(\d+)\s*,\s*"([01]*)"\s*,\s*(0[xX][0-9a-fA-F]+|\d+)\s*,\s*(\d+)\s*\)'
)

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@dataclasses.dataclass(frozen=True)
class CodeSpec:
    """One symbol's code: right-aligned ``pattern`` spanning ``num_bits``."""

    symbol: int
    num_bits: int
    pattern: int

    def __post_init__(self):
        if not 0 <= self.symbol < NUM_SYMBOLS:
            raise TableError(f"symbol {self.symbol} out of range")
        if not 1 <= self.num_bits <= MAX_CODE_BITS:
            raise TableError(f"code length {self.num_bits} out of range [1,32]")
        if self.pattern >> self.num_bits:
            raise TableError(
                f"pattern {self.pattern:#x} wider than num_bits={self.num_bits}"
            )


def parse_def(text: str) -> list[CodeSpec]:
    """Parse the reference ``.def`` table format.

    Accepts the same inputs as the reference generator's parser
    (reference: source/huffman_generator/generator.c:42-105): lines of
    ``HUFFMAN_CODE(symbol, "bitstring", hex_pattern, num_bits)``, ignoring
    ``#`` preprocessor lines and ``/* ... */`` comments.
    """
    # Strip block comments first (the reference tracks them statefully).
    stripped = re.sub(r"/\*.*?\*/", " ", text, flags=re.DOTALL)
    specs: list[CodeSpec] = []
    seen: set[int] = set()
    for line in stripped.splitlines():
        if line.lstrip().startswith("#"):
            continue
        for m in _DEF_CODE_RE.finditer(line):
            sym = int(m.group(1))
            bit_str = m.group(2)
            pattern = int(m.group(3), 0)
            num_bits = int(m.group(4))
            if bit_str and (len(bit_str) != num_bits or int(bit_str, 2) != pattern):
                raise TableError(
                    f"symbol {sym}: bit string {bit_str!r} disagrees with "
                    f"pattern={pattern:#x} num_bits={num_bits}"
                )
            if sym in seen:
                raise TableError(f"symbol {sym} defined twice")
            seen.add(sym)
            specs.append(CodeSpec(sym, num_bits, pattern))
    return specs


def parse_tsv(text: str) -> list[CodeSpec]:
    """Parse this framework's native TSV artifact: ``symbol\\tnum_bits\\thex``."""
    specs = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        sym, nbits, pat = line.split("\t")
        specs.append(CodeSpec(int(sym), int(nbits), int(pat, 16)))
    return specs


def _build_decode_lut(
    lengths: np.ndarray, patterns: np.ndarray, root_bits: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Build the two-level decode LUT. Returns (l0_bits, l0_val, l1_bits, l1_val, root_bits)."""
    max_len = int(lengths.max()) if lengths.any() else 1
    root_bits = min(root_bits, max(max_len, 1))
    size0 = 1 << root_bits
    l0_bits = np.zeros(size0, dtype=np.int32)
    l0_val = np.zeros(size0, dtype=np.int32)

    # Group long codes by their root prefix to size the subtables.
    long_by_prefix: dict[int, list[int]] = {}
    for sym in range(NUM_SYMBOLS):
        ln = int(lengths[sym])
        if ln == 0:
            continue
        pat = int(patterns[sym])
        if ln <= root_bits:
            lo = pat << (root_bits - ln)
            hi = (pat + 1) << (root_bits - ln)
            if l0_bits[lo:hi].any():
                raise TableError(f"table is not prefix-free at symbol {sym}")
            l0_bits[lo:hi] = ln
            l0_val[lo:hi] = sym
        else:
            prefix = pat >> (ln - root_bits)
            long_by_prefix.setdefault(prefix, []).append(sym)

    l1_bits_parts: list[np.ndarray] = []
    l1_val_parts: list[np.ndarray] = []
    base = 0
    for prefix, syms in sorted(long_by_prefix.items()):
        if l0_bits[prefix] != 0:
            raise TableError(
                f"table is not prefix-free: prefix {prefix:0{root_bits}b} is both "
                f"a code and a prefix of longer codes"
            )
        width = max(int(lengths[s]) for s in syms) - root_bits
        sub_bits = np.zeros(1 << width, dtype=np.int32)
        sub_val = np.zeros(1 << width, dtype=np.int32)
        for sym in syms:
            ln = int(lengths[sym])
            pat = int(patterns[sym])
            rest = pat & ((1 << (ln - root_bits)) - 1)
            lo = rest << (width - (ln - root_bits))
            hi = (rest + 1) << (width - (ln - root_bits))
            if sub_bits[lo:hi].any():
                raise TableError(f"table is not prefix-free at symbol {sym}")
            sub_bits[lo:hi] = ln
            sub_val[lo:hi] = sym
        l0_bits[prefix] = -width
        l0_val[prefix] = base
        l1_bits_parts.append(sub_bits)
        l1_val_parts.append(sub_val)
        base += 1 << width

    if l1_bits_parts:
        l1_bits = np.concatenate(l1_bits_parts)
        l1_val = np.concatenate(l1_val_parts)
    else:  # keep shapes non-empty so gathers stay trivially valid
        l1_bits = np.zeros(1, dtype=np.int32)
        l1_val = np.zeros(1, dtype=np.int32)
    return l0_bits, l0_val, l1_bits.astype(np.int32), l1_val.astype(np.int32), root_bits


@dataclasses.dataclass(frozen=True)
class HuffmanTable:
    """A compiled symbol table: encode arrays + flattened decode LUT."""

    patterns: np.ndarray  # uint32[256], right-aligned code bits
    lengths: np.ndarray  # int32[256], 0 = no code for this symbol
    l0_bits: np.ndarray  # int32[2^root_bits]
    l0_val: np.ndarray
    l1_bits: np.ndarray
    l1_val: np.ndarray
    root_bits: int
    max_len: int
    min_len: int
    name: str = "table"

    @staticmethod
    def from_specs(
        specs: Iterable[CodeSpec],
        name: str = "table",
        root_bits: int = DEFAULT_ROOT_BITS,
    ) -> "HuffmanTable":
        patterns = np.zeros(NUM_SYMBOLS, dtype=np.uint32)
        lengths = np.zeros(NUM_SYMBOLS, dtype=np.int32)
        for spec in specs:
            if lengths[spec.symbol]:
                raise TableError(f"symbol {spec.symbol} defined twice")
            patterns[spec.symbol] = spec.pattern
            lengths[spec.symbol] = spec.num_bits
        if not lengths.any():
            raise TableError("table defines no codes")
        l0b, l0v, l1b, l1v, rb = _build_decode_lut(lengths, patterns, root_bits)
        nz = lengths[lengths > 0]
        return HuffmanTable(
            patterns=patterns,
            lengths=lengths,
            l0_bits=l0b,
            l0_val=l0v,
            l1_bits=l1b,
            l1_val=l1v,
            root_bits=rb,
            max_len=int(nz.max()),
            min_len=int(nz.min()),
            name=name,
        )

    @staticmethod
    def from_def_file(path: str, name: str | None = None) -> "HuffmanTable":
        with open(path) as f:
            specs = parse_def(f.read())
        return HuffmanTable.from_specs(
            specs, name=name or os.path.splitext(os.path.basename(path))[0]
        )

    @staticmethod
    def from_tsv_file(path: str, name: str | None = None) -> "HuffmanTable":
        with open(path) as f:
            specs = parse_tsv(f.read())
        return HuffmanTable.from_specs(
            specs, name=name or os.path.splitext(os.path.basename(path))[0]
        )

    def specs(self) -> list[CodeSpec]:
        return [
            CodeSpec(s, int(self.lengths[s]), int(self.patterns[s]))
            for s in range(NUM_SYMBOLS)
            if self.lengths[s]
        ]

    def to_tsv(self) -> str:
        lines = ["# symbol\tnum_bits\tpattern_hex"]
        for spec in self.specs():
            lines.append(f"{spec.symbol}\t{spec.num_bits}\t{spec.pattern:x}")
        return "\n".join(lines) + "\n"

    def save(self, path: str) -> None:
        """Persist as an .npz artifact (the framework's compiled-table format)."""
        np.savez(
            path,
            patterns=self.patterns,
            lengths=self.lengths,
            l0_bits=self.l0_bits,
            l0_val=self.l0_val,
            l1_bits=self.l1_bits,
            l1_val=self.l1_val,
            root_bits=np.int32(self.root_bits),
            name=np.array(self.name),
        )

    @staticmethod
    def load(path: str) -> "HuffmanTable":
        z = np.load(path, allow_pickle=False)
        lengths = z["lengths"]
        nz = lengths[lengths > 0]
        return HuffmanTable(
            patterns=z["patterns"],
            lengths=lengths,
            l0_bits=z["l0_bits"],
            l0_val=z["l0_val"],
            l1_bits=z["l1_bits"],
            l1_val=z["l1_val"],
            root_bits=int(z["root_bits"]),
            max_len=int(nz.max()),
            min_len=int(nz.min()),
            name=str(z["name"]),
        )

    # -- scalar reference paths (oracle-style; used by tests, not kernels) --

    def encode_symbol(self, symbol: int) -> tuple[int, int]:
        """Return (pattern, num_bits); num_bits==0 means unknown symbol."""
        return int(self.patterns[symbol]), int(self.lengths[symbol])

    def decode_window(self, bits32: int) -> tuple[int, int]:
        """Decode a 32-bit MSB-aligned window. Returns (symbol, bits_read).

        bits_read == 0 means no code matches (reference decode contract,
        include/aws/compression/huffman.h:46-48).
        """
        idx = (bits32 >> (32 - self.root_bits)) & ((1 << self.root_bits) - 1)
        b = int(self.l0_bits[idx])
        v = int(self.l0_val[idx])
        if b >= 0:
            return (v, b) if b else (0, 0)
        width = -b
        shifted = (bits32 << self.root_bits) & 0xFFFFFFFF
        sub = shifted >> (32 - width)
        b1 = int(self.l1_bits[v + sub])
        return (int(self.l1_val[v + sub]), b1) if b1 else (0, 0)


def make_canonical(
    code_lengths: Sequence[int] | dict[int, int], name: str = "canonical"
) -> HuffmanTable:
    """Build a canonical prefix code from per-symbol code lengths.

    This is the table-construction capability the reference leaves to
    external tools: given lengths (0 = absent), assign codes in (length, symbol)
    order. Validates Kraft's inequality. Useful for generating test tables
    with arbitrary length mixes (e.g. 5-30 bits, BASELINE.json config 3).
    """
    if isinstance(code_lengths, dict):
        lens = [0] * NUM_SYMBOLS
        for s, l in code_lengths.items():
            lens[s] = l
    else:
        lens = list(code_lengths) + [0] * (NUM_SYMBOLS - len(code_lengths))
    kraft = sum(2.0 ** -l for l in lens if l > 0)
    if kraft > 1.0 + 1e-12:
        raise TableError(f"code lengths violate Kraft inequality (sum={kraft})")
    order = sorted((l, s) for s, l in enumerate(lens) if l > 0)
    specs = []
    code = 0
    prev_len = 0
    for l, s in order:
        code <<= l - prev_len
        specs.append(CodeSpec(s, l, code))
        code += 1
        prev_len = l
    return HuffmanTable.from_specs(specs, name=name)


def optimal_code_lengths(
    freqs: Sequence[int] | np.ndarray, max_len: int = MAX_CODE_BITS
) -> np.ndarray:
    """Optimal length-limited prefix-code lengths via package-merge.

    The reference leaves table construction to external tools (its generator
    only *consumes* `.def` files); this provides the construction step:
    given symbol frequencies, produce code lengths minimizing the encoded
    size subject to ``max_len``, ready for :func:`make_canonical`.

    Returns int32[256] lengths (0 for zero-frequency symbols). Raises
    TableError when the alphabet can't fit in ``max_len`` bits.
    """
    f = np.zeros(NUM_SYMBOLS, dtype=np.int64)
    fin = np.asarray(freqs, dtype=np.int64)
    f[: fin.size] = fin
    active = np.flatnonzero(f > 0)
    n = active.size
    if n == 0:
        raise TableError("no symbols with nonzero frequency")
    if n == 1:
        lens = np.zeros(NUM_SYMBOLS, dtype=np.int32)
        lens[active[0]] = 1
        return lens
    if (1 << max_len) < n:
        raise TableError(f"{n} symbols cannot fit in {max_len}-bit codes")

    # Package-merge: level l holds items of width 2^-l; merging adjacent
    # pairs of level-(l) items makes level-(l-1) packages. Each item tracks
    # how many times each leaf participates; a leaf's final code length is
    # its participation count across the selected 2n-2 items of level 1.
    leaves = sorted((int(f[s]), s) for s in active)
    leaf_weights = [w for w, _ in leaves]
    leaf_syms = [s for _, s in leaves]

    def merge_level(packages):
        """Merge leaf items with packages (both sorted by weight)."""
        items = []
        i = j = 0
        while i < n or j < len(packages):
            take_leaf = j >= len(packages) or (
                i < n and leaf_weights[i] <= packages[j][0]
            )
            if take_leaf:
                cnt = np.zeros(n, dtype=np.int32)
                cnt[i] = 1
                items.append((leaf_weights[i], cnt))
                i += 1
            else:
                items.append(packages[j])
                j += 1
        return items

    packages: list = []
    for _ in range(max_len):
        items = merge_level(packages)
        # package adjacent pairs for the next (shallower) level
        packages = [
            (items[2 * k][0] + items[2 * k + 1][0],
             items[2 * k][1] + items[2 * k + 1][1])
            for k in range(len(items) // 2)
        ]
    # top level: the cheapest 2n-2 items' leaf-participation counts are the
    # code lengths
    counts = np.zeros(n, dtype=np.int32)
    for w, cnt in items[: 2 * n - 2]:
        counts += cnt
    lens = np.zeros(NUM_SYMBOLS, dtype=np.int32)
    for k in range(n):
        lens[leaf_syms[k]] = int(counts[k])
    return lens


def build_table(
    data: bytes | np.ndarray | None = None,
    freqs: Sequence[int] | np.ndarray | None = None,
    max_len: int = 16,
    name: str = "built",
) -> HuffmanTable:
    """Construct an optimal length-limited canonical table from data.

    Symbols absent from the corpus get no code (encoding them raises
    UnknownSymbolError, the reference's num_bits==0 contract). Pass
    ``freqs`` directly to control the distribution, or ``data`` to use its
    histogram.
    """
    if (data is None) == (freqs is None):
        raise TableError("pass exactly one of data / freqs")
    if data is not None:
        arr = (
            np.frombuffer(bytes(data), dtype=np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, dtype=np.uint8)
        )
        freqs = np.bincount(arr, minlength=NUM_SYMBOLS)
    lens = optimal_code_lengths(freqs, max_len=max_len)
    return make_canonical(lens.tolist(), name=name)


def safe_eos_padding(table: HuffmanTable) -> int | None:
    """An eos_padding byte whose padding bits can never decode as a symbol.

    The reference pads the final partial byte with the low ``8 - (bits%8)``
    bits of ``eos_padding`` and leaves validating them to the caller
    (reference: source/huffman.c:178-184, README.md:176-183) — so for
    tables where the default all-ones padding completes a short code, a
    foreign-stream decode emits spurious tail symbols. This searches for a
    byte whose every possible padding tail (1..7 bits, MSB-first) matches
    no complete code, making round-trips lossless without an index.
    Returns None when no such byte exists (e.g. Kraft-complete tables with
    all code lengths <= 7). HPACK's 0xFF is safe by construction (the EOS
    prefix is 30 bits).
    """
    for eos in range(256):
        ok = True
        for k in range(1, 8):
            pad = eos & ((1 << k) - 1)
            window = (pad << (32 - k)) & 0xFFFFFFFF
            _sym, bits_read = table.decode_window(window)
            if 0 < bits_read <= k:
                ok = False
                break
        if ok:
            return eos
    return None


def load_static_test_table() -> HuffmanTable:
    """The 256-symbol static test table (max code length 10).

    Data derived from the reference's test table
    (reference: tests/test_huffman_static_table.def:11-266); same codes the
    reference's golden vectors (tests/huffman_test.c:20-37) were produced with.
    """
    return HuffmanTable.from_tsv_file(
        os.path.join(_DATA_DIR, "static_table.tsv"), name="static_test"
    )


def load_hpack_table() -> HuffmanTable:
    """The RFC 7541 (HPACK) Appendix B static Huffman table, symbols 0-255
    (max code length 30) — the code the reference's downstream consumer
    aws-c-http ships as generated C (reference: builder.json:6-8,
    README.md:176-183).

    HPACK's EOS symbol (256) is not a byte symbol: RFC 7541 §5.2 uses its
    most-significant bits as end-of-string padding, which the default
    ``eos_padding=0xFF`` (all ones) reproduces bit-exactly; validate
    incoming padding with ``HuffmanDecoder.padding_is_all_ones()``.
    """
    return HuffmanTable.from_tsv_file(
        os.path.join(_DATA_DIR, "hpack_rfc7541.tsv"), name="hpack_rfc7541"
    )

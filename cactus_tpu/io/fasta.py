"""FASTA I/O with numeric sequence codes and a soft-mask track.

TPU-first representation: sequences are numpy ``uint8`` code arrays
(A=0 C=1 G=2 T=3, anything else=4) plus a boolean soft-mask track
(True = lower-case / repeat-masked).  Kernels consume the code arrays
directly (optionally packed 2-bit); case is metadata.

Reference behavior mirrored: the cactus preprocessor keeps soft-masking as
case information in FASTA (reference: preprocessor/cactus_softmask2hardmask.c,
src/cactus/preprocessor/fileMasking.py).
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass, field

import numpy as np

# Code table: A=0 C=1 G=2 T=3 N(or any IUPAC ambiguity)=4
A, C, G, T, N = 0, 1, 2, 3, 4

_CODE_OF = np.full(256, N, dtype=np.uint8)
for _i, _b in enumerate("ACGT"):
    _CODE_OF[ord(_b)] = _i
    _CODE_OF[ord(_b.lower())] = _i

_IS_LOWER = np.zeros(256, dtype=bool)
for _o in range(ord("a"), ord("z") + 1):
    _IS_LOWER[_o] = True

_BASE_OF = np.frombuffer(b"ACGTN", dtype=np.uint8)
_BASE_OF_LOWER = np.frombuffer(b"acgtn", dtype=np.uint8)

# Complement in code space: A<->T, C<->G, N->N
_COMP = np.array([T, G, C, A, N], dtype=np.uint8)


@dataclass
class Sequence:
    """One FASTA record: numeric codes + soft-mask track."""

    name: str
    codes: np.ndarray  # uint8 in {0..4}
    mask: np.ndarray | None = None  # bool, True = soft-masked
    header: str = ""  # full header line after '>'

    def __post_init__(self):
        self.codes = np.asarray(self.codes, dtype=np.uint8)
        if self.mask is None:
            self.mask = np.zeros(len(self.codes), dtype=bool)
        if not self.header:
            self.header = self.name

    def __len__(self) -> int:
        return len(self.codes)

    def to_string(self) -> str:
        out = np.where(self.mask, _BASE_OF_LOWER[self.codes], _BASE_OF[self.codes])
        return out.tobytes().decode("ascii")

    @classmethod
    def from_string(cls, name: str, s: str, header: str = "") -> "Sequence":
        raw = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
        return cls(name=name, codes=_CODE_OF[raw], mask=_IS_LOWER[raw],
                   header=header or name)


def revcomp(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes[::-1]]


def complement(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes]


def _open(path, mode="rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path_or_file) -> dict[str, Sequence]:
    """Parse FASTA into an ordered {name: Sequence} dict."""
    if hasattr(path_or_file, "read"):
        fh = path_or_file
        close = False
    else:
        fh = _open(path_or_file)
        close = True
    try:
        seqs: dict[str, Sequence] = {}
        name, header, chunks = None, "", []
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = Sequence.from_string(name, "".join(chunks), header)
                header = line[1:].strip()
                name = header.split()[0] if header else ""
                chunks = []
            else:
                chunks.append(line.strip())
        if name is not None:
            seqs[name] = Sequence.from_string(name, "".join(chunks), header)
        return seqs
    finally:
        if close:
            fh.close()


def write_fasta(path_or_file, seqs, line_width: int = 80, hardmask: bool = False):
    """Write sequences (iterable of Sequence or {name: Sequence}) as FASTA."""
    if isinstance(seqs, dict):
        seqs = seqs.values()
    if hasattr(path_or_file, "write"):
        fh = path_or_file
        close = False
    else:
        fh = _open(path_or_file, "wt")
        close = True
    try:
        for s in seqs:
            fh.write(f">{s.header or s.name}\n")
            text = s.to_string()
            if hardmask:
                buf = np.frombuffer(text.encode("ascii"), dtype=np.uint8).copy()
                buf[_IS_LOWER[buf]] = ord("N")
                text = buf.tobytes().decode("ascii")
            for i in range(0, len(text), line_width):
                fh.write(text[i:i + line_width])
                fh.write("\n")
    finally:
        if close:
            fh.close()


def fasta_str(seqs) -> str:
    buf = io.StringIO()
    write_fasta(buf, seqs)
    return buf.getvalue()


def pack_2bit(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack codes into 2-bit representation + N-mask.

    Returns (packed uint8 array of ceil(n/4) bytes, n_mask bool array).
    Ns are stored as A in the packed stream and flagged in the mask.
    """
    n = len(codes)
    n_mask = codes >= 4
    two = np.where(n_mask, 0, codes).astype(np.uint8)
    pad = (-n) % 4
    if pad:
        two = np.concatenate([two, np.zeros(pad, dtype=np.uint8)])
    two = two.reshape(-1, 4)
    packed = (two[:, 0] | (two[:, 1] << 2) | (two[:, 2] << 4) | (two[:, 3] << 6))
    return packed.astype(np.uint8), n_mask


def unpack_2bit(packed: np.ndarray, n: int, n_mask: np.ndarray | None = None) -> np.ndarray:
    b = packed[:, None] >> np.array([0, 2, 4, 6], dtype=np.uint8)[None, :]
    codes = (b & 3).reshape(-1)[:n].astype(np.uint8)
    if n_mask is not None:
        codes = np.where(n_mask, np.uint8(N), codes)
    return codes

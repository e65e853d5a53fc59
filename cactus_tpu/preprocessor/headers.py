"""FASTA header hygiene (sanitize/cutHeaders/checkUniqueHeaders analogs).

Reference binaries/scripts: preprocessor/cactus_sanitizeFastaHeaders.c
(unique `id=EVENT|` prefixes; pangenome `#` handling),
preprocessor/cutHeaders.py (truncate at first whitespace),
preprocessor/checkUniqueHeaders.py (reject duplicates / bad chars).
"""

from __future__ import annotations

from ..io.fasta import Sequence

BAD_CHARS = set(" \t;:,")


def cut_header(header: str) -> str:
    """Keep only the first whitespace-separated token."""
    return header.split()[0] if header.split() else header


def check_unique_headers(names, allow_pipes: bool = True) -> None:
    """Raise on duplicate or malformed sequence names."""
    seen = set()
    for n in names:
        if not n:
            raise ValueError("empty FASTA header")
        bad = [c for c in n if c in BAD_CHARS or ord(c) < 33]
        if bad:
            raise ValueError(f"header {n!r} contains bad characters {bad}")
        if not allow_pipes and "|" in n:
            raise ValueError(f"header {n!r} contains '|'")
        if n in seen:
            raise ValueError(f"duplicate FASTA header {n!r}")
        seen.add(n)


def sanitize_genome(event: str, genome: dict[str, Sequence],
                    strip_hash_prefix: bool = False,
                    cut: bool = True) -> dict[str, Sequence]:
    """Cut headers, enforce uniqueness, apply the `event.` prefix.

    strip_hash_prefix: pangenome mode strips `sample#hap#` prefixes
    (cactus_sanitizeFastaHeaders.c:25-27 behavior).
    cut: run the cutHeaders pass (config XML :20; False keeps the raw
    first-token-free header and relies on the uniqueness check).
    """
    out: dict[str, Sequence] = {}
    names = []
    for _name, s in genome.items():
        h = (cut_header(s.header or s.name) if cut
             else (s.header or s.name))
        if strip_hash_prefix and "#" in h:
            h = h.rsplit("#", 1)[-1]
        names.append(h)
    check_unique_headers(names)
    for h, (_name, s) in zip(names, genome.items()):
        full = h if h.startswith(f"{event}.") else f"{event}.{h}"
        out[full] = Sequence(name=full, codes=s.codes, mask=s.mask,
                             header=full)
    return out

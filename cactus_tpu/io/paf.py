"""PAF (Pairwise mApping Format) records with cigar + tag support.

The blast phase emits PAF consumed by CAF, matching the reference toolchain
(paffy; reference: src/cactus/paf/local_alignment.py, paf spec).

Coordinate conventions (PAF standard):
- qstart/qend, tstart/tend are 0-based half-open on the FORWARD strand of
  each sequence.
- strand '-' means query reverse-complement aligns to target forward.
- cg:Z: cigar is in the target->query direction using M/I/D (I = insertion
  in query, D = deletion from query), listed in query-forward order for '+'
  and in query-reverse order for '-' per minimap2/paffy convention: the
  cigar always walks tstart->tend.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


@dataclass
class PafRecord:
    qname: str
    qlen: int
    qstart: int
    qend: int
    strand: str  # '+' or '-'
    tname: str
    tlen: int
    tstart: int
    tend: int
    nmatch: int
    alnlen: int
    mapq: int = 255
    tags: dict[str, tuple[str, object]] = field(default_factory=dict)

    # ---- tags ----
    def set_tag(self, name: str, typ: str, value):
        self.tags[name] = (typ, value)

    def get_tag(self, name: str, default=None):
        t = self.tags.get(name)
        return t[1] if t else default

    @property
    def cigar(self) -> list[tuple[str, int]]:
        cg = self.get_tag("cg")
        return parse_cigar(cg) if cg else []

    @cigar.setter
    def cigar(self, ops: list[tuple[str, int]]):
        self.set_tag("cg", "Z", format_cigar(ops))

    @property
    def score(self) -> int:
        return int(self.get_tag("AS", 0))

    @property
    def is_primary(self) -> bool:
        return self.get_tag("tp", "P") == "P"

    # ---- serialization ----
    def to_line(self) -> str:
        fields = [
            self.qname, str(self.qlen), str(self.qstart), str(self.qend),
            self.strand,
            self.tname, str(self.tlen), str(self.tstart), str(self.tend),
            str(self.nmatch), str(self.alnlen), str(self.mapq),
        ]
        for name, (typ, value) in self.tags.items():
            fields.append(f"{name}:{typ}:{value}")
        return "\t".join(fields)

    @classmethod
    def from_line(cls, line: str) -> "PafRecord":
        f = line.rstrip("\n").split("\t")
        rec = cls(
            qname=f[0], qlen=int(f[1]), qstart=int(f[2]), qend=int(f[3]),
            strand=f[4],
            tname=f[5], tlen=int(f[6]), tstart=int(f[7]), tend=int(f[8]),
            nmatch=int(f[9]), alnlen=int(f[10]), mapq=int(f[11]),
        )
        for tag in f[12:]:
            name, typ, value = tag.split(":", 2)
            if typ == "i":
                value = int(value)
            elif typ == "f":
                value = float(value)
            rec.tags[name] = (typ, value)
        return rec

    # ---- transforms ----
    def inverted(self) -> "PafRecord":
        """Swap query and target (reference: `paffy invert`).

        The cigar walks the new target (= old query) forward; for '-' records
        the op order reverses and I/D swap.
        """
        ops = [( {"I": "D", "D": "I"}.get(op, op), ln) for op, ln in self.cigar]
        if self.strand == "-":
            ops = ops[::-1]
        rec = PafRecord(
            qname=self.tname, qlen=self.tlen, qstart=self.tstart, qend=self.tend,
            strand=self.strand,
            tname=self.qname, tlen=self.qlen, tstart=self.qstart, tend=self.qend,
            nmatch=self.nmatch, alnlen=self.alnlen, mapq=self.mapq,
            tags={k: v for k, v in self.tags.items() if k != "cg"},
        )
        if ops:
            rec.cigar = ops
        return rec

    def aligned_pairs(self):
        """Yield (qpos, tpos) pairs for every M/=/X column.

        qpos is on the query forward strand; for '-' records the query
        coordinate walks backwards from qend-1 while target walks forward.
        """
        ops = self.cigar
        t = self.tstart
        if self.strand == "+":
            q = self.qstart
            for op, ln in ops:
                if op in "M=X":
                    for k in range(ln):
                        yield q + k, t + k
                    q += ln
                    t += ln
                elif op == "I":
                    q += ln
                elif op in "DN":
                    t += ln
        else:
            q = self.qend - 1
            for op, ln in ops:
                if op in "M=X":
                    for k in range(ln):
                        yield q - k, t + k
                    q -= ln
                    t += ln
                elif op == "I":
                    q -= ln
                elif op in "DN":
                    t += ln


def parse_cigar(cg: str) -> list[tuple[str, int]]:
    return [(m.group(2), int(m.group(1))) for m in _CIG_RE.finditer(cg)]


def format_cigar(ops: list[tuple[str, int]]) -> str:
    return "".join(f"{ln}{op}" for op, ln in ops)


def merge_cigar(ops: list[tuple[str, int]]) -> list[tuple[str, int]]:
    """Coalesce adjacent ops of the same kind, dropping zero-length ops."""
    out: list[tuple[str, int]] = []
    for op, ln in ops:
        if ln <= 0:
            continue
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + ln)
        else:
            out.append((op, ln))
    return out


def read_paf(path_or_file) -> list[PafRecord]:
    if hasattr(path_or_file, "read"):
        return [PafRecord.from_line(l) for l in path_or_file if l.strip()]
    with open(path_or_file) as fh:
        return [PafRecord.from_line(l) for l in fh if l.strip()]


def write_paf(path_or_file, records):
    if hasattr(path_or_file, "write"):
        for r in records:
            path_or_file.write(r.to_line() + "\n")
    else:
        with open(path_or_file, "w") as fh:
            for r in records:
                fh.write(r.to_line() + "\n")

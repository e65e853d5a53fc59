"""MAF (Multiple Alignment Format) read/write.

Replaces the hal2maf/taffy export surface at the format level
(reference: maf/cactus_hal2maf.py; MAF spec as consumed by mafComparator).

MAF 's' line: `s src start size strand srcSize text`; for '-' strand rows,
`start` counts on the reverse-complemented sequence.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class MafRow:
    src: str          # genome.seqname
    start: int        # on the given strand
    size: int         # ungapped length
    strand: str       # '+' or '-'
    src_size: int
    text: str         # alignment row with '-' gaps

    def forward_interval(self) -> tuple[int, int]:
        """(start, end) on the forward strand, 0-based half-open."""
        if self.strand == "+":
            return self.start, self.start + self.size
        return self.src_size - self.start - self.size, self.src_size - self.start

    def to_line(self) -> str:
        return (f"s {self.src} {self.start} {self.size} {self.strand} "
                f"{self.src_size} {self.text}")


@dataclass
class MafBlock:
    rows: list[MafRow] = field(default_factory=list)
    score: float | None = None

    @property
    def width(self) -> int:
        return len(self.rows[0].text) if self.rows else 0

    def to_lines(self):
        yield "a" + (f" score={self.score:g}" if self.score is not None else "")
        for r in self.rows:
            yield r.to_line()
        yield ""


def write_maf(path_or_file, blocks, header_params: str = ""):
    own = not hasattr(path_or_file, "write")
    fh = open(path_or_file, "w") if own else path_or_file
    try:
        fh.write(f"##maf version=1{(' ' + header_params) if header_params else ''}\n\n")
        for b in blocks:
            for line in b.to_lines():
                fh.write(line + "\n")
    finally:
        if own:
            fh.close()


def read_maf(path_or_file):
    """Yield MafBlock objects."""
    own = not hasattr(path_or_file, "read")
    fh = open(path_or_file) if own else path_or_file
    try:
        block: MafBlock | None = None
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("a"):
                if block is not None and block.rows:
                    yield block
                score = None
                for tok in line.split()[1:]:
                    if tok.startswith("score="):
                        score = float(tok[6:])
                block = MafBlock(score=score)
            elif line.startswith("s") and block is not None:
                f = line.split()
                block.rows.append(MafRow(
                    src=f[1], start=int(f[2]), size=int(f[3]), strand=f[4],
                    src_size=int(f[5]), text=f[6]))
            elif not line.strip():
                if block is not None and block.rows:
                    yield block
                    block = None
        if block is not None and block.rows:
            yield block
    finally:
        if own:
            fh.close()

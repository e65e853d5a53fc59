"""cactus-prepare equivalent: decomposed stage plans + WDL export.

The reference's cactus-prepare (progressive/cactus_prepare.py:74-99)
decomposes an alignment into independently runnable/restartable stages
(preprocess → per-ancestor blast+align → halAppend) and can print them
as a shell script, run them Toil-in-Toil, or emit a WDL workflow for
Cromwell/Terra.  Here the same three surfaces: `make_plan` builds the
stage DAG, `write_script` prints the ordered commands (the store makes
each stage restartable — `align --target` computes exactly one
ancestor, resuming its dependencies from checkpoints), and `write_wdl`
emits a WDL 1.0 workflow with the same dependency edges.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .utils.trees import Tree


@dataclass
class Stage:
    name: str
    command: str
    deps: list[str] = field(default_factory=list)


def make_plan(tree: Tree, seqfile: str, outdir: str,
              prog: str = "python -m cactus_tpu") -> list[Stage]:
    """Stage DAG: preprocess, one align stage per ancestor (postorder),
    final HAL/MAF export."""
    t = tree.copy()
    t.name_internal_nodes()
    stages = [Stage("preprocess",
                    f"{prog} preprocess {seqfile} {outdir}/prep")]
    internal = [n for n in t.postorder() if not n.is_leaf()]
    internal_names = {n.name for n in internal}
    for node in internal:
        deps = ["preprocess"] + [
            f"align_{c.name}" for c in node.children
            if c.name in internal_names]
        stages.append(Stage(
            f"align_{node.name}",
            f"{prog} align {seqfile} {outdir} --target {node.name}",
            deps=deps))
    root = internal[-1].name if internal else None
    stages.append(Stage(
        "export",
        f"{prog} align {seqfile} {outdir} --maf {outdir}/out.maf "
        f"--hal {outdir}/out.hal",
        deps=[f"align_{root}"] if root else ["preprocess"]))
    return stages


def write_script(stages: list[Stage], fh,
                 seq_bytes: int | None = None) -> None:
    """Ordered shell script (dependencies respected by list order);
    when the input size is known, each align stage is annotated with
    the reference's memory-model estimate."""
    fh.write("#!/bin/sh\nset -e\n")
    mem_note = ""
    if seq_bytes:
        from .utils.resources import estimate_consolidated_memory
        gb = estimate_consolidated_memory(seq_bytes) / (1 << 30)
        mem_note = f" [est. memory {gb:.1f} GiB]"
    for s in stages:
        note = mem_note if s.name.startswith("align_") else ""
        if s.deps:
            fh.write(f"# {s.name} (after: {', '.join(s.deps)}){note}\n")
        else:
            fh.write(f"# {s.name}{note}\n")
        fh.write(s.command + "\n")


def _wdl_task(s: Stage) -> str:
    return (f"task {s.name} {{\n"
            f"  input {{\n    Array[File] upstream = []\n  }}\n"
            f"  command <<<\n    {s.command}\n  >>>\n"
            f"  output {{\n    File done = stdout()\n  }}\n"
            f"  runtime {{\n    docker: \"cactus-tpu\"\n  }}\n"
            f"}}\n")


def write_wdl(stages: list[Stage], fh,
              workflow_name: str = "cactus_tpu") -> None:
    """WDL 1.0 workflow with one task per stage and dependency edges
    expressed through the upstream file array (the cactus-prepare --wdl
    pattern, cactus_prepare.py:74-99)."""
    fh.write("version 1.0\n\n")
    for s in stages:
        fh.write(_wdl_task(s) + "\n")
    fh.write(f"workflow {workflow_name} {{\n")
    for s in stages:
        if s.deps:
            ups = ", ".join(f"{d}.done" for d in s.deps)
            fh.write(f"  call {s.name} {{ input: upstream = [{ups}] }}\n")
        else:
            fh.write(f"  call {s.name}\n")
    fh.write("  output {\n")
    fh.write(f"    File result = {stages[-1].name}.done\n")
    fh.write("  }\n}\n")

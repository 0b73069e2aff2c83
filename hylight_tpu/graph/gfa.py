"""GFA 1.0 output for the string graph / unitigs.

Parity with the reference's observable artifacts: miniasm's ``ma_ug_print``
(``asm.c:77``, S/L lines with unitig sequences and read paths via ``a``
lines) and ViralQuasispecies' ``write2GFA`` (``OverlapGraph.cpp:468``).
"""

from __future__ import annotations

from typing import List, Optional

from hylight_tpu.graph.string_graph import ArcSet, Unitig
from hylight_tpu.io.readset import ReadSet, decode_seq


def unitigs_to_gfa(utgs: List[Unitig], contigs: ReadSet,
                   reads: Optional[ReadSet] = None) -> str:
    """S-line per unitig (+ a-lines recording the read layout)."""
    lines = ["H\tVN:Z:1.0"]
    ci = 0
    for u in utgs:
        if ci >= contigs.n:
            break
        name = contigs.names[ci] if contigs.names else f"utg{ci:06d}"
        name = name.split()[0]
        seq = decode_seq(contigs.get(ci))
        lines.append(f"S\t{name}\t{seq}\tLN:i:{len(seq)}")
        off = 0
        for j, v in enumerate(u.verts):
            rid, d = v >> 1, v & 1
            rname = reads.names[rid] if reads and reads.names else str(rid)
            l = u.arc_lens[j] if j < len(u.arc_lens) else \
                (len(reads.get(rid)) if reads else 0)
            lines.append(f"a\t{name}\t{off}\t{rname}\t{'-' if d else '+'}\t{l}")
            off += l
        ci += 1
    return "\n".join(lines) + "\n"


def arcs_to_gfa(arcs: ArcSet, reads: ReadSet) -> str:
    """S/L lines for the cleaned string graph itself."""
    lines = ["H\tVN:Z:1.0"]
    used = set()
    for v, w in zip(arcs.v.tolist(), arcs.w.tolist()):
        used.add(v >> 1)
        used.add(w >> 1)
    for rid in sorted(used):
        nm = reads.names[rid] if reads.names else str(rid)
        lines.append(f"S\t{nm}\t*\tLN:i:{len(reads.get(rid))}")
    for v, w, l, ol in zip(arcs.v.tolist(), arcs.w.tolist(),
                           arcs.l.tolist(), arcs.ol.tolist()):
        nv = reads.names[v >> 1] if reads.names else str(v >> 1)
        nw = reads.names[w >> 1] if reads.names else str(w >> 1)
        lines.append(f"L\t{nv}\t{'-' if v & 1 else '+'}\t{nw}\t"
                     f"{'-' if w & 1 else '+'}\t{ol}M")
    return "\n".join(lines) + "\n"


def digraph_text(g) -> str:
    """VQ ``digraph.txt`` debug dump: one ``u\\tv`` line per directed edge
    (``OverlapGraph.cpp:388-409`` writeDiGraphToFile; used by the
    reference's --graph_only comparison mode)."""
    return "".join(f"{int(u)}\t{int(v)}\n" for u, v in zip(g.u, g.v))


def fastg_text(g, reads: ReadSet, labels=None) -> str:
    """VQ ``graph.fastg`` debug dump (``OverlapGraph.cpp:412-465``):
    ``>id:adj,...;`` header + the vertex's sequence per node. The
    reference writes forward entries [0, n) and reverse-complement entries
    [readcount, readcount+n); here vertex id = read id (+n for rows whose
    orientation label is 1, in which case the revcomp sequence is
    printed), adjacency from the kept directed edges."""
    import numpy as np

    from hylight_tpu.io.readset import revcomp_codes

    n = reads.n
    lab = labels if labels is not None else np.zeros(n, dtype=np.int8)
    adj = {}
    for u, v in zip(g.u, g.v):
        adj.setdefault(int(u), []).append(int(v))
    out = ["#FASTG:begin;",
           '#FASTG:version=1.0:assembly_name="hylight_tpu";']
    for r in range(n):
        vid = r + (n if lab[r] == 1 else 0)
        targets = ",".join(str(t + (n if lab[t] == 1 else 0))
                           for t in adj.get(r, []))
        out.append(f">{vid}:{targets};" if targets else f">{vid};")
        codes = reads.get(r)
        if lab[r] == 1:
            codes = revcomp_codes(codes)
        out.append(decode_seq(codes))
    out.append("#FASTG:end;")
    return "\n".join(out) + "\n"

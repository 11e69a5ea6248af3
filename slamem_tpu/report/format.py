"""MUMmer-style match listing formatter — byte-parity critical (SURVEY.md §2).

Format spec reconstructed in SURVEY.md §2 (the reference mount was empty, so
the exact column padding is an M-confidence reconstruction; it is isolated
here, one module, so a later correction against a real slaMEM binary is a
one-file change and a golden-file regeneration — SURVEY.md §7 "byte parity").

Emitted shape:

    > <query_name>
     <ref_pos>  <query_pos>  <length>                      (single-ref)
      <ref_name>   <ref_pos>  <query_pos>  <length>        (multi-FASTA ref)
    > <query_name> Reverse                                 (with -b)

Positions are 1-based; with -b, reverse-strand query positions are reported
in reverse-complemented-query coordinates. Matches are ordered by query
position, then reference position — the reconstruction of the reference's
emission order (SURVEY.md §2, [REPO-MEM:L]).
"""

from __future__ import annotations

import io

from slamem_tpu.engine.run import EngineOutput


def format_matches(out: EngineOutput) -> str:
    """Render the full listing for all query sequences/strands."""
    buf = io.StringIO()
    multi_ref = len(out.ref_names) > 1
    name_w = max((len(n) for n in out.ref_names), default=0)
    for qm in out.per_query:
        header = f"> {qm.query_name}"
        if qm.reverse:
            header += " Reverse"
        buf.write(header + "\n")
        for k in range(qm.length.size):
            rp = int(qm.ref_pos[k]) + 1
            qp = int(qm.q_pos[k]) + 1
            ln = int(qm.length[k])
            if multi_ref:
                rn = out.ref_names[int(qm.ref_seq[k])]
                buf.write(f"  {rn:<{name_w}}  {rp:>8}  {qp:>8}  {ln:>8}\n")
            else:
                buf.write(f"{rp:>8}  {qp:>8}  {ln:>8}\n")
    return buf.getvalue()


def write_matches(path: str, out: EngineOutput) -> None:
    with open(path, "w") as f:
        f.write(format_matches(out))

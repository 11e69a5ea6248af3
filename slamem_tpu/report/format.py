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
import sys

from slamem_tpu.engine.run import EngineOutput

try:  # native batch renderer (chr-scale outputs; byte-identical, fuzzed)
    from slamem_tpu._native import matchfmt as _native_fmt
except ImportError:  # pragma: no cover - gcc unavailable
    _native_fmt = None


def _format_python(out: EngineOutput, buf: io.StringIO) -> None:
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


def _format_native(out: EngineOutput, buf: io.StringIO) -> None:
    multi_ref = len(out.ref_names) > 1
    name_w = max((len(n) for n in out.ref_names), default=0)
    for qm in out.per_query:
        header = f"> {qm.query_name}"
        if qm.reverse:
            header += " Reverse"
        buf.write(header + "\n")
        if multi_ref:
            lines = _native_fmt.render_multi(
                qm.ref_seq, qm.ref_pos + 1, qm.q_pos + 1, qm.length,
                out.ref_names, name_w)
        else:
            lines = _native_fmt.render_single(
                qm.ref_pos + 1, qm.q_pos + 1, qm.length)
        buf.write(lines.decode("utf-8"))


def format_matches(out: EngineOutput, force: str | None = None) -> str:
    """Render the full listing for all query sequences/strands.

    The native (C) renderer handles the per-line work — the reference's
    buffered PrintMatch analogue — with the Python renderer as the
    always-available fallback; both produce identical bytes (fuzz-tested in
    tests/test_native.py). `force` pins one for tests.
    """
    buf = io.StringIO()
    use_native = _native_fmt is not None if force is None else (
        force == "native")
    if use_native and any(not n.isascii() for n in out.ref_names):
        use_native = False  # C pads by bytes, Python by chars — keep parity
        print("[slamem] non-ASCII reference name: falling back to the "
              "Python renderer (identical bytes, ~10x slower at chr scale)",
              file=sys.stderr)
    if use_native:
        if _native_fmt is None:
            raise RuntimeError("native formatter unavailable")
        _format_native(out, buf)
    else:
        _format_python(out, buf)
    return buf.getvalue()


def write_matches(path: str, out: EngineOutput) -> None:
    with open(path, "w") as f:
        f.write(format_matches(out))

"""slaMEM-compatible command line driver (SURVEY.md §2 CLI surface).

    slamem-tpu [-mem|-mum|-mam] [-l <minlen>] [-o <outfile>] [-b]
               [-plot <image.bmp>] [-save <index.npz>] [-load <index.npz>]
               [-engine seed|scan] [-v] <reference.fasta> <query.fasta> [more...]

Flag set reconstructed from SURVEY.md §2 ([REPO-MEM:M]; the parser is one
module so a correction against real slaMEM sources is a one-file change).
-plot/-save/-load/-engine/-v are this implementation's additions for the
graphics.c, index-checkpoint and engine-selection capabilities.
"""

from __future__ import annotations

import os
import sys

from slamem_tpu.config import Config, MatchMode


class CliError(Exception):
    pass


USAGE = """\
Usage: slamem-tpu [options] <reference.fasta> <query.fasta> [<query2.fasta> ...]
Options:
  -mem          report all maximal exact matches (default)
  -mum          report only matches unique in reference and query
  -mam          report only matches unique in the reference
  -l <n>        minimum match length (default 20)
  -o <file>     output file (default: derived from query file name)
  -b            also search the reverse-complement strand
  -plot <file>  write a BMP dot-plot of the matches
  -save <file>  save the built index (npz) and exit if no query given
  -load <file>  load a previously saved index instead of rebuilding
  -engine <e>   query engine: seed (default) or scan (single-device
                parity/reference engine, orders slower; no -shard/mesh)
  -shard        shard the index by SA-rank range over all devices
                (chr1-scale references; BASELINE config #5)
  -slabs <n>    slab count for -shard (default: device count); n > 1 on a
                single device runs the true multi-slab program on-chip
  -sparse <s>   sparse seeding: auto (default) or off (A/B surface;
                engine/seed_mode.py choose_stride)
  -v            verbose progress/statistics
"""


def parse_args(argv: list[str]) -> tuple[Config, str, list[str], dict]:
    """argv (no prog name) -> (Config, ref_path, query_paths, extras)."""
    mode = MatchMode.MEM
    min_length = 20
    out_path = None
    both = False
    plot = None
    engine = "seed"
    shard = False
    slabs = None
    sparse = "auto"
    verbose = False
    extras: dict = {"save_index": None, "load_index": None}
    paths: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-mem", "--mem"):
            mode = MatchMode.MEM
        elif a in ("-mum", "--mum"):
            mode = MatchMode.MUM
        elif a in ("-mam", "--mam"):
            mode = MatchMode.MAM
        elif a in ("-l", "--l"):
            i += 1
            if i >= len(argv):
                raise CliError("-l requires a value")
            try:
                min_length = int(argv[i])
            except ValueError:
                raise CliError(f"-l requires an integer, got {argv[i]!r}")
        elif a in ("-o", "--o"):
            i += 1
            if i >= len(argv):
                raise CliError("-o requires a file name")
            out_path = argv[i]
        elif a in ("-b", "--b"):
            both = True
        elif a == "-plot":
            i += 1
            if i >= len(argv):
                raise CliError("-plot requires a file name")
            plot = argv[i]
        elif a == "-save":
            i += 1
            if i >= len(argv):
                raise CliError("-save requires a file name")
            extras["save_index"] = argv[i]
        elif a == "-load":
            i += 1
            if i >= len(argv):
                raise CliError("-load requires a file name")
            extras["load_index"] = argv[i]
        elif a == "-engine":
            i += 1
            if i >= len(argv) or argv[i] not in ("seed", "scan"):
                raise CliError("-engine requires 'seed' or 'scan'")
            engine = argv[i]
        elif a == "-shard":
            shard = True
        elif a == "-slabs":
            i += 1
            if i >= len(argv):
                raise CliError("-slabs requires a value")
            try:
                slabs = int(argv[i])
            except ValueError:
                raise CliError(f"-slabs requires an integer, got {argv[i]!r}")
        elif a == "-sparse":
            i += 1
            if i >= len(argv) or argv[i] not in ("auto", "off"):
                raise CliError("-sparse requires 'auto' or 'off'")
            sparse = argv[i]
        elif a in ("-v", "--verbose"):
            verbose = True
        elif a in ("-h", "--help"):
            raise CliError(USAGE)
        elif a.startswith("-"):
            raise CliError(f"unknown option {a!r}\n{USAGE}")
        else:
            paths.append(a)
        i += 1
    if len(paths) < 1 or (len(paths) < 2 and not extras["save_index"]):
        raise CliError(USAGE)
    try:
        cfg = Config(mode=mode, min_length=min_length, out_path=out_path,
                     both_strands=both, dotplot_path=plot, engine=engine,
                     shard_index=shard, shard_slabs=slabs,
                     sparse_seeds=sparse, verbose=verbose)
    except ValueError as e:
        raise CliError(str(e))
    return cfg, paths[0], paths[1:], extras


def default_out_path(query_paths: list[str], cfg: Config) -> str:
    """Reference behavior: output name derived from the input names."""
    base = os.path.basename(query_paths[0])
    stem = base.rsplit(".", 1)[0] if "." in base else base
    return f"{stem}-{cfg.mode.value}s.txt"


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        cfg, ref_path, query_paths, extras = parse_args(argv)
    except CliError as e:
        print(str(e), file=sys.stderr)
        return 2

    # Imports deferred so `-h` stays fast (jax init can be slow over tunnels).
    import numpy as np

    from slamem_tpu.dist.mesh import (initialize_multihost, is_output_process,
                                      make_mesh)
    from slamem_tpu.engine.run import run_engine
    from slamem_tpu.index.build import build_index
    from slamem_tpu.index.serialize import load_index, save_index
    from slamem_tpu.io.fasta import FastaSet, read_fasta
    from slamem_tpu.report.format import format_matches

    # Join the multi-host runtime (if launched on a pod slice) BEFORE any
    # jax computation — jax.distributed.initialize must precede backend use.
    multihost = initialize_multihost()

    try:
        ref_set = read_fasta(ref_path)
        qsets = [read_fasta(p) for p in query_paths]
    except (OSError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    rtext, _ = ref_set.with_separators()

    index = None
    if extras["load_index"]:
        index = load_index(extras["load_index"])
        if index.n != len(rtext) + 1 or not np.array_equal(
                np.asarray(index.text[:-1]), rtext):
            print("error: loaded index does not match the reference FASTA",
                  file=sys.stderr)
            return 2
    elif extras["save_index"] or query_paths:
        index = build_index(rtext, cfg.occ_block)
    if extras["save_index"]:
        if is_output_process():
            save_index(extras["save_index"], index)
            if cfg.verbose:
                print(f"index saved to {extras['save_index']}",
                      file=sys.stderr)
        if not query_paths:
            return 0

    # multiple query files concatenate their sequences (reference behavior:
    # extra positional args are more query files, SURVEY.md §2)
    if len(qsets) == 1:
        query_set = qsets[0]
    else:
        names = [n for q in qsets for n in q.names]
        lengths = np.concatenate([q.lengths for q in qsets])
        starts = np.concatenate(([0], np.cumsum(lengths)[:-1])).astype(np.int64)
        codes = np.concatenate([q.codes for q in qsets])
        query_set = FastaSet(names=names, starts=starts, lengths=lengths,
                             codes=codes)

    # A pod-slice launch always runs on the global mesh (data-parallel query
    # stream + collective merge); single host only builds one for -shard.
    mesh = None
    if cfg.shard_index or multihost:
        import jax

        ndev = len(jax.devices())
        if (cfg.shard_slabs is not None and cfg.shard_slabs != ndev
                and not multihost):
            # explicit -slabs differing from the device count selects the
            # virtual multi-slab program (slabs iterated on ONE device);
            # on a real pod slabs ride devices and the counts must match
            mesh = make_mesh(1)
        else:
            mesh = make_mesh(ndev)
    try:
        out = run_engine(ref_set, query_set, cfg, index=index, mesh=mesh)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if not is_output_process():
        return 0  # every host computed (SPMD); only process 0 emits
    text = format_matches(out)
    out_path = cfg.out_path or default_out_path(query_paths, cfg)
    if out_path == "-":
        sys.stdout.write(text)
    else:
        with open(out_path, "w") as f:
            f.write(text)
    if cfg.dotplot_path:
        from slamem_tpu.report.dotplot import write_dotplot

        write_dotplot(cfg.dotplot_path, out,
                      ref_len=int(ref_set.lengths.sum()),
                      query_len=int(query_set.lengths.sum()),
                      ref_starts=ref_set.starts)
    if cfg.verbose:
        s = out.stats
        print(f"index build: {s['index_build_s']:.3f}s; "
              f"query: {s['query_bp'] / 1e6:.3f} Mbp in {s['query_s']:.3f}s "
              f"({s['query_mbp_per_s']:.2f} Mbp/s); "
              f"matches: {s['matches']}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""IO layer tests: FASTA parsing, coding, revcomp, separators."""

import numpy as np

from slamem_tpu.io import (
    CODE_SEP, codes_to_str, parse_fasta_bytes, read_fasta,
    revcomp_codes, str_to_codes, write_fasta, Sequence,
)


def test_parse_basic():
    fs = parse_fasta_bytes(b">seq1 a description\nACGT\nNNAC\n>seq2\ngggt\n")
    assert fs.names == ["seq1", "seq2"]
    assert fs.num_seqs == 2
    assert list(fs.lengths) == [8, 4]
    assert codes_to_str(fs.sequence(0).codes) == "ACGTNNAC"
    assert codes_to_str(fs.sequence(1).codes) == "GGGT"


def test_parse_whitespace_and_crlf():
    fs = parse_fasta_bytes(b">a\r\nAC GT\r\n\r\n>b\nTT\tAA\n")
    assert codes_to_str(fs.sequence(0).codes) == "ACGT"
    assert codes_to_str(fs.sequence(1).codes) == "TTAA"


def test_ambiguity_codes_become_n():
    fs = parse_fasta_bytes(b">x\nARYSWKMBDHVNacgt\n")
    assert codes_to_str(fs.sequence(0).codes) == "ANNNNNNNNNNNACGT"


def test_with_separators_and_locate():
    fs = parse_fasta_bytes(b">a\nACG\n>b\nTT\n>c\nGATTA\n")
    text, starts = fs.with_separators()
    assert codes_to_str(text) == "ACG|TT|GATTA"
    assert list(starts) == [0, 4, 7]
    seq_id, local = fs.locate_in_text(np.array([0, 2, 4, 5, 7, 11]), starts)
    assert list(seq_id) == [0, 0, 1, 1, 2, 2]
    assert list(local) == [0, 2, 0, 1, 0, 4]
    assert (text == CODE_SEP).sum() == 2


def test_roundtrip_file(tmp_path):
    p = tmp_path / "t.fa"
    seqs = [Sequence("s1", str_to_codes("ACGTACGTNN")),
            Sequence("s2", str_to_codes("TTTT"))]
    write_fasta(p, seqs)
    fs = read_fasta(p)
    assert fs.names == ["s1", "s2"]
    assert codes_to_str(fs.sequence(0).codes) == "ACGTACGTNN"
    assert codes_to_str(fs.sequence(1).codes) == "TTTT"


def test_revcomp():
    assert codes_to_str(revcomp_codes(str_to_codes("ACGTN"))) == "NACGT"
    assert codes_to_str(revcomp_codes(str_to_codes("AAAC"))) == "GTTT"


def test_read_gzip(tmp_path):
    import gzip

    p = tmp_path / "t.fa.gz"
    p.write_bytes(gzip.compress(b">z\nACGTNN\n"))
    fs = read_fasta(p)
    assert fs.names == ["z"]
    assert codes_to_str(fs.sequence(0).codes) == "ACGTNN"

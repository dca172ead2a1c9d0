"""convertVCFToDindel parity suite.

Expected outputs are hand-derived line-for-line from the reference
python/convertVCFToDindel.py:9-46 + utils/Variant.py:31-104 +
utils/VCFFile.py:47-372 (python2, so no runnable differential target —
each case cites the reference lines whose behavior it pins)."""

import io
import sys

import pytest

from dindel_tpu.io.fasta import write_fasta
from dindel_tpu.pipeline.genotype_likelihoods import convert_vcf_to_dindel

HDR4 = "##fileformat=VCFv4.0\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
HDR33 = ("##fileformat=VCFv3.3\n"
         "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")

REF = "ACGTACGTAACTGGGTACGTTTTTTGGGCCCAATTACGT" * 8


def _fa(tmp_path):
    fap = str(tmp_path / "r.fa")
    write_fasta(fap, {"1": REF, "2": REF})
    return fap


def _vcf(tmp_path, body, name="in.vcf", header=HDR4):
    p = tmp_path / name
    p.write_text(header + body)
    return str(p)


def _run(tmp_path, vcf_paths, fap, **kw):
    out = str(tmp_path / "cand.txt")
    n = convert_vcf_to_dindel(vcf_paths, out, fap, **kw)
    return n, open(out).read().splitlines()


def test_multiallelic_mixed_snp_indel(tmp_path):
    """convertVCFToDindel.py:37-43 — ALT split on ',', '<DEL>' and
    same-length alts skipped, ins/del emitted at pos+offset-1."""
    fap = _fa(tmp_path)
    # 1-based pos 10: REF[9:11] == "AC"
    assert REF[9:11] == "AC"
    vcf = _vcf(tmp_path, "1\t10\t.\tAC\tA,ACT,GC,<DEL>\t50\tPASS\t.\n")
    n, lines = _run(tmp_path, vcf, fap)
    # "A": del of "C" (Variant.py:77-87: left_match=1, right_match=0,
    #   left_end=1, seq="C") -> "-C" at 9+1-1=9
    # "ACT": ins, _ref="AC" _alt="ACT": left_match=2, right_match=0
    #   ("C" != "T"), so left_end promotes to left_match=2
    #   (Variant.py:92-95), right_start=0, seq=_alt[2:]="T"
    #   -> "+T" at 9+2-1=10
    # "GC": len == len(REF) -> skipped (convertVCFToDindel.py:40)
    # "<DEL>": skipped (convertVCFToDindel.py:40)
    assert n == 2
    assert lines == ["1 10 -C", "1 11 +T"]


def test_qual_gate_and_dot(tmp_path):
    """convertVCFToDindel.py:36 — QUAL '.' always passes; numeric QUAL
    must be >= minQual (default 1.0)."""
    fap = _fa(tmp_path)
    assert REF[4:6] == "AC"
    body = ("1\t5\t.\tAC\tA\t0.5\tPASS\t.\n"     # below minQual -> dropped
            "1\t5\t.\tAC\tA\t.\tPASS\t.\n"       # '.' -> kept
            "1\t5\t.\tAC\tA\t1.0\tPASS\t.\n")    # == minQual -> kept
    vcf = _vcf(tmp_path, body)
    n, lines = _run(tmp_path, vcf, fap)
    assert lines == ["1 5 -C", "1 5 -C"]
    n2, lines2 = _run(tmp_path, vcf, fap, min_qual=0.1)
    assert len(lines2) == 3


def test_multi_file_input(tmp_path):
    """convertVCFToDindel.py:17-19 — inputFile is a comma-separated
    list; outputs concatenate in file order."""
    fap = _fa(tmp_path)
    v1 = _vcf(tmp_path, "1\t9\t.\tAC\tA\t50\tPASS\t.\n", name="a.vcf")
    v2 = _vcf(tmp_path, "2\t9\t.\tAC\tACC\t50\tPASS\t.\n", name="b.vcf")
    n, lines = _run(tmp_path, f"{v1},{v2}", fap)
    assert lines == ["1 9 -C", "2 9 +C"]


def test_vcf33_header_tolerated(tmp_path):
    """VCFFile.py:103-110 — 'v3' fileformat accepted in read mode."""
    fap = _fa(tmp_path)
    vcf = _vcf(tmp_path, "1\t9\t.\tAC\tA\t50\t0\t.\n", header=HDR33)
    n, lines = _run(tmp_path, vcf, fap)
    assert lines == ["1 9 -C"]


def test_refseq_mismatch_warns_not_raises(tmp_path, capsys):
    """convertVCFToDindel.py:32-34 — REF/FASTA mismatch writes
    'REFSEQ inconsistency' to stderr but the record is still
    converted."""
    fap = _fa(tmp_path)
    vcf = _vcf(tmp_path, "1\t9\t.\tTC\tT\t50\tPASS\t.\n")  # true ref is AC
    n, lines = _run(tmp_path, vcf, fap)
    assert lines == ["1 9 -C"]
    assert "REFSEQ inconsistency" in capsys.readouterr().err


def test_short_line_ends_file_not_run(tmp_path, capsys):
    """VCFFile.py:290-292 + convertVCFToDindel.py:24-26 — a record line
    with fewer than max-column-index fields makes parseline warn and
    return {}, which the convert loop treats as end-of-file: later
    records in the SAME file are dropped, but the NEXT file still
    processes."""
    fap = _fa(tmp_path)
    body = ("1\t9\t.\tAC\tA\t50\tPASS\t.\n"
            "1\t13\tbadline\n"
            "1\t17\t.\tAC\tA\t50\tPASS\t.\n")
    v1 = _vcf(tmp_path, body, name="a.vcf")
    v2 = _vcf(tmp_path, "2\t9\t.\tAC\tA\t50\tPASS\t.\n", name="b.vcf")
    n, lines = _run(tmp_path, f"{v1},{v2}", fap)
    assert lines == ["1 9 -C", "2 9 -C"]
    assert "Cannot parse this line" in capsys.readouterr().err


def test_unknown_chrom_raises(tmp_path):
    """utils/Fasta.py:35-40 — unknown chromosome crashes the reference
    (NameError); we raise KeyError."""
    fap = _fa(tmp_path)
    vcf = _vcf(tmp_path, "chrUn\t9\t.\tAC\tA\t50\tPASS\t.\n")
    with pytest.raises(KeyError):
        _run(tmp_path, vcf, fap)


def test_header_without_fileformat_but_chrom_ok(tmp_path):
    """VCFFile.py:258-273 — version detection only fires on a
    'fileformat' ## line; a file with other ## lines and a #CHROM line
    parses fine."""
    fap = _fa(tmp_path)
    hdr = ("##source=test\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    vcf = _vcf(tmp_path, "1\t9\t.\tAC\tA\t50\tPASS\t.\n", header=hdr)
    n, lines = _run(tmp_path, vcf, fap)
    assert lines == ["1 9 -C"]


def test_bad_fileformat_raises(tmp_path):
    """VCFFile.py:104-111 — fileformat line that names neither VCF nor
    a v3/v4 version raises."""
    fap = _fa(tmp_path)
    for bad in ("##fileformat=GFF3\n", "##fileformat=VCFv5.0\n"):
        hdr = bad + "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        vcf = _vcf(tmp_path, "1\t9\t.\tAC\tA\t50\tPASS\t.\n", header=hdr)
        with pytest.raises(ValueError):
            _run(tmp_path, vcf, fap)

"""Spec-corner VCF robustness: the native C++ parser, the pure-Python
parser, and an independent per-token oracle must agree on binarized GT
matrices for multi-allelic ALTs (incl. multi-digit allele indices),
missing calls, haploid calls, mixed phasing, CRLF line endings, and long
lines — the corners real chr21 1000G-style files contain
(reference reads them via scikit-allel, src/dataset/dataset.py:296-353,
with vcf_data[vcf_data > 0] = 1 binarization).
"""

import gzip

import numpy as np
import pytest

from rag_snvbert_tpu.io._native import get_vcf_reader, native_read_gt
from rag_snvbert_tpu.io.vcf import read_vcf

def _expected_allele(tok: str) -> int:
    """Independent binarization oracle: 0 iff '0', '.' or empty."""
    return 0 if tok in ("0", ".", "") else 1


def _expected_gt(calls: list[list[str]]) -> np.ndarray:
    """calls[v][s] = GT string; returns [V, S, 2] int8."""
    out = np.zeros((len(calls), len(calls[0]), 2), np.int8)
    for v, row in enumerate(calls):
        for s, g in enumerate(row):
            sep = "|" if "|" in g else "/"
            parts = g.split(sep)
            a0 = _expected_allele(parts[0])
            a1 = a0 if len(parts) < 2 else _expected_allele(parts[1])
            out[v, s] = (a0, a1)
    return out


def _write_vcf(path: str, calls: list[list[str]], alts: list[str],
               fmt: str = "GT", extra: str = "", eol: str = "\n",
               gz: bool = False):
    n_s = len(calls[0])
    text = "##fileformat=VCFv4.2" + eol
    text += ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
             + "\t".join(f"S{i}" for i in range(n_s)) + eol)
    for v, row in enumerate(calls):
        cols = ["21", str(100 + v), ".", "A", alts[v], ".", "PASS", ".", fmt]
        cols += [g + extra for g in row]
        text += "\t".join(cols) + eol
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(text)
    else:
        with open(path, "w", newline="") as f:
            f.write(text)


def _assert_all_agree(path, calls):
    exp = _expected_gt(calls)
    py = read_vcf(path, use_native=False)
    np.testing.assert_array_equal(py.gt, exp, err_msg="python parser")
    if get_vcf_reader() is not None:
        nat = native_read_gt(path)
        assert nat is not None, "native parser failed to parse"
        np.testing.assert_array_equal(nat[0], exp, err_msg="native parser")
        np.testing.assert_array_equal(nat[1], py.pos)


def test_multiallelic_and_multidigit_alleles(tmp_path):
    """ALT allele indices >= 2, including multi-digit (>=10 ALTs): every
    non-REF index binarizes to 1 on BOTH haplotypes."""
    calls = [["0|2", "2|0", "1|2"],
             ["12|0", "0|12", "12|12"],
             ["2/3", "10/0", "0/10"]]
    alts = ["G,T", ",".join("GTCA"[i % 4] * (i // 4 + 1) for i in range(12)),
            "G,T,C,AAAT,GG,TT,CC,AA,GT,CA,TG"]
    p = str(tmp_path / "multi.vcf")
    _write_vcf(p, calls, alts)
    _assert_all_agree(p, calls)


def test_missing_haploid_mixed_phasing(tmp_path):
    calls = [["./.", ".|.", "."],
             ["0", "1", "."],            # haploid: duplicated to both slots
             ["0/1", "1|0", "./1"],
             [".|1", "1/.", "0|."]]
    alts = ["G"] * len(calls)
    p = str(tmp_path / "odd.vcf")
    _write_vcf(p, calls, alts)
    _assert_all_agree(p, calls)


def test_crlf_line_endings(tmp_path):
    """CRLF files must parse identically — the trailing sample column's
    GT carries a \\r in naive parsers ('0\\r' must stay REF)."""
    calls = [["0|1", "0"], ["1|1", "0|0"], ["0/0", "1"]]
    alts = ["G"] * 3
    p = str(tmp_path / "crlf.vcf")
    _write_vcf(p, calls, alts, eol="\r\n")
    _assert_all_agree(p, calls)


def test_crlf_gzip(tmp_path):
    calls = [["0|1", "0|0", "1"], ["1|1", ".", "0/1"]]
    alts = ["G", "G,T"]
    p = str(tmp_path / "crlf.vcf.gz")
    _write_vcf(p, calls, alts, eol="\r\n", gz=True)
    _assert_all_agree(p, calls)


def test_extra_format_subfields(tmp_path):
    """GT is only the first colon-subfield; trailing DP/GQ/PL noise (with
    separators inside) must not leak into the calls."""
    calls = [["0|1", "1|1"], ["0|0", "1|0"]]
    alts = ["G"] * 2
    p = str(tmp_path / "fmt.vcf")
    _write_vcf(p, calls, alts, fmt="GT:DP:PL", extra=":31:0,12/4.0")
    _assert_all_agree(p, calls)


def test_long_lines_many_samples(tmp_path):
    """Lines well past any fixed parser buffer (native reader grows its
    buffer): 3000 samples x long FORMAT payloads ~ 100 KB/line."""
    rng = np.random.default_rng(0)
    n_s, n_v = 3000, 4
    pool = ["0|0", "0|1", "1|0", "1|1", "./.", "0", "1", "2|0", "0|12"]
    calls = [[pool[i] for i in rng.integers(0, len(pool), n_s)]
             for _ in range(n_v)]
    alts = [",".join(["G"] * 12)] * n_v
    p = str(tmp_path / "wide.vcf")
    _write_vcf(p, calls, alts, fmt="GT:DP", extra=":" + "9" * 24)
    _assert_all_agree(p, calls)


def test_random_fuzz_native_python_oracle(tmp_path):
    """Property fuzz: random GT tokens / separators / ploidy / FORMAT
    tails / line endings — native == python == oracle on every file."""
    rng = np.random.default_rng(42)
    alleles = ["0", "1", "2", "3", "10", "12", "."]
    for trial in range(8):
        n_v = int(rng.integers(1, 20))
        n_s = int(rng.integers(1, 30))
        calls = []
        for _ in range(n_v):
            row = []
            for _ in range(n_s):
                a = alleles[rng.integers(0, len(alleles))]
                if rng.random() < 0.15:          # haploid
                    row.append(a)
                else:
                    b = alleles[rng.integers(0, len(alleles))]
                    sep = "|" if rng.random() < 0.7 else "/"
                    row.append(a + sep + b)
            calls.append(row)
        alts = [",".join(["G"] * 12)] * n_v
        eol = "\r\n" if trial % 3 == 0 else "\n"
        gz = trial % 4 == 0
        extra = ":7" if trial % 2 else ""
        fmt = "GT:DP" if extra else "GT"
        p = str(tmp_path / f"fuzz{trial}.vcf{'.gz' if gz else ''}")
        _write_vcf(p, calls, alts, fmt=fmt, extra=extra, eol=eol, gz=gz)
        _assert_all_agree(p, calls)


def test_freq_npy_reference_format_via_cli(tmp_path, capsys):
    """A reference-format Freq.npy ([4, P+1, V] over the panel's site
    order) drops straight into infer via --freq_path *.npy
    (FreqTable.load_reference_npy wired through the CLI)."""
    from rag_snvbert_tpu.io.freq import FreqTable
    from rag_snvbert_tpu.io.synthetic import make_bundle
    from rag_snvbert_tpu.cli.main import _load_freq

    b = make_bundle(n_train_samples=4, n_ref_samples=6, n_sites=40,
                    n_windows=1, seed=1)
    npy = str(tmp_path / "Freq.npy")
    np.save(npy, b.freq.freq)
    loaded = _load_freq(npy, b.ref)
    assert isinstance(loaded, FreqTable)
    np.testing.assert_array_equal(loaded.freq, b.freq.freq)
    np.testing.assert_array_equal(loaded.pos, b.ref.pos)
    # lookups hit the same columns as the native .npz artifact
    from rag_snvbert_tpu.io.freq import AF
    np.testing.assert_array_equal(
        loaded.lookup(AF, loaded.global_idx, b.ref.pos[5:9]),
        b.freq.lookup(AF, b.freq.global_idx, b.ref.pos[5:9]))

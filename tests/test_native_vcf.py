"""Native C++ VCF reader: parity with the pure-Python parser."""

import numpy as np
import pytest

from rag_snvbert_tpu.io._native import get_vcf_reader, native_read_gt
from rag_snvbert_tpu.io.synthetic import make_bundle
from rag_snvbert_tpu.io.vcf import read_vcf, write_simple_vcf

pytestmark = pytest.mark.skipif(get_vcf_reader() is None,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def vcf_path(tmp_path_factory):
    b = make_bundle(n_train_samples=30, n_ref_samples=1, n_sites=200, seed=7)
    p = tmp_path_factory.mktemp("vcf") / "cohort.vcf"
    write_simple_vcf(str(p), b.train)
    return str(p), b.train


def test_native_matches_python(vcf_path):
    p, truth = vcf_path
    nat = read_vcf(p, use_native=True)
    py = read_vcf(p, use_native=False)
    np.testing.assert_array_equal(nat.gt, py.gt)
    np.testing.assert_array_equal(nat.pos, py.pos)
    assert nat.samples == py.samples
    np.testing.assert_array_equal(nat.gt, truth.gt)


def test_native_gzip(vcf_path, tmp_path):
    p, truth = vcf_path
    import gzip, shutil
    gz = str(tmp_path / "cohort.vcf.gz")
    with open(p, "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    nat = native_read_gt(gz)
    assert nat is not None
    np.testing.assert_array_equal(nat[0], truth.gt)


def test_native_missing_and_haploid(tmp_path):
    p = str(tmp_path / "odd.vcf")
    with open(p, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tA\tB\n")
        f.write("21\t100\t.\tA\tG\t.\tPASS\t.\tGT\t.|1\t0\n")       # missing + haploid
        f.write("21\t200\t.\tA\tG\t.\tPASS\t.\tGT:DP\t1/1:3\t0|.\n")  # extra field
    nat = read_vcf(p, use_native=True)
    py = read_vcf(p, use_native=False)
    np.testing.assert_array_equal(nat.gt, py.gt)
    assert nat.gt[0, 0].tolist() == [0, 1]   # . -> 0
    assert nat.gt[0, 1].tolist() == [0, 0]   # haploid duplicated
    assert nat.gt[1, 0].tolist() == [1, 1]


def test_native_nonexistent_file():
    assert native_read_gt("/does/not/exist.vcf") is None

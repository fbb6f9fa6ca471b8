"""minihts (native/minihts.cpp): the from-spec BGZF/tabix/BCF tooling the
eval harness uses for the reference's headline tabix/BCF comparison when
real htslib is absent (VERDICT r1 #1).

Differential strategy: tabix and bcftools queries over the same corpus
must agree with each other and with a pure-Python interval scan of the
text; BGZF output must be readable by stdlib gzip; the BCF encode/render
cycle must be lossless."""

import gzip
import os
import subprocess

import pytest

from test_fuzz import make_vcf

NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
HTSBIN = os.path.join(NATIVE, "htsbin")


@pytest.fixture(scope="module")
def htsbin():
    subprocess.run(["make", "-C", NATIVE, "htsbin"], capture_output=True, check=False)
    bgzip = os.path.join(HTSBIN, "bgzip")
    if not os.path.exists(bgzip):
        pytest.skip("minihts did not build")
    return HTSBIN


@pytest.fixture(scope="module")
def corpus(htsbin, tmp_path_factory):
    d = tmp_path_factory.mktemp("minihts")
    vcf = make_vcf(4242, 40, 400, sv_every=11)
    path = d / "c.vcf"
    path.write_bytes(vcf)
    gz = d / "c.vcf.gz"
    with open(gz, "wb") as f:
        subprocess.run([os.path.join(htsbin, "bgzip"), "-c", str(path)], stdout=f, check=True)
    subprocess.run([os.path.join(htsbin, "tabix"), "-p", "vcf", str(gz)], check=True)
    bcf = d / "c.bcf"
    subprocess.run(
        [os.path.join(htsbin, "bcftools"), "view", "-O", "b", "-o", str(bcf), str(path)],
        check=True,
    )
    subprocess.run([os.path.join(htsbin, "bcftools"), "index", str(bcf)], check=True)
    return d, vcf


def _intervals(vcf: bytes):
    """(chrom, beg0, end0, line) per record with htslib rlen semantics."""
    out = []
    for line in vcf.splitlines():
        if line.startswith(b"#"):
            continue
        cols = line.split(b"\t", 8)
        pos = int(cols[1]) - 1
        rlen = len(cols[3])
        for kv in cols[7].split(b";"):
            if kv.startswith(b"END="):
                rlen = max(rlen, int(kv[4:]) - pos)
        out.append((cols[0].decode(), pos, pos + max(rlen, 1), line))
    return out


def _expect(vcf, ref, beg1, end1):
    return b"".join(
        l + b"\n"
        for (c, b, e, l) in _intervals(vcf)
        if c == ref and b < end1 and e > beg1 - 1
    )


REGIONS = [
    ("1", 1000, 1000),
    ("1", 5000, 5200),
    ("1", 1, 10_000_000),
    ("X", 30000, 40000),
    ("X", 1, 1),
    ("7", 100, 200),  # absent chromosome
]


class TestTabix:
    def test_bgzf_is_gzip_readable(self, corpus):
        d, vcf = corpus
        assert gzip.decompress((d / "c.vcf.gz").read_bytes()) == vcf

    @pytest.mark.parametrize("ref,beg,end", REGIONS)
    def test_query_matches_interval_scan(self, corpus, ref, beg, end):
        d, vcf = corpus
        got = subprocess.run(
            [os.path.join(HTSBIN, "tabix"), str(d / "c.vcf.gz"), f"{ref}:{beg}-{end}"],
            capture_output=True,
            check=True,
        ).stdout
        assert got == _expect(vcf, ref, beg, end)


class TestBcf:
    def test_full_render_lossless(self, corpus):
        d, vcf = corpus
        got = subprocess.run(
            [os.path.join(HTSBIN, "bcftools"), "view", "-H", str(d / "c.bcf")],
            capture_output=True,
            check=True,
        ).stdout
        want = b"".join(
            l + b"\n" for l in vcf.splitlines() if not l.startswith(b"#")
        )
        assert got == want

    @pytest.mark.parametrize("ref,beg,end", REGIONS)
    def test_query_matches_tabix(self, corpus, ref, beg, end):
        d, vcf = corpus
        got = subprocess.run(
            [os.path.join(HTSBIN, "bcftools"), "view", "-H", str(d / "c.bcf"),
             f"{ref}:{beg}-{end}"],
            capture_output=True,
            check=True,
        ).stdout
        assert got == _expect(vcf, ref, beg, end)

    def test_escape_genotypes_roundtrip(self, corpus, tmp_path):
        """Multi-allelic, unphased, and missing genotypes survive the
        binary GT encoding."""
        vcf = (
            b"##fileformat=VCFv4.2\n"
            b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS0\tS1\tS2\n"
            b"1\t10\t.\tA\tG,T,C\t.\tPASS\t.\tGT\t3|2\t./.\t0/3\n"
            b"1\t20\t.\tA\tG\t12.5\tq10;s50\tDP=9;AF=x\tGT\t.\t1|1\t0|0\n"
        )
        # q10/s50 must be declared for the FILTER dictionary
        vcf = vcf.replace(
            b"##fileformat=VCFv4.2\n",
            b"##fileformat=VCFv4.2\n"
            b"##FILTER=<ID=q10,Description=\"\">\n"
            b"##FILTER=<ID=s50,Description=\"\">\n",
        )
        p = tmp_path / "esc.vcf"
        p.write_bytes(vcf)
        bcf = tmp_path / "esc.bcf"
        subprocess.run(
            [os.path.join(HTSBIN, "bcftools"), "view", "-O", "b", "-o", str(bcf), str(p)],
            check=True,
        )
        got = subprocess.run(
            [os.path.join(HTSBIN, "bcftools"), "view", "-H", str(bcf)],
            capture_output=True,
            check=True,
        ).stdout
        want = b"".join(l + b"\n" for l in vcf.splitlines() if not l.startswith(b"#"))
        assert got == want


class TestRandomizedRegions:
    def test_many_random_regions_agree(self, corpus):
        """tabix and bcftools must agree with the interval scan on a
        randomized region sweep (boundary-heavy: empty, point, clamped,
        whole-chromosome, beyond-range)."""
        import random

        d, vcf = corpus
        rng = random.Random(99)
        regions = [("1", 1, 1), ("X", 1, 1 << 28)]
        for _ in range(40):
            ref = rng.choice(["1", "X", "7"])
            beg = rng.randrange(1, 60000)
            end = beg + rng.choice([0, 1, 10, 500, 5000, 100000])
            regions.append((ref, beg, end))
        for ref, beg, end in regions:
            want = _expect(vcf, ref, beg, end)
            got_t = subprocess.run(
                [os.path.join(HTSBIN, "tabix"), str(d / "c.vcf.gz"), f"{ref}:{beg}-{end}"],
                capture_output=True, check=True,
            ).stdout
            assert got_t == want, f"tabix {ref}:{beg}-{end}"
            got_b = subprocess.run(
                [os.path.join(HTSBIN, "bcftools"), "view", "-H", str(d / "c.bcf"),
                 f"{ref}:{beg}-{end}"],
                capture_output=True, check=True,
            ).stdout
            assert got_b == want, f"bcf {ref}:{beg}-{end}"


class TestSchemesIntegration:
    def test_tool_resolves(self):
        from vcfc_tpu.eval.schemes import _tool

        for name in ("bgzip", "tabix", "bcftools"):
            assert _tool(name) is not None

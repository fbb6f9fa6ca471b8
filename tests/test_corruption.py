"""Corrupt-input fuzzing: every reader must fail CLEANLY on corrupted
bytes — a controlled exception (Python) or exit code 1 (native `vcfcq`)
— never a crash signal, a hang, or an unbounded allocation.

The reference establishes this contract with VcfValidationError throws
on malformed state (utils.hpp:117-123; compress.cpp:820-828, 835-840,
958-966 tab/sample/newline guards); the sanitizer gauntlet
(scripts/sanitize.sh) checks crafted corruptions under ASAN/UBSAN.
This file is the seeded randomized sweep that runs in the default
suite: byte flips, span zeroing, truncation, and junk extension over
every container format (.vcfc, .vcfz v1-v6, .vcfci, .vcfcm), driven
through both the Python readers and the native CLI.

Probes run under a SIGALRM deadline (no hangs) and an address-space
rlimit (an allocation bomb from a corrupt length field surfaces as
MemoryError, which is a clean failure — not as 30 GB of RSS).

Set VCFC_FUZZ_N to raise the per-format mutation count (default 24)
for deeper offline sweeps.
"""

import os
import resource
import signal
import subprocess

import numpy as np
import pytest

from test_fuzz import make_vcf

from vcfc_tpu.format import compress_bytes, decompress_bytes
from vcfc_tpu.format.vcfz import decompress_vcfz, query_vcfz, vcfz_from_vcfc
from vcfc_tpu.index.binned import build_binned_index, query_binned_index
from vcfc_tpu.index.manifest import Manifest, build_manifest, query_manifest
from vcfc_tpu.query.coordinate import parse_coordinate_string
from vcfc_tpu.query.engine import query_full_scan
from vcfc_tpu.utils.config import BinnedIndexConfig

N_MUTATIONS = int(os.environ.get("VCFC_FUZZ_N", "24"))
PROBE_SECONDS = 20
# A successful decode of a corrupted artifact is fine (the flip may land
# in passthrough text), but its output must stay in the same size class
# as the pristine decode — a corrupt count field must not fan out.
MAX_OUTPUT = 64 << 20

VCFCQ = os.path.join(os.path.dirname(__file__), "..", "native", "vcfcq")


# ---------------------------------------------------------------------------
# pristine artifacts (module-scoped: built once)


@pytest.fixture(scope="module")
def artifacts():
    vcf = make_vcf(4242, 20, 60, sv_every=9)
    vcfc = compress_bytes(vcf)
    art = {"vcfc": vcfc}
    for v in range(1, 9):
        art[f"vcfz{v}"] = vcfz_from_vcfc(vcfc, version=v)
    art["vcfci"] = build_binned_index(vcfc, BinnedIndexConfig(entries_per_bin=10))
    art["vcfcm"] = build_manifest(vcfc)
    return art


def _mutate(data: bytes, rng: np.random.Generator) -> bytes:
    """One seeded corruption: flip / splice / zero-span / truncate / extend."""
    buf = bytearray(data)
    kind = int(rng.integers(6))
    if kind == 0:  # single-byte flip
        i = int(rng.integers(len(buf)))
        buf[i] ^= int(rng.integers(1, 256))
    elif kind == 1:  # 4-byte random splice (corrupts length/count fields)
        i = int(rng.integers(len(buf)))
        for j in range(i, min(i + 4, len(buf))):
            buf[j] = int(rng.integers(256))
    elif kind == 2:  # zero a 16-byte span
        i = int(rng.integers(len(buf)))
        buf[i : i + 16] = b"\x00" * len(buf[i : i + 16])
    elif kind == 3:  # saturate a byte (max-out a length/count)
        i = int(rng.integers(len(buf)))
        buf[i] = 0xFF
    elif kind == 4:  # truncate
        return bytes(buf[: int(rng.integers(len(buf)))])
    else:  # extend with junk
        return bytes(buf) + rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
    return bytes(buf)


class _ProbeTimeout(Exception):
    pass


def _probe(fn):
    """Run fn under a wall deadline and an address-space ceiling.

    Returns on clean success or clean Exception; fails the test on a
    hang.  The rlimit converts allocation bombs into MemoryError.
    """

    def _on_alarm(signum, frame):
        raise _ProbeTimeout

    vm_now = 0
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmSize:"):
                vm_now = int(line.split()[1]) * 1024
                break
    soft, hard = resource.getrlimit(resource.RLIMIT_AS)
    resource.setrlimit(resource.RLIMIT_AS, (vm_now + (4 << 30), hard))
    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(PROBE_SECONDS)
    try:
        try:
            out = fn()
        except _ProbeTimeout:
            pytest.fail(f"reader hung > {PROBE_SECONDS}s on corrupt input")
        except Exception:
            return None  # clean, controlled failure
        if out is not None:
            total = (
                sum(len(x) for x in out) if isinstance(out, list) else len(out)
            )
            assert total < MAX_OUTPUT, "corrupt input fanned out the output"
        return out
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        resource.setrlimit(resource.RLIMIT_AS, (soft, hard))


# ---------------------------------------------------------------------------
# Python readers


QUERY = parse_coordinate_string("1:1000-9000")


class TestPythonReaders:
    def test_vcfc_decompress(self, artifacts):
        rng = np.random.default_rng(1)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts["vcfc"], rng)
            _probe(lambda: decompress_bytes(bad))

    def test_vcfc_full_scan(self, artifacts):
        rng = np.random.default_rng(2)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts["vcfc"], rng)
            _probe(lambda: list(query_full_scan(bad, QUERY)))

    @pytest.mark.parametrize("version", range(1, 9))
    def test_vcfz_decompress(self, artifacts, version):
        rng = np.random.default_rng(10 + version)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts[f"vcfz{version}"], rng)
            _probe(lambda: decompress_vcfz(bad))

    @pytest.mark.parametrize("version", [4, 5, 6, 7, 8])
    def test_vcfz_device_route(self, artifacts, version):
        """The device decode route (entropy kernels + vertical-match
        resolve) must fail as cleanly as the host path — its own
        validation layer (coverage, escape divergence, MATCH-in-first-
        line, invalid Huffman windows) is what this sweep exercises."""
        rng = np.random.default_rng(20 + version)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts[f"vcfz{version}"], rng)
            _probe(lambda: decompress_vcfz(bad, route="device"))

    def test_vcfz_query(self, artifacts):
        rng = np.random.default_rng(3)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts["vcfz3"], rng)
            _probe(lambda: list(query_vcfz(bad, QUERY)))

    def test_binned_index(self, artifacts):
        rng = np.random.default_rng(4)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts["vcfci"], rng)
            _probe(lambda: list(query_binned_index(artifacts["vcfc"], bad, QUERY)))

    def test_manifest(self, artifacts):
        rng = np.random.default_rng(5)
        for _ in range(N_MUTATIONS):
            bad = _mutate(artifacts["vcfcm"], rng)
            _probe(
                lambda: list(query_manifest(artifacts["vcfc"], Manifest(bad), QUERY))
            )

    def test_vcfc_systematic_truncation(self, artifacts):
        vcfc = artifacts["vcfc"]
        for cut in range(0, len(vcfc), max(1, len(vcfc) // 64)):
            _probe(lambda: decompress_bytes(vcfc[:cut]))

    def test_vcfz_systematic_truncation(self, artifacts):
        z = artifacts["vcfz3"]
        for cut in range(0, len(z), max(1, len(z) // 64)):
            _probe(lambda: decompress_vcfz(z[:cut]))


# ---------------------------------------------------------------------------
# native CLI


@pytest.mark.skipif(not os.path.exists(VCFCQ), reason="native/vcfcq not built")
class TestNativeCli:
    def _run(self, args, tmp_path):
        r = subprocess.run(
            [VCFCQ, *args],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=PROBE_SECONDS,
        )
        # 0 = corruption landed somewhere harmless; 1 = clean die().
        # Negative = killed by signal (segfault/abort) — a real bug.
        assert r.returncode in (0, 1), (
            f"vcfcq {args[0]} crashed on corrupt input "
            f"(returncode {r.returncode})"
        )

    @pytest.mark.parametrize(
        "fmt,verb,extra",
        [
            ("vcfc", "decompress", ["OUT"]),
            ("vcfc", "query", ["1:1000-9000"]),
            ("vcfc", "create-binned-index", ["OUT"]),
            ("vcfc", "gap-analysis", []),
            ("vcfz3", "decompress-z", ["OUT"]),
            ("vcfz4", "decompress-z", ["OUT"]),
            ("vcfz5", "decompress-z", ["OUT"]),
            ("vcfz6", "decompress-z", ["OUT"]),
            ("vcfz3", "query-z", ["1:1000-9000"]),
        ],
    )
    def test_corrupt_artifact(self, artifacts, tmp_path, fmt, verb, extra):
        rng = np.random.default_rng(hash((fmt, verb)) % 2**31)
        bad_path = tmp_path / f"bad.{fmt}"
        for _ in range(N_MUTATIONS):
            bad_path.write_bytes(_mutate(artifacts[fmt], rng))
            args = [verb, str(bad_path)] + [
                str(tmp_path / "out") if a == "OUT" else a for a in extra
            ]
            self._run(args, tmp_path)

    def test_corrupt_index_beside_valid_vcfc(self, artifacts, tmp_path):
        rng = np.random.default_rng(77)
        vcfc_path = tmp_path / "ok.vcfc"
        vcfc_path.write_bytes(artifacts["vcfc"])
        vcfci_path = tmp_path / "ok.vcfc.vcfci"
        for _ in range(N_MUTATIONS):
            vcfci_path.write_bytes(_mutate(artifacts["vcfci"], rng))
            self._run(
                ["query-binned-index", str(vcfc_path), "1:1000-9000"], tmp_path
            )

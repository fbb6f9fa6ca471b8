"""TPU byte-identity sweep of the device `.vcfz` routes (VERDICT r4 #1b).

Runs the VCFZ_PACK=device encode for v1-v8 and the device decode
(order-0 entropy decode, v7/v8 sub-payload split + merge, v4/v6/v7
vertical resolve) ON THE REAL TPU BACKEND and asserts byte equality
against the host writer/reader — the CPU-backend identity already holds
(tests/test_vcfz_device.py, test_huffman_device.py); this is the
hardware leg the r4 verdict flagged as missing (Mosaic-on-TPU can
diverge from the CPU backend: i16 rotate, scoped-VMEM OOMs).

Emits one PASS/FAIL line per leg; exits nonzero on any FAIL.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persist remote-TPU compiles BEFORE jax reads its config from the env
# (vcfc_tpu/__init__.py sets these too, but only helps if it runs first).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/vcfc_tpu/jax")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")

import jax

assert jax.devices()[0].platform == "tpu", jax.devices()

from vcfc_tpu.eval.random_vcf import generate_correlated_vcf, generate_vcf
from vcfc_tpu.format import compress_bytes
from vcfc_tpu.format.vcfz import VcfzReader, vcfz_from_vcfc
from vcfc_tpu.format.vcfz_device import vcfz_from_vcfc_device, vcfz_to_vcfc_device

FAILS = 0


def leg(name, fn):
    global FAILS
    t0 = time.perf_counter()
    try:
        fn()
        print(f"PASS {name} ({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 - report and continue the sweep
        FAILS += 1
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)


def sweep(tag, vcfc):
    for version in (1, 2, 3, 4, 5, 6, 7, 8):
        host = vcfz_from_vcfc(vcfc, version=version)

        def enc(v=version, h=host):
            assert vcfz_from_vcfc(vcfc, version=v, route="device") == h

        leg(f"{tag} v{version} device encode", enc)
        if version in (1, 4, 5, 6, 7, 8):

            def dec(h=host):
                assert vcfz_to_vcfc_device(h) == vcfc

            leg(f"{tag} v{version} device decode", dec)


small = compress_bytes(generate_vcf(70, 150, seed=42))
sweep("small", small)

mid = compress_bytes(generate_correlated_vcf(2504, 2000, mutation_rate=0.03, seed=7))
sweep("mid(2504x2000)", mid)

print(f"{'ALL PASS' if FAILS == 0 else f'{FAILS} FAILURES'}", flush=True)
sys.exit(1 if FAILS else 0)

"""A/B the `.vcfz` device-route compaction on the real TPU (round 5).

Question (VERDICT r4 #2): is the end-to-end device transcode bound by
the dense O(cells) device->host transfers (word/symbol planes, ~9x the
input text over the axon tunnel), and does the on-device sort_compact
route (VCFZ_COMPACT=device — lax.sort_key_val compaction + sparse
escape scatter, O(outputs) transfers) beat it?

Measures wall time of vcfz_from_vcfc_device / vcfz_to_vcfc_device on a
2,504-sample correlated cohort for v5 and v7, host-compact vs
device-compact, best of 2.  Adjudication rule: adopt device compaction
as the TPU default if it wins by >15% end-to-end (mirror of the SWAR
probe rule); record either way in docs/KERNEL_CEILING.md.
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

from vcfc_tpu.eval.random_vcf import generate_correlated_vcf
from vcfc_tpu.format import compress_bytes
from vcfc_tpu.format.vcfz import default_block_lines, vcfz_from_vcfc
from vcfc_tpu.format.vcfz_device import vcfz_from_vcfc_device, vcfz_to_vcfc_device

vcf = generate_correlated_vcf(2504, 4000, mutation_rate=0.03, seed=9)
vcfc = compress_bytes(vcf)
text_gb = len(vcf) / 1e9
print(f"cohort: {len(vcf)/1e6:.0f} MB text, {len(vcfc)/1e6:.0f} MB vcfc", flush=True)


def best2(fn):
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), r


for version in (5, 7):
    host_bytes = vcfz_from_vcfc(vcfc, version=version)
    for mode in ("host", "device"):
        if mode == "device":
            os.environ["VCFZ_COMPACT"] = "device"
        else:
            os.environ.pop("VCFZ_COMPACT", None)
        # the version's own default block height — what the host writer
        # used for host_bytes (v5: 256, v7: 64)
        blk = default_block_lines(version)
        dt_e, enc = best2(lambda: vcfz_from_vcfc_device(vcfc, blk, version))
        assert enc == host_bytes, f"v{version} {mode}-compact encode mismatch"
        dt_d, dec = best2(lambda: vcfz_to_vcfc_device(host_bytes))
        assert dec == vcfc, f"v{version} {mode}-compact decode mismatch"
        print(
            f"v{version} compact={mode}: encode {dt_e:.2f}s ({text_gb/dt_e:.3f} GB/s)"
            f"  decode {dt_d:.2f}s ({text_gb/dt_d:.3f} GB/s)",
            flush=True,
        )
os.environ.pop("VCFZ_COMPACT", None)
print("done", flush=True)

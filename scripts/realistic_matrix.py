"""503 MB realistic-cohort ratio/latency matrix (VERDICT r4 #6).

Generates a 1000G-workload-faithful cohort (eval/random_vcf.py::
generate_realistic_vcf — 1/f MAF spectrum, './.' missing cells,
unphased calls, multi-allelic sites, indels, recomputed AC/AF/AN, full
contig set, LD) at the BASELINE 503 MB scale (2,504 x 50,000), runs the
native codec + the .vcfz v3-v8 matrix over it, and prints one JSON
object per leg — the numbers behind BASELINE.md's "realistic cohort"
section and the test of docs/eval/EXPECTED-1000G.md's measured
expectations (v4 55-75x on LD-correlated data, etc).

Usage: python scripts/realistic_matrix.py [workdir] [--keep]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/realistic"
VCFCQ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "native", "vcfcq")
os.makedirs(WORK, exist_ok=True)


def sh(*args):
    t0 = time.perf_counter()
    subprocess.run(args, check=True, capture_output=True)
    return time.perf_counter() - t0


def best2(*args):
    return min(sh(*args) for _ in range(2))


def emit(**kw):
    print(json.dumps(kw), flush=True)


vcf = os.path.join(WORK, "realistic.vcf")
if not os.path.exists(vcf):
    from vcfc_tpu.eval.random_vcf import generate_realistic_vcf

    t0 = time.perf_counter()
    data = generate_realistic_vcf(
        2504, 50_000, seed=5, unphased_rate=0.002, mutation_rate=0.03,
        unknown_contigs=("GL000207.1",),
    )
    with open(vcf, "wb") as f:
        f.write(data)
    emit(leg="generate", seconds=round(time.perf_counter() - t0, 2),
         bytes=len(data))

vcf_size = os.path.getsize(vcf)
vcfc = os.path.join(WORK, "realistic.vcfc")

dt = best2(VCFCQ, "compress", vcf, vcfc)
emit(leg="compress", seconds=round(dt, 2), bytes=os.path.getsize(vcfc),
     ratio=round(vcf_size / os.path.getsize(vcfc), 2))

rt = os.path.join(WORK, "rt.vcf")
dt = best2(VCFCQ, "decompress", vcfc, rt)
ok = subprocess.run(["cmp", "-s", vcf, rt]).returncode == 0
emit(leg="decompress", seconds=round(dt, 2), lossless=ok)
os.unlink(rt)

for v in (3, 4, 5, 6, 7, 8):
    z = os.path.join(WORK, f"realistic.v{v}.vcfz")
    dt = best2(VCFCQ, "compress-z", vcfc, z, str(v))
    zsize = os.path.getsize(z)
    dtd = best2(VCFCQ, "decompress-z", z, "/dev/null")
    zrt = os.path.join(WORK, "zrt.vcf")
    sh(VCFCQ, "decompress-z", z, zrt)
    ok = subprocess.run(["cmp", "-s", vcf, zrt]).returncode == 0
    os.unlink(zrt)
    emit(leg=f"vcfz-v{v}", transcode_s=round(dt, 2), bytes=zsize,
         ratio=round(vcf_size / zsize, 2), decompress_s=round(dtd, 2),
         lossless=ok)
    if "--keep" not in sys.argv:
        os.unlink(z)

# binned index + a cross-contig query sanity (multi-contig + unknown
# ordinal-0 contigs are the realistic generator's new stress)
ix = vcfc + ".vcfci"
dt = sh(VCFCQ, "create-binned-index", "150", vcfc)
q = subprocess.run(
    [VCFCQ, "query-binned-index", vcfc, "22:16050075-16250000"],
    capture_output=True, check=True,
)
emit(leg="binned-index", create_s=round(dt, 2),
     query_lines=q.stdout.count(b"\n"))
print("done", file=sys.stderr)

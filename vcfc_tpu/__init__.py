"""vcfc_tpu — a TPU-native VCF genotype compression engine.

A from-scratch re-design of the capabilities of theferrit32/vcf-compression
("VCFC") for TPU hardware: VCF data lines are parsed host-side into dense
sample-by-variant genotype code matrices, run-length encoded on device with
vectorized XLA/Pallas scans, and emitted byte-for-byte compatible with the
reference ``.vcfc`` format.  Random access is provided by the reference's
binned index (``.vcfci``), sparse external index, and offset-as-index sparse
files, plus a TPU-friendly block manifest.

Layout (see SURVEY.md §7):
  format/    the byte contract: length headers, RLE flag bytes, line codec
  host/      VCF text parsing <-> dense device arrays (numpy + native C++)
  ops/       device codec kernels (jnp vectorized scans, Pallas TPU kernels)
  parallel/  device meshes, sharded encode, collective merges
  index/     binned / sparse-external / offset-as-index random access
  query/     coordinate model and query engines
  eval/      benchmark harness (reference-compatible TIMING taxonomy)
  utils/     configs, reference-name ordinals, timing probes
"""

__version__ = "0.3.0"

import os as _os

# The codec kernels are expensive to compile (minutes through remote-TPU
# tunnels); persist compiled executables across processes unless the user
# configured their own cache.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/vcfc_tpu/jax")
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all")
del _os

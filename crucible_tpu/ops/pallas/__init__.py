"""Pallas TPU kernels for the per-ray hot path (SURVEY.md §2 [KERNEL] tags).

The pure-jnp ops in ``crucible_tpu.ops`` materialize (R, N) intermediates in
HBM; these kernels keep the whole working set in VMEM and stream scene data
through the compute units, which is where the rays/sec headroom lives.
"""

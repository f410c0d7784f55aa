"""cldrd_tpu — TPU-native dense-retrieval engine with curriculum distillation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the CL-DRD
reference (SIGIR'22 "Curriculum Learning for Dense Retrieval Distillation"):

- ``models``:     Flax DistilBERT-compatible dual encoder (TAS-B weight loading),
                  cross-encoder reranker head.
- ``ops``:        Pallas TPU kernels (fused attention, blocked MIPS top-k) with
                  XLA fallbacks.
- ``parallel``:   device-mesh / sharding helpers (SPMD over ICI).
- ``losses``:     listwise / pairwise / pointwise distillation losses (pure jnp).
- ``data``:       host-side TSV/JSON pipelines, n-way label modes, fixed-shape
                  collators for jit.
- ``index``:      sharded bf16 in-HBM exact inner-product index + persistence.
- ``search``:     exact MIPS top-k search engine, run-file writer.
- ``train``:      config-driven curriculum trainer (pjit DP, optax, orbax ckpt).
- ``evaluation``: MRR / Recall / nDCG / MAP evaluators reproducing the
                  reference's metric semantics bit-for-bit.
"""

__version__ = "0.1.0"
